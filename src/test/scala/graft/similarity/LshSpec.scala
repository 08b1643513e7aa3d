package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

/** LSH width parameterization: fixed signature widths do not survive
  * scale (8 bits = 256 buckets leaves ~4M candidates/bucket at 10^9
  * vectors). Widths must grow with log2(n) while reproducing the
  * round-1 widths at the 500-vector test scale (result stability).
  */
class LshSpec extends AnyFunSuite {

  test("widths reproduce the test-scale values and grow with log2(n)") {
    // 500 vectors (sf0.01 embeddings): the widths q34/q37 shipped with
    assert(Lsh.bitsFor(500) == 8)
    assert(Lsh.bitsPerBandFor(500, 4) == 4)
    // 10^9 vectors: widths must be materially larger
    assert(Lsh.bitsFor(1000000000L) >= 24)
    assert(Lsh.bitsPerBandFor(1000000000L, 4) >= 7)
    // per-band width must NOT be capped by band count (the old packed-
    // Int clamp froze growth at 28/bands = 7 bits past n ~ 16M)
    assert(Lsh.bitsPerBandFor(1000000000L, 4) == 9)
    assert(Lsh.bitsPerBandFor(1L << 60, 4) == 16)
    // monotone non-decreasing in n
    val ns = Seq(100L, 10000L, 1000000L, 100000000L)
    val probes = ns.map(Lsh.bitsFor(_))
    assert(probes == probes.sorted)
  }

  /** Deterministic pseudo-random unit-ish vectors for the fixture. */
  private def vec(i: Int, dim: Int): Array[Float] = {
    var x = i.toLong * 0x9e3779b97f4a7c15L + 0x85ebca77L
    Array.fill(dim) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      (x.toDouble / Long.MaxValue).toFloat
    }
  }

  test("probe bucketing: max bucket stays sub-linear at 100k vectors") {
    val n = 100000
    val dim = 16
    val bits = Lsh.bitsFor(n.toLong)
    assert(bits == 16, s"expected 16 bits for 100k vectors, got $bits")
    val counts = new Array[Int](1 << bits)
    var i = 0
    while (i < n) {
      counts(Lsh.signature(vec(i, dim), bits)) += 1
      i += 1
    }
    val maxBucket = counts.max
    info(s"n=$n bits=$bits buckets=${1 << bits} maxBucket=$maxBucket")
    // sub-linear: the fullest bucket holds well under 1% of the corpus
    assert(maxBucket <= n / 100,
      s"bucket skew defeats LSH pruning: max bucket $maxBucket of $n")
  }

  test("banded bucketing: per-band max bucket sub-linear at 100k vectors") {
    val n = 100000
    val dim = 16
    val bands = 4
    val bpb = Lsh.bitsPerBandFor(n.toLong, bands)
    assert(bpb >= 5, s"expected >=5 bits/band at 100k, got $bpb")
    val counts = Array.ofDim[Int](bands, 1 << bpb)
    var i = 0
    while (i < n) {
      var b = 0
      while (b < bands) {
        counts(b)(Lsh.bandSignature(vec(i, dim), b, bpb)) += 1
        b += 1
      }
      i += 1
    }
    val maxBucket = counts.map(_.max).max
    info(s"n=$n bands=$bands bits/band=$bpb maxBucket=$maxBucket")
    // the per-bucket self-join is (bucket size)^2; sub-linear bucket
    // population is what keeps candidate generation sub-quadratic
    assert(maxBucket <= n / 8,
      s"band bucket too fat for sub-quadratic self-join: $maxBucket of $n")
  }

  test("bandSignature slices match the packed signature when widths fit an Int") {
    val dim = 16
    val bands = 4
    val bpb = 5 // bands*bpb = 20 <= 32: packed form exists to compare against
    val mask = (1 << bpb) - 1
    (0 until 200).foreach { i =>
      val v = vec(i, dim)
      val full = Lsh.signature(v, bands * bpb)
      (0 until bands).foreach { b =>
        assert(Lsh.bandSignature(v, b, bpb) == ((full >>> (b * bpb)) & mask),
          s"band $b of vector $i diverges from the packed slice")
      }
    }
  }
}
