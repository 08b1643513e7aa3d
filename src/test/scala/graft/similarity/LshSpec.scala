package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

/** LSH width parameterization: fixed signature widths do not survive
  * scale (8 bits = 256 buckets leaves ~4M candidates/bucket at 10^9
  * vectors). Probe widths grow as log2(n/targetBucket); per-band
  * near-dup widths as the FULL log2(n/c) so random-pair candidate
  * volume stays linear in n (see Lsh.bitsPerBandFor).
  */
class LshSpec extends AnyFunSuite {

  test("widths reproduce the test-scale values and grow with log2(n)") {
    // 500 vectors (sf0.01 embeddings)
    assert(Lsh.bitsFor(500) == 8)
    // linear-candidate rule: r = ceil(log2(n/c)), c = 8 default —
    // FULL log2(n), independent of band count (the old log2(n)/bands
    // rule left candidate volume ~ n^(2-1/bands): measured 468k
    // candidates from 2000 vectors = 23% of all pairs)
    assert(Lsh.bitsPerBandFor(500, 4) == 6)
    assert(Lsh.bitsPerBandFor(2000, 4) == 8)
    assert(Lsh.bitsPerBandFor(100000, 4) == 14)
    // width must not depend on band count — bands buy recall, not volume
    assert(Lsh.bitsPerBandFor(100000, 8) == Lsh.bitsPerBandFor(100000, 4))
    // 10^9 vectors: widths must be materially larger
    assert(Lsh.bitsFor(1000000000L) >= 24)
    assert(Lsh.bitsPerBandFor(1000000000L, 4) == 27)
    // Int-signature clamp binds at the extreme
    assert(Lsh.bitsPerBandFor(1L << 60, 4) == 28)
    // monotone non-decreasing in n
    val ns = Seq(100L, 10000L, 1000000L, 100000000L)
    val probes = ns.map(Lsh.bitsFor(_))
    assert(probes == probes.sorted)
    val bandWidths = ns.map(Lsh.bitsPerBandFor(_, 4))
    assert(bandWidths == bandWidths.sorted)
  }

  /** Deterministic pseudo-random vectors: each component mixed
    * independently from (i, d) via a splitmix64 finalizer. dim matters
    * here: at dim 16, 14-16 hyperplane bits share only 16 degrees of
    * freedom, the bits correlate, and collision counts inflate ~4x
    * over the independent-bit theory (measured: max bucket 146 vs
    * Poisson ~10). dim 64 matches the real embeddings tables and keeps
    * the residual correlation inside the test's 2x slack.
    */
  private def vec(i: Int, dim: Int): Array[Float] = {
    def mix(x0: Long): Long = {
      var x = x0 + 0x9e3779b97f4a7c15L
      x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
      x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
      x ^ (x >>> 31)
    }
    Array.tabulate(dim) { d =>
      (mix(i.toLong * 1000003L + d).toDouble / Long.MaxValue).toFloat
    }
  }

  test("probe bucketing: max bucket stays sub-linear at 100k vectors") {
    val n = 100000
    val dim = 64
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

  test("banded bucketing: candidate volume stays LINEAR at 100k vectors") {
    // the quantity that actually prices the band self-join is the
    // candidate count sum-over-buckets C(cnt, 2), not the max bucket —
    // a max-bucket bound of n/8 still admits ~n^2/128 pairs. With
    // r = ceil(log2(n/c)) the expectation is ~ c*n/2 per band; assert
    // <= 2*c*n — 2x slack for residual hyperplane-bit correlation at
    // finite dim (measured ~5n vs ~3n independent-bit theory at
    // dim 64). The old log2(n)/bands rule gives r=6 here -> ~780n per
    // band: two orders of magnitude over this bound, so the assertion
    // genuinely separates the rules.
    val n = 100000
    val dim = 64
    val bands = 4
    val c = 8
    val bpb = Lsh.bitsPerBandFor(n.toLong, bands, c)
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
    val candidatesPerBand = counts.map(_.map(k => k.toLong * (k - 1) / 2).sum)
    info(s"n=$n bands=$bands bits/band=$bpb candidates/band=${candidatesPerBand.mkString(",")}")
    candidatesPerBand.foreach { cand =>
      assert(cand <= 2L * c * n,
        s"super-linear candidate volume: $cand pairs from $n vectors in one band")
    }
  }

  test("bandSignature slices match the packed signature when widths fit an Int") {
    val dim = 64
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
