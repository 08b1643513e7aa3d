package graft.similarity

/** Random-hyperplane LSH for cosine similarity (SimHash for vectors,
  * Charikar 2002 — public technique). Hyperplane components are derived
  * from a splitmix64-style hash of (bit, dimension), not from an RNG
  * instance, so signatures are reproducible across runs/JVMs with zero
  * broadcast state — the same determinism-for-resume rule the engine's
  * chunker follows.
  *
  * Scale path: at 10^9+ vectors, brute-force cosine top-k is a full
  * cross join; bucketing by an `nBits` signature shrinks each probe's
  * candidate set ~2^nBits-fold, turning the join into an equi join on
  * `sig` that Spark shuffles/broadcasts like any other key.
  */
object Lsh {

  /** splitmix64 finalizer — deterministic pseudo-random hyperplanes. */
  private def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Hyperplane component for (bit b, dim d) in [-1, 1). */
  def plane(b: Int, d: Int): Double =
    mix(b.toLong << 32 | (d.toLong & 0xffffffffL)).toDouble / Long.MaxValue

  /** nBits-bit signature of an embedding: bit b = sign of dot(emb, plane_b). */
  def signature(emb: Array[Float], nBits: Int): Int = {
    var sig = 0
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var d = 0
      while (d < emb.length) { dot += emb(d) * plane(b, d); d += 1 }
      if (dot >= 0) sig |= 1 << b
      b += 1
    }
    sig
  }

  /** Hamming distance between two signatures. */
  def hamming(a: Int, b: Int): Int = java.lang.Integer.bitCount(a ^ b)

  /** Band `band`'s nBits-wide signature, as its own Int. Bit b uses the
    * GLOBAL hyperplane index band*nBits + b, so for widths that fit one
    * packed Int this is bit-identical to slicing
    * `signature(emb, bands*nBits)` — but it does NOT require
    * bands*nBits <= 32: each band carries up to 28 bits regardless of
    * band count. Packing all bands into one Int silently capped
    * per-band width at 28/bands, which stopped width growth at
    * n ~ 16M vectors and let per-bucket self-join cost creep back
    * toward quadratic beyond it.
    */
  def bandSignature(emb: Array[Float], band: Int, nBits: Int): Int = {
    var sig = 0
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var d = 0
      val g = band * nBits + b
      while (d < emb.length) { dot += emb(d) * plane(g, d); d += 1 }
      if (dot >= 0) sig |= 1 << b
      b += 1
    }
    sig
  }

  /** Signature width for a PROBE-bucketed ANN over n vectors:
    * ceil(log2(n / targetBucket)) hyperplanes put ~targetBucket
    * candidates in each probe's bucket. Fixed widths do not survive
    * scale: 8 bits (256 buckets) leaves ~4M candidates per bucket at
    * 10^9 vectors — the width must grow with log2(n). Clamped to
    * [4, 28] (Int signature).
    */
  def bitsFor(n: Long, targetBucket: Int = 2): Int = {
    val buckets = math.max(2.0, n.toDouble / math.max(1, targetBucket))
    math.min(28, math.max(4, math.ceil(math.log(buckets) / math.log(2)).toInt))
  }

  /** Per-band signature width for BANDED near-dup candidate generation
    * (bands OR'd for recall, all bits within a band must match):
    * ceil(log2(n)/bands) + 1. Grows with log2(n) so per-band bucket
    * population (n / 2^bits) — and with it the per-bucket self-join —
    * shrinks relative to n as the corpus grows, keeping candidate
    * generation sub-quadratic. Clamped to [4, 28] per band (each band's
    * signature is its own Int via [[bandSignature]] — widths are NOT
    * limited by bands*bits <= 32).
    */
  def bitsPerBandFor(n: Long, bands: Int): Int = {
    val b = math.ceil(math.log(math.max(2L, n).toDouble) / math.log(2) / bands).toInt + 1
    math.min(28, math.max(4, b))
  }
}
