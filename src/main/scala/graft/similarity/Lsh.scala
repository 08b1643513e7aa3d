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
}
