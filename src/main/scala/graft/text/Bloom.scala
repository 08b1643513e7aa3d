package graft.text

/** Deterministic Bloom filter over shingle strings — the decontamination
  * pre-filter for corpus scale.
  *
  * At 100 TB the exact shingle join of q50 touches every training
  * shingle; the production pattern (this op, q61) broadcasts a Bloom
  * filter of the benchmark set instead, answers "definitely clean" for
  * the overwhelming majority of shingles map-side with zero shuffle,
  * and runs the exact join ONLY on Bloom hits. Bloom filters have no
  * false negatives, so the two-stage result equals the exact join's;
  * false positives only add verify work, and q61 accounts for them
  * explicitly.
  *
  * Engine-portability contract (what makes q61 oracle-exact): the two
  * hash functions are the first two 32-bit big-endian windows of
  * md5(shingle), reduced mod [[Bits]]. md5 is identical in every
  * engine, so bit positions — and therefore every Bloom verdict — are
  * bit-reproducible in Spark, DuckDB (nibble-reduce of the hex), or
  * any other system. No JVM hashCode, no seed state.
  *
  * [[Bits]] is fixed (64 Ki = 1 KiLong) for the test-scale corpora; a
  * production deployment sizes m ≈ -n·ln(p)/ln(2)² for the benchmark
  * shingle count n and target false-positive rate p, and ships the
  * array with an ordinary broadcast variable exactly as q61 does.
  */
object Bloom {

  /** Filter width in bits. Power of two so reduction is a mask-free
    * `% Bits` on a non-negative 32-bit value (identical in SQL).
    */
  final val Bits = 65536

  /** Backing words for [[Bits]]. */
  final val WordCount = Bits / 64

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The shingle's two bit positions: big-endian windows of md5 bytes
    * 0-3 and 4-7 (= hex chars 1-8 and 9-16), mod [[Bits]].
    */
  def positions(shingle: String): (Int, Int) = {
    val d = md5.get()
    d.reset()
    val b = d.digest(shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    def window(o: Int): Int =
      ((((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)) % Bits).toInt
    (window(0), window(4))
  }

  /** Set the shingle's bits in a partial filter (partition-local
    * accumulation; OR-merge partials with [[merge]]).
    */
  def add(words: Array[Long], shingle: String): Unit = {
    val (p1, p2) = positions(shingle)
    words(p1 >> 6) |= 1L << (p1 & 63)
    words(p2 >> 6) |= 1L << (p2 & 63)
  }

  /** Membership probe: true = "possibly in the set" (false positives
    * possible), false = "definitely not" (never a false negative).
    */
  def contains(words: Array[Long], shingle: String): Boolean = {
    val (p1, p2) = positions(shingle)
    ((words(p1 >> 6) >>> (p1 & 63)) & 1L) == 1L &&
      ((words(p2 >> 6) >>> (p2 & 63)) & 1L) == 1L
  }

  /** OR-merge `b` into `a` (in place) and return `a`. */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
}
