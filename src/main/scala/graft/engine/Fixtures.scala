package graft.engine

import org.apache.spark.sql.{Dataset, SparkSession}

/** Deterministic synthetic token-table generator (FIXTURES.md §1) —
  * the analog of the reference's seeded fixture corpus
  * (reference: util/fixtures.go:15-77). Seeded per row
  * (`Random(seed + rowIdx)`) so any row is reproducible independently,
  * which the resume tests rely on. Generated distributed: a range
  * Dataset mapped per index — no driver-side materialization.
  */
object Fixtures {

  final val Sources = Array("web", "books", "code", "wiki")
  /** skewed 70/20/9/1 per FIXTURES.md */
  private final val SourceCdf = Array(0.70, 0.90, 0.99, 1.0)

  def sourceFor(r: scala.util.Random): String = {
    val x = r.nextDouble()
    var i = 0
    while (x > SourceCdf(i)) i += 1
    Sources(i)
  }

  /** One deterministic row. Token patterns mix Zipf-ish ids with ~10%
    * sorted runs (FIXTURES.md: "Zipf-distributed ids + 10% sorted runs").
    */
  def row(idx: Long, seed: Long, vocab: Int, medianLen: Int, maxLen: Int): TokenRow = {
    val r = new scala.util.Random(seed + idx)
    // log-normal-ish length: median * exp(gauss * 1.0), clamped
    val len = math.max(1, math.min(maxLen,
      (medianLen * math.exp(r.nextGaussian() * 1.0)).toInt))
    val tokens = new Array[Int](len)
    var i = 0
    while (i < len) {
      if (r.nextDouble() < 0.10 && i + 16 <= len) {
        // sorted run of 16 ascending ids
        var v = r.nextInt(vocab - 16)
        var j = 0
        while (j < 16) { tokens(i) = v; v += 1; i += 1; j += 1 }
      } else {
        // Zipf-ish: squared uniform concentrates mass on small ids
        val u = r.nextDouble()
        tokens(i) = math.min(vocab - 1, (u * u * vocab).toInt)
        i += 1
      }
    }
    TokenRow(f"doc_$idx%012d", tokens, len, sourceFor(r))
  }

  def tokenTable(
      spark: SparkSession,
      rows: Long,
      seed: Long = 42L,
      vocab: Int = 50257,
      medianLen: Int = 512,
      maxLen: Int = 32768,
      partitions: Int = 32
  ): Dataset[TokenRow] = {
    import spark.implicits._
    spark.range(0, rows, 1, partitions)
      .map(idx => row(idx, seed, vocab, medianLen, maxLen))
  }
}
