package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, skew-aware chunk assignment.
  *
  * chunk ids are derived from the data (xxhash64 of doc_id), never from
  * time or randomness, so re-runs reproduce identical chunks — the
  * property that makes resume-from-lineage sound (the reference gets the
  * same reproducibility from its global sort + rowsPerShard ceiling
  * math, reference: convert/convert.go:765, 777-784).
  *
  * Skew handling is token-weighted, not row-weighted: a base bucket
  * whose `sum(n_tok)` exceeds the budget is split into
  * ceil(sum/budget) sub-buckets by a second hash. At 100 TB the base
  * hash is near-uniform, but long-tail n_tok distributions (single docs
  * up to 32k+ tokens) and hot sources make the explicit second level
  * the safety net — the analog of the reference's greedy shard cuts on
  * row/column overflow (convert/convert.go:799-844).
  */
object Chunker {
  /** Max split factor per base bucket; chunk_id = base * MaxSplit + salt. */
  final val MaxSplit = 1 << 16

  /** Default token budget per chunk: ~4M tokens = 16 MB of int32 —
    * small enough to encode comfortably in one task, large enough that
    * codec headers amortize and dictionaries stabilize.
    */
  final val DefaultTokensPerChunk = 4L << 20

  /** Plan result: the input with a `chunk_id` column attached. */
  def assignChunks(
      df: DataFrame,
      tokensPerChunk: Long = DefaultTokensPerChunk
  ): DataFrame = {
    val spark = df.sparkSession
    // one cheap column-only scan: total token mass (null on empty input)
    val totalRow = df.agg(sum(col("n_tok"))).first()
    val totalTokens = if (totalRow.isNullAt(0)) 0L else totalRow.getLong(0)
    val numBase = math.max(1L, (totalTokens + tokensPerChunk - 1) / tokensPerChunk)

    val withBase = df.withColumn("base_id", pmod(xxhash64(col("doc_id")), lit(numBase)))

    // token-weighted per-bucket mass -> split factors for the overweight.
    // Map-side partial aggregation keeps this a light pre-pass.
    val splits = withBase
      .groupBy(col("base_id"))
      .agg(sum(col("n_tok")).as("bucket_tokens"))
      .select(
        col("base_id"),
        greatest(
          lit(1),
          least(
            lit(MaxSplit),
            ceil(col("bucket_tokens").cast("double") / tokensPerChunk)
          )
        ).cast("int").as("split")
      )
      .where(col("split") > 1) // broadcast only the skewed minority

    withBase
      .join(broadcast(splits), Seq("base_id"), "left")
      .withColumn("split", coalesce(col("split"), lit(1)))
      .withColumn(
        "chunk_id",
        col("base_id") * MaxSplit +
          pmod(xxhash64(col("doc_id"), lit("salt")), col("split").cast("long"))
      )
      .drop("base_id", "split")
  }

  /** Typed variant producing ChunkedRow. */
  def chunked(
      ds: Dataset[TokenRow],
      tokensPerChunk: Long = DefaultTokensPerChunk
  ): Dataset[ChunkedRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    assignChunks(ds.toDF(), tokensPerChunk)
      .select("chunk_id", "doc_id", "tokens", "n_tok", "source")
      .as[ChunkedRow]
  }
}
