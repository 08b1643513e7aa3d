package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, skew-aware, source-clustered chunk assignment.
  *
  * chunk ids are derived from the data (xxhash64 of source/doc_id),
  * never from time or randomness, so re-runs reproduce identical chunks
  * — the property that makes resume-from-lineage sound (the reference
  * gets the same reproducibility from its global sort + rowsPerShard
  * ceiling math, reference: convert/convert.go:765, 777-784).
  *
  * Chunks are **single-source**: buckets are allocated per source in
  * proportion to its token mass. That is the analog of the reference's
  * sorted-by-label layout (convert/convert.go:547-554) re-expressed for
  * a hash world: it is what lets the decode path prune whole chunks by
  * `part_source` (Hive partition pruning / parquet row-group stats)
  * instead of reading everything, makes the source column a constant
  * (free RLE), and keeps per-source token distributions together where
  * dictionaries/FoR frames fit tighter.
  *
  * Skew handling is token-weighted, not row-weighted, at two levels:
  * source-level (a 70%-mass source gets 70% of the buckets) and
  * bucket-level (a base bucket whose `sum(n_tok)` exceeds the budget is
  * split into ceil(sum/budget) sub-buckets by a second hash) — the
  * analog of the reference's greedy shard cuts on row/column overflow
  * (convert/convert.go:799-844). Both pre-passes are column-only scans
  * with map-side partial aggregation; at 100 TB they read two small
  * columns, never the payload.
  */
object Chunker {
  /** Max split factor per base bucket (second-level skew salting). */
  final val MaxSplit = 1 << 16

  /** Default token budget per chunk: ~4M tokens = 16 MB of int32 —
    * small enough to encode comfortably in one task, large enough that
    * codec headers amortize and dictionaries stabilize.
    */
  final val DefaultTokensPerChunk = 4L << 20

  /** Plan result: the input with `chunk_id` attached. Deterministic:
    * chunk_id = xxhash64(planTag, source, base-bucket-in-source, salt),
    * where base = xxhash64(doc_id) mod (buckets of this source) and
    * salt splits overweight buckets.
    *
    * `planTag` scopes chunk identity to one input split: the plan
    * (bucket counts) is a function of the split's token mass, so two
    * DIFFERENT splits (e.g. two streaming micro-batches) would otherwise
    * collide on chunk ids and the resume left_anti would silently drop
    * the later split's data. Same split + same data → same ids
    * (resume/replay idempotence); different split → disjoint ids.
    */
  /** @param meta optional lightweight plan-statistics source: a
    *        DataFrame with (source, doc_id, n_tok) columns ROW-
    *        EQUIVALENT to df's projection onto those columns. The two
    *        pre-passes (per-source token mass, per-bucket split
    *        factors) aggregate `meta` instead of re-evaluating `df` —
    *        decisive when df is an expensive opaque plan (compaction's
    *        decode+dedup) that column pruning cannot reach: the
    *        payload plan then evaluates exactly ONCE (the final
    *        chunk-id attach) instead of three times. Guide §2.3/§8:
    *        decide with small rows, move the heavy rows once. chunk
    *        ids stay a pure function of the input either way (both
    *        pre-passes remain deterministic functions of the same
    *        rows), so resume/replay idempotence is unchanged.
    */
  def assignChunks(
      df: DataFrame,
      tokensPerChunk: Long = DefaultTokensPerChunk,
      planTag: String = "",
      meta: Option[DataFrame] = None
  ): DataFrame = {
    // a chunk's token stream is one Int-indexed array in the encode
    // kernel (and the point-decode paths compute Int slice offsets
    // into it), so the target size must leave headroom for the
    // last-doc overshoot; reject absurd CLI values up front instead
    // of failing deep inside a 100 TB encode
    require(tokensPerChunk >= 1 && tokensPerChunk <= (1L << 30),
      s"tokensPerChunk must be in [1, 2^30], got $tokensPerChunk " +
        "(a chunk's tokens are one Int-indexed array; 2^30 leaves 2x headroom " +
        "for the final doc's overshoot)")
    // plan-statistics source: the (source, doc_id, n_tok) projection —
    // df itself (column-prunable for columnar inputs), or the caller's
    // cheaper row-equivalent metadata plan
    val statsIn = meta.getOrElse(df).select(col("source"), col("doc_id"), col("n_tok"))

    // pre-pass 1: token mass per source -> base bucket count per source.
    // |sources| is tiny relative to rows; broadcast it.
    val perSource = statsIn
      .groupBy(col("source"))
      .agg(sum(col("n_tok")).as("src_tokens"))
      .select(
        col("source"),
        greatest(
          lit(1L),
          ceil(col("src_tokens").cast("double") / tokensPerChunk).cast("long")
        ).as("num_base"))

    val withBase = df
      .join(broadcast(perSource), Seq("source"))
      .withColumn("base_id", pmod(xxhash64(col("doc_id")), col("num_base")))
      .drop("num_base")

    // pre-pass 2: token-weighted per-bucket mass -> split factors for
    // the overweight minority (long-tail n_tok / hot hash buckets).
    // Aggregated from statsIn (same rows, same base_id formula) so an
    // expensive df is not evaluated a third time.
    val splits = statsIn
      .join(broadcast(perSource), Seq("source"))
      .withColumn("base_id", pmod(xxhash64(col("doc_id")), col("num_base")))
      .groupBy(col("source"), col("base_id"))
      .agg(sum(col("n_tok")).as("bucket_tokens"))
      .select(
        col("source"),
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
      .join(broadcast(splits), Seq("source", "base_id"), "left")
      .withColumn("split", coalesce(col("split"), lit(1)))
      .withColumn(
        "chunk_id",
        xxhash64(
          lit(planTag),
          col("source"),
          col("base_id"),
          pmod(xxhash64(col("doc_id"), lit("salt")), col("split").cast("long"))))
      .drop("base_id", "split")
  }

  /** Typed variant producing ChunkedRow. */
  def chunked(
      ds: Dataset[TokenRow],
      tokensPerChunk: Long = DefaultTokensPerChunk,
      planTag: String = "",
      meta: Option[DataFrame] = None
  ): Dataset[ChunkedRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    assignChunks(ds.toDF(), tokensPerChunk, planTag, meta)
      .select("chunk_id", "doc_id", "tokens", "n_tok", "source")
      .as[ChunkedRow]
  }
}
