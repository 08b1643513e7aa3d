package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One packed training example: consecutive docs of one source packed
  * into a fixed token budget, tokens concatenated in doc order with
  * per-doc boundaries preserved (the consumer can re-split or build
  * attention masks from `lengths`).
  */
final case class PackedExample(
    source: String,
    bin: Long,
    doc_ids: Array[String],
    lengths: Array[Int],
    tokens: Array[Int],
    n_docs: Int,
    n_tok: Int
)

/** Sequence packing — the training-data step that turns variable-length
  * documents into fixed-budget examples so batch tensors waste no
  * padding. (The reference stops at columnar storage; packing is part
  * of the "operations a large-scale training pipeline needs" surface
  * this engine adds on top.)
  *
  * Packing discipline: deterministic START-OFFSET packing. Docs are
  * ordered by doc_id within each source; a doc belongs to
  * bin = floor(start / binTokens) where start is the cumulative token
  * count of the docs before it. Properties that matter at scale:
  *  - deterministic and data-derived (same input → same bins; no RNG,
  *    no time — the same resume rule the Chunker follows);
  *  - exact integer math, so the PLAN is oracle-checkable in SQL
  *    (window cumsum) — unlike best-fit heuristics whose tie-breaks
  *    are implementation-private;
  *  - docs are never split: a doc that straddles a boundary stays in
  *    the bin it starts in, so bins can overflow by at most one doc
  *    (consumers chunk-truncate or bump the budget; splitting mid-doc
  *    would break the per-row token-array invariant the engine
  *    verifies end-to-end).
  *
  * Scale shape: the plan is one window cumsum PARTITIONED BY source
  * (parallel across sources; within a source Spark's window sorts one
  * partition — for a pathological single-source corpus, pre-salt by
  * doc_id ranges the way Chunker splits hot buckets). Materialization
  * shuffles each doc's payload ONCE to its (source, bin) reducer —
  * repartition on columns + sortWithinPartitions + a streaming
  * group-consecutive kernel, the Encoder's discipline (no groupByKey
  * map-side deserialization of token arrays).
  */
object Packer {

  /** The packing PLAN: (doc_id, source, n_tok, bin) — metadata only,
    * the payload is never read (column pruning keeps `tokens` out of
    * the scan when `ds` comes straight from parquet).
    *
    * PRECONDITION (enforced): (doc_id, source) is unique. Duplicate
    * rows would make the cumsum's tie order — and thus bin assignment —
    * nondeterministic, and [[pack]]'s plan-to-payload join would
    * multiply each duplicate (2×2 = 4 copies). The engine treats
    * duplicates as legal elsewhere (compact dedups them; the Verifier
    * is multiset-exact), so packing a table that still has them is a
    * pipeline-order bug — surfaced here as a task-side error rather
    * than silently corrupted examples. The check rides the SAME
    * window shuffle as the cumsum (rows arrive sorted by doc_id within
    * source, so duplicates are adjacent — one `lag` comparison), not an
    * extra pass or action.
    */
  def plan(ds: Dataset[TokenRow], binTokens: Long): DataFrame = {
    require(binTokens > 0, s"binTokens must be positive, got $binTokens")
    val wo = Window.partitionBy(col("source")).orderBy(col("doc_id"))
    val w = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ds.toDF()
      .select(col("doc_id"), col("source"), col("n_tok"))
      .withColumn("cum", sum(col("n_tok").cast("long")).over(w))
      // integer `div`, not `/`: double division loses exactness past
      // 2^53 cumulative tokens — the 10^15-token scale this targets
      .withColumn("bin", expr(s"(cum - n_tok) div ${binTokens}L"))
      .withColumn("_dup_check", assert_true(
        lag(col("doc_id"), 1).over(wo).isNull ||
          lag(col("doc_id"), 1).over(wo) =!= col("doc_id"),
        lit("Packer: duplicate (doc_id, source) rows in input — " +
          "dedup (e.g. Pipeline.compact) before packing")))
      // filtering on the check column forces its evaluation on every
      // row (a bare drop would let the optimizer prune it unevaluated);
      // assert_true yields NULL on pass, so the filter keeps all rows
      .filter(col("_dup_check").isNull)
      .drop("_dup_check")
  }

  /** Materialize packed examples: concatenated token arrays with doc
    * boundaries, grouped per (source, bin) from the plan.
    */
  def pack(ds: Dataset[TokenRow], binTokens: Long): Dataset[PackedExample] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val planned = plan(ds, binTokens)
      .join(ds.toDF().select(col("doc_id"), col("source"), col("tokens")),
        Seq("doc_id", "source"))
    planned
      .repartition(col("source"), col("bin"))
      .sortWithinPartitions(col("source"), col("bin"), col("doc_id"))
      .select(col("source"), col("bin"), col("doc_id"), col("tokens"))
      .as[(String, Long, String, Array[Int])]
      .mapPartitions { rows =>
        new Iterator[PackedExample] {
          private var head: (String, Long, String, Array[Int]) =
            if (rows.hasNext) rows.next() else null
          def hasNext: Boolean = head != null
          def next(): PackedExample = {
            val (src, bin, _, _) = head
            val ids = scala.collection.mutable.ArrayBuffer.empty[String]
            val lens = scala.collection.mutable.ArrayBuffer.empty[Int]
            val toks = scala.collection.mutable.ArrayBuffer.empty[Int]
            while (head != null && head._1 == src && head._2 == bin) {
              ids += head._3
              lens += head._4.length
              toks ++= head._4
              head = if (rows.hasNext) rows.next() else null
            }
            PackedExample(src, bin, ids.toArray, lens.toArray, toks.toArray,
              ids.length, toks.length)
          }
        }
      }
  }
}
