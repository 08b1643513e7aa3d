package graft.sampling

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic content-hash sampling for training-data mixing and
  * train/val/test splitting.
  *
  * A document's sampling key is the first 8 hex chars of
  * `md5(doc_id)` — uniform over the 16^8 key space, engine-portable
  * (Spark and DuckDB emit identical lowercase-hex md5), and compared
  * LEXICOGRAPHICALLY against a hex threshold so the predicate is plain
  * codegen'd string comparison on both sides (lowercase hex preserves
  * order under ASCII compare). Fraction f keeps keys < thresholdHex(f).
  *
  * Properties that matter for a 100 TB curriculum pipeline:
  *   - deterministic: membership depends only on doc_id, never on
  *     partitioning, row order, or cluster size — re-runs and
  *     backfills select the identical subset;
  *   - monotone: f1 <= f2 implies sample(f1) is a subset of
  *     sample(f2) — raising a source's mix weight only ADDS documents,
  *     so caches/shards built from the smaller mix stay valid;
  *   - split-stable: train/val/test assignment is a disjoint partition
  *     of the same key space, so no document ever migrates between
  *     splits when other sources' weights change;
  *   - map-only: a per-row hash + string compare, no shuffle, no state.
  *
  * No analog exists in the reference (it stores everything it is
  * given); this is part of the training-data operator surface the
  * engine adds on top.
  */
object Mix {

  /** 16^8: size of the 8-hex-digit key space. */
  final val HashSpace: Long = 1L << 32

  /** Hex threshold string such that a uniform 8-hex-digit key is
    * `< threshold` with probability ~f (exact at multiples of 2^-32).
    * f >= 1 returns "g", which ASCII-compares greater than every hex
    * string (accept all); f <= 0 returns "00000000" (reject all).
    */
  def thresholdHex(f: Double): String =
    if (f >= 1.0) "g"
    else if (f <= 0.0) "00000000"
    else {
      // f just under 1.0 can still round to 2^32, which would format as
      // 9 chars and lexicographically reject ~94% of keys
      val r = math.round(f * HashSpace)
      if (r >= HashSpace) "g" else f"$r%08x"
    }

  /** The document's uniform sampling key: first 8 hex chars of
    * md5(id). Accepts any column type (cast to string first — an
    * int64 doc_id hashes as its decimal text on both engines).
    */
  def keyCol(id: Column): Column = substring(md5(id.cast("string")), 1, 8)

  /** Keep-predicate for a per-row threshold column (or a literal). */
  def sampled(id: Column, threshold: Column): Column = keyCol(id) < threshold

  /** Keep-predicate for a fixed fraction. */
  def sampled(id: Column, fraction: Double): Column =
    sampled(id, lit(thresholdHex(fraction)))

  /** Disjoint split assignment over the same key space: boundaries are
    * cumulative fractions, labels has one more entry than boundaries.
    * E.g. boundaries (0.875, 0.9375), labels ("train","val","test").
    */
  def splitCol(id: Column, boundaries: Seq[Double], labels: Seq[String]): Column = {
    require(labels.length == boundaries.length + 1, "labels = boundaries + 1")
    require(boundaries == boundaries.sorted, "boundaries must ascend")
    val k = keyCol(id)
    boundaries.zip(labels.init).foldRight(lit(labels.last): Column) {
      case ((b, label), rest) => when(k < lit(thresholdHex(b)), label).otherwise(rest)
    }
  }
}
