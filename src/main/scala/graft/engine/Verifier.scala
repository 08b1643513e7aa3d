package graft.engine

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Decode-verify stage: the reference's keystone round-trip test
  * (reference: schema/encoder_test.go:31-97 — every decoded sample must
  * equal its input) re-expressed as a distributed join, plus the
  * north-rule size bar (total encoded bytes <= stock Spark parquet+zstd
  * on the same rows).
  */
object Verifier {

  final case class VerifyReport(
      sourceRows: Long,
      decodedRows: Long,
      mismatchedRows: Long,
      sourceTokens: Long,
      decodedTokens: Long,
      encodedBytes: Long,
      rawBytes: Long
  ) {
    def ok: Boolean =
      sourceRows == decodedRows && mismatchedRows == 0 && sourceTokens == decodedTokens
  }

  /** Per-row invariant: decoded tokens array bit-identical to source.
    *
    * Compared as MULTISETS of (doc_id, tokens): both sides are grouped
    * by the full row content (array<int> is a native groupable Catalyst
    * type — no UDF, no hashing shortcut) and the per-group counts
    * full_outer-joined. This stays exact when doc_ids repeat in the
    * input — a plain join on doc_id alone would cross-multiply
    * duplicates and report spurious mismatches.
    */
  def verify(
      source: Dataset[TokenRow],
      chunks: Dataset[EncodedChunk]
  ): VerifyReport = {
    val spark = source.sparkSession
    import spark.implicits._

    val decoded = Decoder.decode(chunks)

    val src = source.toDF()
      .groupBy(col("doc_id"), col("tokens"))
      .agg(count(lit(1)).as("src_n"))
    val dec = decoded.toDF()
      .groupBy(col("doc_id"), col("tokens"))
      .agg(count(lit(1)).as("dec_n"))

    val joined = src.join(dec, Seq("doc_id", "tokens"), "full_outer")
    val agg = joined.agg(
      sum(coalesce(col("src_n"), lit(0L))).as("src_rows"),
      sum(coalesce(col("dec_n"), lit(0L))).as("dec_rows"),
      // a group missing on either side, or with unequal multiplicity,
      // contributes its full row count to the mismatch tally
      sum(when(
        col("src_n").isNull || col("dec_n").isNull || col("src_n") =!= col("dec_n"),
        greatest(coalesce(col("src_n"), lit(0L)), coalesce(col("dec_n"), lit(0L)))
      ).otherwise(0L)).as("mismatches")
    ).first()

    val srcTok = source.agg(sum(col("n_tok"))).first().getLong(0)
    val chunkAgg = chunks.agg(
      sum(col("n_tokens")), sum(col("encoded_bytes")), sum(col("raw_bytes"))).first()

    VerifyReport(
      sourceRows = agg.getLong(0),
      decodedRows = agg.getLong(1),
      mismatchedRows = if (agg.isNullAt(2)) 0L else agg.getLong(2),
      sourceTokens = srcTok,
      decodedTokens = chunkAgg.getLong(0),
      encodedBytes = chunkAgg.getLong(1),
      rawBytes = chunkAgg.getLong(2)
    )
  }

  /** Recursive local-filesystem delete (scratch dirs only).
    *
    * Does NOT follow symlinks: this backs a JVM-wide shutdown hook on
    * the bench scratch root, so a symlinked directory landing in
    * scratch must be deleted as a link, never recursed into (the old
    * File.listFiles walk would have emptied the link's TARGET).
    * walkFileTree without FOLLOW_LINKS visits a symlink as a file —
    * visitFile unlinks it — and never descends through it.
    */
  def rmTree(path: String): Unit = {
    val root = java.nio.file.Paths.get(path)
    if (!java.nio.file.Files.exists(root, java.nio.file.LinkOption.NOFOLLOW_LINKS)) return
    import java.nio.file.{FileVisitResult, Files, Path, SimpleFileVisitor}
    import java.nio.file.attribute.BasicFileAttributes
    try Files.walkFileTree(root, new SimpleFileVisitor[Path] {
      override def visitFile(f: Path, attrs: BasicFileAttributes): FileVisitResult = {
        try Files.deleteIfExists(f) catch { case _: java.io.IOException => }
        FileVisitResult.CONTINUE
      }
      override def visitFileFailed(f: Path, e: java.io.IOException): FileVisitResult =
        FileVisitResult.CONTINUE
      override def postVisitDirectory(d: Path, e: java.io.IOException): FileVisitResult = {
        try Files.deleteIfExists(d) catch { case _: java.io.IOException => }
        FileVisitResult.CONTINUE
      }
    })
    catch { case _: java.io.IOException => }
  }

  /** Directory byte size (recursive) — for the size-vs-reference bar. */
  def dirBytes(path: String): Long = {
    val root = new java.io.File(path)
    def walk(f: java.io.File): Long =
      if (f.isFile) f.length()
      else Option(f.listFiles()).map(_.map(walk).sum).getOrElse(0L)
    walk(root)
  }

  /** Size bar: write the same rows with stock Spark parquet (zstd — the
    * reference's whole-schema compression default,
    * reference: schema/schema.go:51-55) and compare on-disk bytes.
    * Returns (ourBytes, referenceBytes).
    */
  def sizeVsReferenceParquet(
      source: Dataset[TokenRow],
      ourChunksDir: String,
      scratchDir: String
  ): (Long, Long) = {
    source.write.mode("overwrite")
      .option("compression", "zstd")
      .parquet(scratchDir)
    (dirBytes(ourChunksDir), dirBytes(scratchDir))
  }
}
