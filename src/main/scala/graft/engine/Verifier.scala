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
    * Equi join on doc_id; array<int> equality is a native Catalyst
    * comparison (no UDF).
    */
  def verify(
      source: Dataset[TokenRow],
      chunks: Dataset[EncodedChunk]
  ): VerifyReport = {
    val spark = source.sparkSession
    import spark.implicits._

    val decoded = Decoder.decode(chunks)

    val src = source.toDF()
      .select(col("doc_id"), col("tokens").as("src_tokens"), col("n_tok"))
    val dec = decoded.toDF()
      .select(col("doc_id"), col("tokens").as("dec_tokens"))

    val joined = src.join(dec, Seq("doc_id"), "full_outer")
    val agg = joined.agg(
      count(col("src_tokens")).as("src_rows"),
      count(col("dec_tokens")).as("dec_rows"),
      sum(when(
        col("src_tokens").isNull || col("dec_tokens").isNull ||
          not(col("src_tokens") === col("dec_tokens")), 1L
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
