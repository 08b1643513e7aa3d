package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** E2E engine suite per FIXTURES.md §§2-3: bit-identical round-trip,
  * kill-one-partition resume, token-weighted skew splitting, and the
  * size-vs-stock-parquet bar.
  */
class EngineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-engine-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("WARN") }

  override def afterAll(): Unit = spark.stop()

  def tmpDir(): String = Files.createTempDirectory("graft-test").toString

  test("chunker: deterministic ids, token-weighted budget respected") {
    import spark.implicits._
    val ds = Fixtures.tokenTable(spark, 2000, seed = 1, medianLen = 128, maxLen = 4096, partitions = 4)
    val a = Chunker.chunked(ds, tokensPerChunk = 64 * 1024).select("doc_id", "chunk_id").as[(String, Long)].collect().toMap
    val b = Chunker.chunked(ds, tokensPerChunk = 64 * 1024).select("doc_id", "chunk_id").as[(String, Long)].collect().toMap
    assert(a == b, "chunk assignment must be deterministic across runs")

    val loads = Chunker.chunked(ds, tokensPerChunk = 64 * 1024)
      .groupBy("chunk_id").sum("n_tok").as[(Long, Long)].collect()
    val budget = 64 * 1024
    // post-split chunks stay within ~2x budget + one max doc (greedy hash
    // split can't do better than doc granularity)
    val tooFat = loads.filter(_._2 > 2L * budget + 4096)
    assert(tooFat.isEmpty, s"overweight chunks: ${tooFat.mkString(",")}")
  }

  test("skew: one hot bucket splits into many chunks") {
    import spark.implicits._
    // all rows share ids that hash anywhere, but budget is tiny so every
    // base bucket is overweight and must split
    val ds = Fixtures.tokenTable(spark, 500, seed = 2, medianLen = 256, maxLen = 1024, partitions = 2)
    val nChunksTight = Chunker.chunked(ds, tokensPerChunk = 8 * 1024).select("chunk_id").distinct().count()
    val nChunksLoose = Chunker.chunked(ds, tokensPerChunk = 1 << 28).select("chunk_id").distinct().count()
    val nSources = ds.toDF().select("source").distinct().count()
    // loose budget: exactly one chunk per source (chunks are single-source)
    assert(nChunksLoose == nSources, s"expected $nSources chunks, got $nChunksLoose")
    assert(nChunksTight > 4L, s"expected salting to split, got $nChunksTight chunks")
  }

  test("chunks are single-source (enables decode-side partition pruning)") {
    import spark.implicits._
    val ds = Fixtures.tokenTable(spark, 2000, seed = 9, medianLen = 128, maxLen = 4096, partitions = 4)
    val mixed = Chunker.chunked(ds, tokensPerChunk = 64 * 1024)
      .groupBy("chunk_id")
      .agg(org.apache.spark.sql.functions.countDistinct("source").as("n_src"))
      .filter(org.apache.spark.sql.functions.col("n_src") > 1)
      .count()
    assert(mixed == 0L, s"$mixed chunks mix sources")
  }

  test("encode -> decode round-trip is bit-identical (keystone)") {
    val ds = Fixtures.tokenTable(spark, 3000, seed = 3, medianLen = 200, maxLen = 8192, partitions = 4)
    val out = tmpDir()
    val report = Pipeline.run(spark, ds, out, tokensPerChunk = 128 * 1024, waves = 3)
    assert(report.chunksSkipped == 0)
    assert(report.rows == 3000)

    val chunks = Pipeline.readChunks(spark, out)
    val v = Verifier.verify(ds, chunks)
    assert(v.ok, s"verify failed: $v")
    assert(v.sourceRows == 3000 && v.decodedRows == 3000 && v.mismatchedRows == 0)
    assert(v.sourceTokens == v.decodedTokens)
  }

  test("resume: kill one wave, re-run encodes only the remainder") {
    val ds = Fixtures.tokenTable(spark, 1500, seed = 4, medianLen = 100, maxLen = 2048, partitions = 4)
    val out = tmpDir()
    // first run: fail every chunk of (hash-)wave 2
    val failed = try {
      Pipeline.run(spark, ds, out, tokensPerChunk = 64 * 1024, waves = 3,
        failOnChunk = id => Pipeline.waveOfId(id, 3) == 2)
      false
    } catch { case _: Exception => true }
    assert(failed, "injected failure must surface")

    // waves 0 and 1 are durable
    val lin1 = Pipeline.readLineage(spark, out).get
    val done1 = lin1.select("chunk_id").distinct().count()
    assert(done1 > 0, "completed waves must have lineage")
    val wave2Done = lin1.select("chunk_id").collect()
      .count(r => Pipeline.waveOfId(r.getLong(0), 3) == 2)
    assert(wave2Done == 0, "failed wave must have no lineage")

    // second run: no failure; must skip completed chunks
    val report2 = Pipeline.run(spark, ds, out, tokensPerChunk = 64 * 1024, waves = 3)
    assert(report2.chunksSkipped == done1, s"expected $done1 skipped, got ${report2.chunksSkipped}")
    val lin2 = Pipeline.readLineage(spark, out).get
    assert(lin2.select("chunk_id").distinct().count() == lin2.count(), "no duplicate lineage rows")
    val wave2Now = lin2.select("chunk_id").collect()
      .count(r => Pipeline.waveOfId(r.getLong(0), 3) == 2)
    assert(wave2Now > 0, "failed wave now completed")

    // and the union still round-trips
    val v = Verifier.verify(ds, Pipeline.readChunks(spark, out))
    assert(v.ok, s"post-resume verify failed: $v")
  }

  test("size bar: encoded output <= stock parquet zstd on same rows") {
    val ds = Fixtures.tokenTable(spark, 4000, seed = 5, medianLen = 300, maxLen = 4096, partitions = 4)
    val out = tmpDir()
    Pipeline.run(spark, ds, out, tokensPerChunk = 512 * 1024, waves = 1)
    val (ours, ref) = Verifier.sizeVsReferenceParquet(ds, Pipeline.chunksPath(out), tmpDir())
    info(s"ours=$ours bytes, stock parquet zstd=$ref bytes, ratio=${ours.toDouble / ref}")
    assert(ours <= ref, s"encoded $ours > reference $ref")
  }

  test("readTokens: source-pruned decode returns exactly that source's rows") {
    import spark.implicits._
    val ds = Fixtures.tokenTable(spark, 800, seed = 12, medianLen = 64, maxLen = 512, partitions = 2)
    val out = tmpDir()
    Pipeline.run(spark, ds, out, tokensPerChunk = 64 * 1024, waves = 1)
    val web = Pipeline.readTokens(spark, out, sources = Seq("web"))
    val expected = ds.filter(_.source == "web")
    assert(web.count() == expected.count())
    val v = Verifier.verify(expected, Encoder.encodeTable(expected, 64 * 1024))
    assert(v.ok)
    // pruning proof: the decode plan only lists the web partition
    val files = web.queryExecution.executedPlan.toString()
    assert(!files.contains("part_source=books") || files.contains("PartitionFilters"),
      "expected partition pruning on part_source")
  }

  test("decoder detects corrupted payload via checksum") {
    val ds = Fixtures.tokenTable(spark, 50, seed = 6, medianLen = 64, maxLen = 256, partitions = 1)
    import spark.implicits._
    val chunks = Encoder.encodeTable(ds, tokensPerChunk = 1 << 24).collect()
    assert(chunks.nonEmpty)
    val c = chunks.head
    val corrupted = c.copy(checksum = c.checksum ^ 0xdeadbeefL)
    intercept[Decoder.ChecksumMismatch] {
      Decoder.decodeChunk(corrupted).foreach(_ => ())
    }
  }

  test("lineage carries codec choices and exact byte accounting") {
    import spark.implicits._
    val ds = Fixtures.tokenTable(spark, 500, seed = 7, medianLen = 128, maxLen = 1024, partitions = 2)
    val out = tmpDir()
    Pipeline.run(spark, ds, out, tokensPerChunk = 256 * 1024, waves = 1)
    val lin = Pipeline.readLineage(spark, out).get
    val rows = lin.collect()
    assert(rows.forall(_.getAs[String]("status") == "completed"))
    assert(rows.forall(_.getAs[Long]("encoded_bytes") > 0))
    // encoded_bytes in lineage equals the actual payload lengths
    val chunks = Pipeline.readChunks(spark, out).collect()
    val byId = chunks.map(c => c.chunk_id -> c).toMap
    rows.foreach { r =>
      val c = byId(r.getAs[Long]("chunk_id"))
      val actual = c.tokens_enc.length.toLong + c.lengths_enc.length +
        c.doc_ids_enc.length + c.sources_enc.length
      assert(r.getAs[Long]("encoded_bytes") == actual)
      assert(r.getAs[Long]("token_count") == c.n_tokens)
    }
  }
}
