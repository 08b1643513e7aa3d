package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files
import graft.engine.{Fixtures, Pipeline, TokenRow, Verifier}

class StreamEncodeSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-stream-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("WARN") }

  override def afterAll(): Unit = spark.stop()

  def tmpDir(): String = Files.createTempDirectory("graft-stream").toString

  test("streaming ingest encodes micro-batches; replay is idempotent via lineage") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val rows = (0 until 600).map(i =>
      Fixtures.row(i.toLong, seed = 11, vocab = 50257, medianLen = 64, maxLen = 512))
    val out = tmpDir()

    // two micro-batches through one continuous query
    val src = MemoryStream[TokenRow]
    val q = StreamEncode.start(src.toDS(), out, tmpDir(), tokensPerChunk = 32 * 1024,
      trigger = org.apache.spark.sql.streaming.Trigger.ProcessingTime(50))
    src.addData(rows.take(300))
    q.processAllAvailable()
    src.addData(rows.drop(300))
    q.processAllAvailable()
    q.stop()

    // all rows present and bit-identical
    val source = spark.createDataset(rows)
    val v = Verifier.verify(source, Pipeline.readChunks(spark, out))
    assert(v.ok, s"verify failed: $v")
    assert(v.sourceRows == 600)

    // lineage carries both batch splits
    val lin = Pipeline.readLineage(spark, out).get
    val splits = lin.select("input_split").distinct().collect().map(_.getString(0)).sorted
    assert(splits.sameElements(Array("stream-batch-0", "stream-batch-1")), splits.mkString(","))

    // at-least-once delivery: replaying the SAME micro-batch (same batch
    // id, same rows — what Structured Streaming does after a failure)
    // encodes nothing new
    val before = lin.count()
    val batch1 = spark.createDataset(rows.drop(300))
    val report = Pipeline.run(spark, batch1, out, tokensPerChunk = 32 * 1024, waves = 1,
      inputSplit = "stream-batch-1")
    assert(report.chunksEncoded == 0, s"replay re-encoded ${report.chunksEncoded}")
    assert(Pipeline.readLineage(spark, out).get.count() == before)
    // and the table still round-trips
    assert(Verifier.verify(source, Pipeline.readChunks(spark, out)).ok)
  }
}
