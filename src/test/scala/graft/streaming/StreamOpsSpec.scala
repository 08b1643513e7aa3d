package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class StreamOpsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-streamops-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("WARN") }

  override def afterAll(): Unit = spark.stop()

  private def ts(minute: Int) = Timestamp.valueOf(f"2026-01-01 10:$minute%02d:00")

  test("windowed stats: watermark finalizes windows and drops late events") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[StampedToken]
    val q = StreamOps.windowedTokenStats(src.toDS(), "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("win_stats")
      .outputMode(OutputMode.Append()).start()

    // window [10:00,10:10): two src1 docs, one src2 doc
    src.addData(
      StampedToken("d1", "src1", 100, ts(1)),
      StampedToken("d2", "src1", 50, ts(4)),
      StampedToken("d3", "src2", 7, ts(9)))
    q.processAllAvailable()
    // advance the watermark past 10:10 (max event 10:21 - 5 min = 10:16)
    src.addData(StampedToken("d4", "src1", 30, ts(21)))
    q.processAllAvailable()
    // a straggler for the finalized [10:00,10:10) window must be DROPPED
    src.addData(StampedToken("d5", "src1", 999, ts(2)))
    q.processAllAvailable()
    // close the second window too so its row is emitted
    src.addData(StampedToken("d6", "src1", 1, ts(40)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("win_stats")
      .collect()
      .map(r => (r.getAs[Timestamp]("window_start").toString,
        r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens"), r.getAs[Int]("max_doc_tokens")))
      .sortBy(t => (t._1, t._2))
    // the 999-token straggler is absent: src1's first window keeps n=2/150
    assert(rows.contains(("2026-01-01 10:00:00.0", "src1", 2L, 150L, 100)), rows.mkString("; "))
    assert(rows.contains(("2026-01-01 10:00:00.0", "src2", 1L, 7L, 7)), rows.mkString("; "))
    assert(rows.contains(("2026-01-01 10:20:00.0", "src1", 1L, 30L, 30)), rows.mkString("; "))
    assert(!rows.exists(_._4 >= 999L), s"late event leaked: ${rows.mkString("; ")}")
  }

  test("session stats: gap merges events, watermark closes sessions") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[StampedToken]
    // 10-minute gap, 2-minute lateness so the test closes sessions fast
    val q = StreamOps.sessionStats(src.toDS(), "10 minutes", "2 minutes")
      .writeStream.format("memory").queryName("sess_stats")
      .outputMode(OutputMode.Append()).start()

    // src1: events at 10:01 and 10:05 (4-min gap < 10 -> ONE session);
    // src2: event at 10:03 (its own session)
    src.addData(
      StampedToken("d1", "src1", 100, ts(1)),
      StampedToken("d2", "src1", 50, ts(5)),
      StampedToken("d3", "src2", 7, ts(3)))
    q.processAllAvailable()
    // src1 at 10:30: 25 min > 10-min gap -> NEW session; also advances
    // the watermark to 10:28, past every first-wave session end
    // (10:15/10:13), so those emit
    src.addData(StampedToken("d4", "src1", 30, ts(30)))
    q.processAllAvailable()
    // close the 10:30 session too
    src.addData(StampedToken("d5", "src1", 1, ts(55)))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("sess_stats").collect()
      .map(r => (r.getAs[Timestamp]("session_start").toString,
        r.getAs[Timestamp]("session_end").toString,
        r.getAs[String]("source"), r.getAs[Long]("n_docs"),
        r.getAs[Long]("n_tokens")))
      .sortBy(t => (t._1, t._3))
    // session end = last event + gap (session_window semantics)
    assert(rows.contains(("2026-01-01 10:01:00.0", "2026-01-01 10:15:00.0", "src1", 2L, 150L)),
      rows.mkString("; "))
    assert(rows.contains(("2026-01-01 10:03:00.0", "2026-01-01 10:13:00.0", "src2", 1L, 7L)),
      rows.mkString("; "))
    assert(rows.contains(("2026-01-01 10:30:00.0", "2026-01-01 10:40:00.0", "src1", 1L, 30L)),
      rows.mkString("; "))
  }

  test("first-seen dedup suppresses replays across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[StampedToken]
    val q = StreamOps.dedupFirstSeen(src.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()

    src.addData(
      StampedToken("d1", "src1", 10, ts(1)),
      StampedToken("d1", "src1", 10, ts(1)), // same-batch duplicate
      StampedToken("d2", "src1", 20, ts(2)),
      StampedToken("d1", "src2", 30, ts(3))) // same doc_id, OTHER source: distinct key
    q.processAllAvailable()
    // cross-batch replay of d1/src1 and d2/src1 (at-least-once upstream)
    src.addData(
      StampedToken("d1", "src1", 10, ts(5)),
      StampedToken("d2", "src1", 20, ts(6)),
      StampedToken("d9", "src1", 90, ts(7))) // genuinely new
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_out").collect()
      .map(r => (r.getAs[String]("source"), r.getAs[String]("doc_id"), r.getAs[Int]("n_tok")))
      .sorted
    assert(out.sameElements(Array(
      ("src1", "d1", 10), ("src1", "d2", 20), ("src1", "d9", 90), ("src2", "d1", 30))),
      out.mkString("; "))
  }

  test("dedup state expires after the event-time TTL: a late replay passes again") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val src = MemoryStream[StampedToken]
    // 10-minute event-time TTL, zero watermark delay for determinism
    val q = StreamOps.dedupFirstSeen(src.toDS(), "0 seconds", 10L * 60 * 1000)
      .writeStream.format("memory").queryName("dedup_ttl")
      .outputMode(OutputMode.Append()).start()

    src.addData(StampedToken("d1", "src1", 10, ts(1)))
    q.processAllAvailable()                              // watermark -> 10:01
    src.addData(StampedToken("d1", "src1", 11, ts(3)))   // within TTL: suppressed
    q.processAllAvailable()                              // watermark -> 10:03
    src.addData(StampedToken("dx", "src1", 1, ts(30)))   // push watermark past 10:01+TTL
    q.processAllAvailable()                              // watermark -> 10:30
    src.addData(StampedToken("d1", "src1", 12, ts(35)))  // state expired: passes again
    q.processAllAvailable()
    q.stop()

    val out = spark.table("dedup_ttl").collect()
      .map(r => (r.getAs[String]("doc_id"), r.getAs[Int]("n_tok"))).sorted
    assert(out.sameElements(Array(("d1", 10), ("d1", 12), ("dx", 1))), out.mkString("; "))
  }
}
