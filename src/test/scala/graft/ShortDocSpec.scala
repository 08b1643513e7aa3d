package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Regression: shingle queries (q18/q19/q20) on documents with fewer
  * than 3 whitespace words. Unguarded `sequence(1, size(words)-2)` is a
  * DESCENDING sequence for short docs and `element_at(words, 0)` throws
  * under Spark 4's default ANSI mode; the guarded CASE must instead
  * yield an empty shingle set — the semantics of the DuckDB oracle's
  * `range(1, len-1)` (empty when len < 3).
  */
class ShortDocSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-shortdoc-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("WARN") }

  override def afterAll(): Unit = spark.stop()

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-shortdoc").toString
    val docs = Seq(
      // (doc_id, text, lang, source, n_chars) — doc 0 is the q20 probe
      (0L, "one", "en", "src1", 3L), // 1 word
      (1L, "two words", "en", "src1", 9L), // 2 words
      (2L, "three word doc", "en", "src2", 14L), // exactly 3 words
      (3L, "a b c d e f g h", "en", "src2", 15L),
      (4L, "", "en", "src3", 0L) // empty text
    )
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q18 minhash: short docs produce null signatures, no ANSI error") {
    val rows = SparkEntry.queries("q18_minhash")(spark, dir).collect()
    assert(rows.length == 5)
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    // < 3 words (and empty text → [""] one word): empty shingles → null min
    Seq(0L, 1L, 4L).foreach { id =>
      assert(byId(id).isNullAt(1), s"doc $id should have null mh0")
    }
    // >= 3 words: real signatures
    Seq(2L, 3L).foreach { id =>
      assert(!byId(id).isNullAt(1), s"doc $id should have a signature")
    }
  }

  test("q19 lsh buckets: runs without error on short docs") {
    // the three short docs share the (band, NULL-bucket) groups — what
    // matters here is no runtime error and deterministic grouping
    val rows = SparkEntry.queries("q19_lsh_buckets")(spark, dir).collect()
    assert(rows.forall(_.getLong(2) >= 2))
  }

  test("q20 jaccard vs short probe: empty intersection, no error") {
    val rows = SparkEntry.queries("q20_ngram_jaccard")(spark, dir).collect()
    assert(rows.length == 5)
    val byId = rows.map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    // probe (doc 0) has an empty shingle set: inter = 0 for everyone,
    // union = own shingle count
    assert(byId(0L) == ((0L, 0L)))
    assert(byId(1L) == ((0L, 0L)))
    assert(byId(2L) == ((0L, 1L))) // one 3-shingle
    assert(byId(3L)._1 == 0L && byId(3L)._2 == 6L) // 8 words → 6 shingles
  }
}
