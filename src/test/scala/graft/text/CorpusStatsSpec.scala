package graft.text

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Semantics pins for the corpus-statistics trio q78/q79/q80 on a
  * hand-computable fixture: n-gram diversity counts both within-doc
  * and cross-doc repetition, LM scoring excludes empty docs and
  * tie-breaks on doc_id, and the duplicate-passage filter drops
  * majority-duplicated docs while keeping unshingleable ones.
  */
class CorpusStatsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-corpus-stats-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("WARN") }

  override def afterAll(): Unit = spark.stop()

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-corpusstats").toString
    // docs 0 and 1 are exact duplicates (one shared 8-gram passage),
    // doc 2 is unique, doc 3 is too short to shingle, doc 4 is empty
    val docs = Seq(
      (0L, "a b c d e f g h", "en", "src1", 15L),
      (1L, "a b c d e f g h", "en", "src1", 15L),
      (2L, "x y z w v u t s", "en", "src1", 15L),
      (3L, "p q", "en", "src2", 3L),
      (4L, "", "en", "src2", 0L)
    )
    import spark.implicits._
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  test("q78: positions count every occurrence, distinct collapses them") {
    val rows = SparkEntry.queries("q78_ngram_diversity")(spark, dir).collect()
    // src2 has no doc with >= 5 words -> no gram row at all (matches
    // the oracle, whose gram CTE is empty for that source)
    assert(rows.map(_.getString(0)).toSeq == Seq("src1"))
    val r = rows.head
    // 3 docs x (8 - 4) positions; docs 0/1 share their 4 shingles
    assert(r.getLong(1) == 12L, "n_positions")
    assert(r.getLong(2) == 8L, "n_distinct")
    assert(r.getLong(3) == (12L - 8L) * 1000L / 12L, "dup_permille")
  }

  test("q79: empty docs excluded, equal texts tie-break on doc_id") {
    val rows = SparkEntry.queries("q79_unigram_lm_score")(spark, dir).collect()
    assert(rows.length == 4, "doc 4 (empty) carries no score")
    val scores = rows.map(r => (r.getLong(0), r.getLong(1)))
    // descending by score, ascending doc_id on ties
    assert(scores.map(_._2).toSeq == scores.map(_._2).sorted(Ordering.Long.reverse).toSeq)
    val byId = scores.toMap
    assert(byId(0L) == byId(1L), "identical texts score identically")
    val pos0 = scores.indexWhere(_._1 == 0L)
    val pos1 = scores.indexWhere(_._1 == 1L)
    assert(pos0 < pos1, "tie broken by ascending doc_id")
  }

  test("q80: majority-duplicated docs dropped, short docs kept") {
    val rows = SparkEntry.queries("q80_dup_passage_filter")(spark, dir).collect()
    val bySrc = rows.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // docs 0/1: their single 8-gram appears in 2 docs -> 100% dup -> drop
    assert(bySrc("src1") == ((1L, 2L, 15L)), "src1 keeps only doc 2")
    // docs 3/4 have no 8-grams -> nothing to judge -> kept
    assert(bySrc("src2") == ((2L, 0L, 3L)), "src2 keeps both short docs")
  }
}
