package graft.text

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** The typed-map shingle/minhash kernels (Analyzer.words/wordShingles/
  * minhashBands/simhash16) replaced SQL higher-order-function
  * formulations for a ~30x speedup; their oracle-visible values must be
  * BIT-IDENTICAL to the SQL they replaced (the DuckDB oracles still
  * compute the SQL form). This spec pins that equivalence on a corpus
  * of edge cases: empty text, single word, consecutive/leading/trailing
  * spaces (split must KEEP empty tokens), unicode incl. surrogate
  * pairs, and longer pseudo-random docs.
  */
class KernelEquivSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-kernel-equiv-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("WARN") }

  override def afterAll(): Unit = spark.stop()

  private val corpus: Seq[String] = {
    val rng = new scala.util.Random(7)
    val vocab = Vector("the", "quick", "brown", "fox", "Ünïcòde", "日本語",
      "🚀🌕", "a", "b", "punct,!.", "x9", "")
    val random = (1 to 20).map { _ =>
      (1 to (1 + rng.nextInt(40))).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
    }
    Seq(
      "", "one", "two words", "three word doc",
      "trailing space ", " leading", "double  space inside",
      "exact four word text", "a a a a a", // duplicate shingles
      "🚀 moon 🌕 landing test surrogate pairs here"
    ) ++ random
  }

  private lazy val df = {
    import spark.implicits._
    corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
  }

  test("words() == Spark split(text, ' ') including empty tokens") {
    val sparkSide = df.select(col("doc_id"), split(col("text"), " ").as("w"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      assert(Analyzer.words(t).toSeq == sparkSide(i.toLong), s"doc $i: '$t'")
    }
  }

  test("minhashBands == SQL transform/md5/array_min window formulation") {
    val sql = df
      .withColumn("words", split(col("text"), " "))
      .withColumn("shingles", expr(
        "CASE WHEN size(words) >= 3 THEN transform(sequence(1, size(words)-2), i -> " +
          "concat_ws(' ', element_at(words,i), element_at(words,i+1), element_at(words,i+2))) " +
          "ELSE CAST(array() AS array<string>) END"))
      .withColumn("dg", expr("transform(shingles, x -> md5(x))"))
      .select(col("doc_id"),
        expr("array_min(transform(dg, d -> substring(d, 1, 8)))"),
        expr("array_min(transform(dg, d -> substring(d, 9, 8)))"),
        expr("array_min(transform(dg, d -> substring(d, 17, 8)))"),
        expr("array_min(transform(dg, d -> substring(d, 25, 8)))"))
      .collect()
      .map(r => r.getLong(0) -> (0 to 3).map(b => Option(r.getString(1 + b))))
      .toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      val got = Analyzer.minhashBands(t, k = 3).toSeq.map(Option(_))
      assert(got == sql(i.toLong), s"doc $i: '$t'")
    }
  }

  test("simhash16 == SQL explode/conv/groupBy formulation") {
    val words = df
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .select(col("doc_id"),
        conv(substring(md5(col("w")), 1, 4), 16, 10).cast("int").as("h"))
    val bitSums = (0 until 16).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(lit(1)) === 1, 1).otherwise(-1)).as(s"b$b"))
    val sql = words.groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 16).map(b => when(col(s"b$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      assert(Analyzer.simhash16(t) == sql(i.toLong), s"doc $i: '$t'")
    }
  }

  test("wordShingles == SQL array_distinct transform, as sets") {
    val sql = df
      .withColumn("words", split(col("text"), " "))
      .withColumn("sh", expr(
        "CASE WHEN size(words) >= 3 THEN array_distinct(transform(sequence(1, size(words)-2), i -> " +
          "concat_ws(' ', element_at(words,i), element_at(words,i+1), element_at(words,i+2)))) " +
          "ELSE CAST(array() AS array<string>) END"))
      .select(col("doc_id"), col("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    corpus.zipWithIndex.foreach { case (t, i) =>
      assert(Analyzer.wordShingles(t, k = 3).toSet == sql(i.toLong), s"doc $i: '$t'")
    }
  }

  test("wordShingleHash64: same cardinality and pairwise Jaccard as raw strings") {
    // hashes are internal-only; what downstream counts rely on is that
    // distinct-by-hash == distinct-by-string (no collisions here) and
    // that intersections/unions translate
    val byDoc = corpus.map { t =>
      (Analyzer.wordShingles(t, k = 3).toSet,
        Analyzer.wordShingleHash64(t, k = 3).toSet)
    }
    byDoc.foreach { case (s0, h) => assert(s0.size == h.size) }
    for (a <- byDoc; b <- byDoc) {
      assert((a._1 intersect b._1).size == (a._2 intersect b._2).size)
      assert((a._1 union b._1).size == (a._2 union b._2).size)
    }
  }

  test("wordShingleHash64(5) matches 5-gram string sets (q50 width)") {
    corpus.foreach { t =>
      assert(Analyzer.wordShingles(t, k = 5).length ==
        Analyzer.wordShingleHash64(t, k = 5).length, s"'$t'")
    }
  }
}
