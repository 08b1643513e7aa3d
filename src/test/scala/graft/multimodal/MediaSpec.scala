package graft.multimodal

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

class MediaSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-media-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("WARN") }

  override def afterAll(): Unit = spark.stop()

  private def docs() = {
    import spark.implicits._
    Seq(
      (0L, "hello world", "en", "web", 11L),
      (1L, "ünïcödé bytes here", "de", "books", 18L),
      (2L, "a" * 500, "en", "code", 500L),
      (3L, "", "en", "wiki", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  test("media table is deterministic and payload preserves UTF-8 bytes") {
    val a = Media.fromDocuments(docs()).collect().sortBy(_.doc_id)
    val b = Media.fromDocuments(docs()).collect().sortBy(_.doc_id)
    assert(a.length == 4)
    a.zip(b).foreach { case (x, y) =>
      assert(x.media_type == y.media_type && x.n_frames == y.n_frames)
      assert(java.util.Arrays.equals(x.payload, y.payload))
    }
    assert(new String(a(1).payload, "UTF-8") == "ünïcödé bytes here")
    assert(a(0).media_type == "image" && a(1).media_type == "audio" &&
      a(2).media_type == "video")
  }

  test("feature extraction: histogram sums to byte count, frames partition payload") {
    val feats = Media.extractFeatures(Media.fromDocuments(docs()))
      .collect().sortBy(_.doc_id).toSeq
    feats.foreach { f =>
      assert(f.histogram.sum == f.n_bytes, s"doc ${f.doc_id}")
      if (f.n_bytes > 0) assert(f.mean_byte > 0.0 && f.mean_byte < 256.0)
    }
    // stub decode must not drop bytes whatever n_frames is
    val m = Media.fromDocuments(docs()).collect().map(r => r.doc_id -> r).toMap
    feats.foreach(f => assert(f.n_bytes == m(f.doc_id).payload.length.toLong))
    // empty payload
    assert(feats.find(_.doc_id == 3L).get.n_bytes == 0L)
  }

  test("lsh signatures: deterministic, and identical vectors collide") {
    val v = Array(0.1f, -0.5f, 0.3f, 0.9f)
    assert(graft.similarity.Lsh.signature(v, 8) == graft.similarity.Lsh.signature(v.clone(), 8))
    // opposite vector flips (almost) every plane side
    val neg = v.map(x => -x)
    val s1 = graft.similarity.Lsh.signature(v, 16)
    val s2 = graft.similarity.Lsh.signature(neg, 16)
    assert(graft.similarity.Lsh.hamming(s1, s2) >= 12,
      s"antipodal vectors should differ in most bits: $s1 vs $s2")
    // near-duplicate lands in the same bucket for a small perturbation
    val nearDup = v.clone(); nearDup(0) += 1e-6f
    assert(graft.similarity.Lsh.signature(nearDup, 16) == s1)
  }
}
