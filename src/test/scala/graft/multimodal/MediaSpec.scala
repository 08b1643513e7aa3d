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

  test("frame subset decode matches full-decode selection; stub touches only selected ranges") {
    val payload = Array.tabulate(100)(_.toByte)
    val row = Media.MediaRow(7L, "video", payload, 10, 10, 7)
    val idx = Media.sampleIndices(row.n_frames, 2)
    assert(idx.sameElements(Array(0, 2, 4, 6)))
    val full = Media.MediaDecoder.Stub.decodeFrames(row)
    val sub = Media.MediaDecoder.Stub.decodeFrameSubset(row, idx)
    assert(sub.length == idx.length)
    idx.zip(sub).foreach { case (i, f) =>
      assert(java.util.Arrays.equals(f, full(i)), s"frame $i")
    }
    // the default trait implementation (decode-all-then-select) agrees
    val plain = new Media.MediaDecoder {
      def decodeFrames(r: Media.MediaRow) = Media.MediaDecoder.Stub.decodeFrames(r)
    }
    val viaDefault = plain.decodeFrameSubset(row, idx)
    sub.zip(viaDefault).foreach { case (a, b) => assert(java.util.Arrays.equals(a, b)) }
    // clobber-unselected-bytes: per = 100/7 = 14, so unselected frames
    // 1/3/5 occupy [14,28) [42,56) [70,84). Corrupting ONLY those
    // ranges must not change the subset decode — evidence the stub's
    // seekable path never reads outside the selected frames' slices.
    val clobbered = payload.clone()
    for (i <- Seq(1, 3, 5); p <- i * 14 until (i + 1) * 14) clobbered(p) = 0x5a
    val sub2 = Media.MediaDecoder.Stub.decodeFrameSubset(row.copy(payload = clobbered), idx)
    sub.zip(sub2).foreach { case (a, b) => assert(java.util.Arrays.equals(a, b)) }
    // out-of-range index is an error, not silent garbage
    intercept[IllegalArgumentException] {
      Media.MediaDecoder.Stub.decodeFrameSubset(row, Array(7))
    }
  }

  test("sampleIndices: stride walk from frame 0, degenerate cases") {
    assert(Media.sampleIndices(7, 2).sameElements(Array(0, 2, 4, 6)))
    assert(Media.sampleIndices(5, 1).sameElements(Array(0, 1, 2, 3, 4)))
    assert(Media.sampleIndices(3, 10).sameElements(Array(0)))
    assert(Media.sampleIndices(0, 2).sameElements(Array(0))) // clamped to 1 frame
    intercept[IllegalArgumentException](Media.sampleIndices(4, 0))
  }

  test("resizePlane: 2x box filter averages blocks, partial edges, identity cases") {
    // 4x4 plane, width 4: each 2x2 block has an exact integer mean
    val plane = Array(10, 20, 30, 40, 50, 60, 70, 80,
      90, 100, 110, 120, 130, 140, 150, 160).map(_.toByte)
    val out = Media.resizePlane(plane, 4, 2)
    assert(out.length == 4)
    assert(out.map(_ & 0xff).sameElements(Array(35, 55, 115, 135)))
    // 3x3 plane, k=2: right/bottom blocks are partial and average what exists
    val p3 = Array(1, 2, 3, 4, 5, 6, 7, 8, 9).map(_.toByte)
    val o3 = Media.resizePlane(p3, 3, 2)
    // blocks: {1,2,4,5}=3, {3,6}=4, {7,8}=7, {9}=9
    assert(o3.map(_ & 0xff).sameElements(Array(3, 4, 7, 9)))
    // ragged last row: width 4, 6 bytes -> h=2, second row only 2 bytes
    val rag = Array(8, 8, 4, 4, 8, 8).map(_.toByte)
    val or = Media.resizePlane(rag, 4, 2)
    // blocks: {8,8,8,8}=8 and {4,4}=4 (missing cells skipped, not zero-padded)
    assert(or.map(_ & 0xff).sameElements(Array(8, 4)))
    // identity: k=1 and empty plane pass through
    assert(Media.resizePlane(plane, 4, 1) eq plane)
    assert(Media.resizePlane(Array.emptyByteArray, 4, 2).isEmpty)
    // high bytes keep unsigned semantics (mean of 200 and 250 = 225)
    val hb = Media.resizePlane(Array(200.toByte, 250.toByte), 2, 2)
    assert(hb.map(_ & 0xff).sameElements(Array(225)))
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
