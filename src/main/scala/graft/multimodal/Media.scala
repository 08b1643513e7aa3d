package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, decoded/feature-extracted by a
  * pluggable per-partition kernel.
  *
  * The Spark-side plumbing is real and tested — schema, deterministic
  * partitioning, batched per-partition kernel calls, feature schema —
  * while the actual media decode is a clearly-marked STUB (this
  * container ships no image/audio libs): [[MediaDecoder.Stub]] is a
  * deterministic fake whose output depends only on the payload bytes,
  * so round-trips and oracles stay reproducible.
  *
  * Design mirrors the engine's chunk kernels (SURVEY.md §4.3): media
  * payloads are whole-cell `Array[Byte]` transforms inside
  * `mapPartitions`; Catalyst expressions or per-row UDFs would add
  * per-row overhead and buy nothing. At 100 TB the payload column
  * dominates I/O, so every query below projects the narrowest column
  * set and the feature extractor runs once per partition batch, not
  * once per row.
  */
object Media {

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(
      doc_id: Long,
      media_type: String, // "image" | "audio" | "video"
      payload: Array[Byte],
      width: Int, // pixels (image/video) or sample-rate/100 (audio)
      height: Int, // pixels, 0 for audio
      n_frames: Int // 1 for image, >1 for video/audio windows
  )

  /** Extracted features: fixed-shape vector + scalar summary stats. */
  final case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Long,
      mean_byte: Double,
      histogram: Array[Long] // 16 bins over byte values
  )

  /** Pluggable decoder. A real deployment would register JNI/codec-lib
    * backed implementations per media_type; the sandbox has none, so
    * [[Stub]] provides the deterministic fake mandated by the brief.
    */
  trait MediaDecoder extends Serializable {
    /** Decode a payload into a "frame" byte plane. STUB CONTRACT: the
      * real implementation would JPEG/PNG/PCM-decode; the stub is an
      * identity view so downstream feature math is still exercised on
      * realistic byte distributions.
      */
    def decodeFrames(row: MediaRow): Array[Array[Byte]]

    /** Decode ONLY the selected frame indices. Default implementation
      * decodes everything then selects — correct for any decoder; a
      * seekable container format (anything with a frame index) should
      * override to touch only the selected frames' bytes, making
      * frame-sampling O(selected), not O(all frames). [[Stub]] does.
      */
    def decodeFrameSubset(row: MediaRow, indices: Array[Int]): Array[Array[Byte]] = {
      val all = decodeFrames(row)
      indices.map(all(_))
    }
  }

  object MediaDecoder {
    /** STUB decode: splits the payload into `n_frames` equal slices —
      * a deterministic fake standing in for a real image/audio decoder
      * (none ships in this container). Everything downstream of this
      * call is real.
      */
    object Stub extends MediaDecoder {
      def decodeFrames(row: MediaRow): Array[Array[Byte]] = {
        val n = math.max(1, row.n_frames)
        val len = row.payload.length
        val per = math.max(1, len / n)
        Array.tabulate(n) { i =>
          val from = math.min(len, i * per)
          val to = if (i == n - 1) len else math.min(len, from + per)
          java.util.Arrays.copyOfRange(row.payload, from, to)
        }
      }

      /** Frame boundaries are metadata-derived, so a subset decode
        * slices ONLY the selected frames' byte ranges — the seekable
        * path a real container's frame index enables (pinned by the
        * clobber-unselected-bytes test in MediaSpec).
        */
      override def decodeFrameSubset(row: MediaRow, indices: Array[Int]): Array[Array[Byte]] = {
        val n = math.max(1, row.n_frames)
        val len = row.payload.length
        val per = math.max(1, len / n)
        indices.map { i =>
          require(i >= 0 && i < n, s"frame $i out of [0, $n)")
          val from = math.min(len, i * per)
          val to = if (i == n - 1) len else math.min(len, from + per)
          java.util.Arrays.copyOfRange(row.payload, from, to)
        }
      }
    }
  }

  /** Frame-sample: every `stride`-th frame index (always includes
    * frame 0). The sampling decision needs only metadata, so it
    * happens BEFORE decode and feeds [[MediaDecoder.decodeFrameSubset]].
    */
  def sampleIndices(nFrames: Int, stride: Int): Array[Int] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val n = math.max(1, nFrames)
    Array.range(0, n, stride)
  }

  /** Resize a decoded byte plane by integer factor `k`: the plane is
    * `width`-byte rows; each output byte is the truncating-integer mean
    * of its k x k input block (partial edge blocks average what exists).
    * Box-filter downsample — the deterministic integer core of a real
    * bilinear/area resize, applied to whatever plane the decoder
    * produced.
    */
  def resizePlane(frame: Array[Byte], width: Int, k: Int): Array[Byte] = {
    require(width >= 1 && k >= 1, s"width $width, k $k")
    if (frame.isEmpty || k == 1) return frame
    val h = (frame.length + width - 1) / width
    val ow = (width + k - 1) / k
    val oh = (h + k - 1) / k
    val out = new Array[Byte](ow * oh)
    var oy = 0
    while (oy < oh) {
      var ox = 0
      while (ox < ow) {
        var sum = 0L
        var cnt = 0
        var y = oy * k
        val yEnd = math.min(h, y + k)
        while (y < yEnd) {
          var x = ox * k
          val xEnd = math.min(width, x + k)
          while (x < xEnd) {
            val p = y * width + x
            if (p < frame.length) { sum += frame(p) & 0xff; cnt += 1 }
            x += 1
          }
          y += 1
        }
        out(oy * ow + ox) = (if (cnt == 0) 0 else (sum / cnt)).toByte
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Synthesize a deterministic media table from the documents table:
    * payload = UTF-8 bytes of `text` (the opaque-binary stand-in),
    * media_type routed by doc_id, metadata derived from sizes. No
    * randomness — any row is reproducible from its source row alone.
    */
  def fromDocuments(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(
        col("doc_id").cast("long"),
        encode(col("text"), "UTF-8").as("payload"),
        col("n_chars").cast("int"))
      .as[(Long, Array[Byte], Int)]
      .map { case (id, payload, nChars) =>
        val mt = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val frames = mt match {
          case "image" => 1
          case "video" => 1 + (nChars % 7)
          case _       => 1 + (nChars % 3)
        }
        // fake-but-typed metadata: a real ingest would parse headers
        val w = 16 + (id % 64).toInt
        val h = if (mt == "audio") 0 else 16 + (id % 48).toInt
        MediaRow(id, mt, payload, w, h, frames)
      }
  }

  /** Batched per-partition feature extraction. The per-frame loop is
    * the hot path a real decoder would occupy; the byte-histogram math
    * after the (stubbed) decode is real and deterministic.
    */
  def extractFeatures(
      ds: Dataset[MediaRow],
      decoder: MediaDecoder = MediaDecoder.Stub
  ): Dataset[MediaFeatures] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      rows.map { r =>
        val frames = decoder.decodeFrames(r)
        val hist = new Array[Long](16)
        var sum = 0L
        var n = 0L
        var f = 0
        while (f < frames.length) {
          val fr = frames(f)
          var i = 0
          while (i < fr.length) {
            val b = fr(i) & 0xff
            hist(b >>> 4) += 1
            sum += b
            n += 1
            i += 1
          }
          f += 1
        }
        MediaFeatures(r.doc_id, r.media_type, n,
          if (n == 0) 0.0 else sum.toDouble / n, hist)
      }
    }
  }
}
