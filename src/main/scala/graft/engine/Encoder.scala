package graft.engine

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import graft.codec.{IntCodec, Selector, StrCodec}

/** Chunk-content checksum: xxhash64 over the little-endian byte image
  * of the token stream (same role as the reference's per-series
  * StableHash, reference: convert/reader.go:136-139). Uses the
  * lz4-java XXHash that ships with Spark — no extra dependency.
  */
object Checksum {
  private val factory = net.jpountz.xxhash.XXHashFactory.fastestJavaInstance()

  def ofTokens(tokens: Array[Int], n: Int): Long = {
    val h = factory.newStreamingHash64(0x9747b28cL)
    val buf = new Array[Byte](8192)
    var i = 0
    var b = 0
    while (i < n) {
      val v = tokens(i)
      buf(b) = v.toByte
      buf(b + 1) = (v >>> 8).toByte
      buf(b + 2) = (v >>> 16).toByte
      buf(b + 3) = (v >>> 24).toByte
      b += 4
      if (b == buf.length) { h.update(buf, 0, b); b = 0 }
      i += 1
    }
    if (b > 0) h.update(buf, 0, b)
    h.getValue
  }
}

/** Encode/decode between the token table and encoded column chunks.
  *
  * The encode kernel is a typed mapGroups over deterministic chunk ids —
  * the whole-codec-on-whole-chunk design (SURVEY.md §4.3): Catalyst
  * expressions would pay per-row overhead for nothing, while one
  * shuffle by chunk_id is the minimal data movement any re-clustering
  * encode can do. This replaces the reference's hand-rolled goroutine
  * pipeline (reference: convert/reader.go:75-100) with Spark tasks.
  */
object Encoder {

  /** Growable int buffer for concatenating a chunk's token stream.
    * Thread-local + reset-reused: steady-state encode must not allocate
    * multi-MB arrays per chunk (G1 humongous-allocation stalls under
    * 32-way concurrency).
    */
  private final class IntBuf(initial: Int) {
    var arr = new Array[Int](math.max(initial, 64))
    var len = 0
    def reset(): Unit = len = 0
    def add(src: Array[Int]): Unit = {
      if (len + src.length > arr.length) {
        var cap = arr.length * 2
        while (cap < len + src.length) cap *= 2
        arr = java.util.Arrays.copyOf(arr, cap)
      }
      System.arraycopy(src, 0, arr, len, src.length)
      len += src.length
    }
  }

  private val tokenBuf = new ThreadLocal[IntBuf] {
    override def initialValue(): IntBuf = new IntBuf(1 << 20)
  }

  /** Encode one chunk's rows (already sorted by doc_id for deterministic
    * output) into an EncodedChunk.
    */
  def encodeChunk(chunkId: Long, rows: Iterator[ChunkedRow],
                  inputSplit: String = ""): EncodedChunk = {
    val docIds = scala.collection.mutable.ArrayBuffer.empty[String]
    val sources = scala.collection.mutable.ArrayBuffer.empty[String]
    val lengths = scala.collection.mutable.ArrayBuffer.empty[Int]
    val toks = tokenBuf.get()
    toks.reset()
    var rawBytes = 0L
    // lexicographic doc_id bounds: rows arrive sorted by doc_id (see
    // encode()), but track running min/max anyway so direct callers
    // with unsorted iterators still get correct pruning stats
    var minDoc: String = null
    var maxDoc: String = null
    while (rows.hasNext) {
      val r = rows.next()
      docIds += r.doc_id
      sources += r.source
      lengths += r.tokens.length
      toks.add(r.tokens)
      rawBytes += 4L * r.tokens.length + r.doc_id.length + r.source.length + 4L
      // Utf8Order, not <: the stored bounds are later compared by Spark
      // column predicates (UTF-8 byte order); Java's UTF-16 compare
      // disagrees for supplementary-plane ids and would store bounds
      // that exclude a contained key (range pruning would drop a hit)
      if (minDoc == null || Utf8Order.lt(r.doc_id, minDoc)) minDoc = r.doc_id
      if (maxDoc == null || Utf8Order.gt(r.doc_id, maxDoc)) maxDoc = r.doc_id
    }
    val n = docIds.length
    // token value bounds for chunk-stat pruning (one cheap pass; the
    // codec trials below dwarf it)
    var minTok = Int.MaxValue
    var maxTok = Int.MinValue
    var ti = 0
    while (ti < toks.len) {
      val v = toks.arr(ti)
      if (v < minTok) minTok = v
      if (v > maxTok) maxTok = v
      ti += 1
    }
    // tokens are the dominant payload: pick the codec by post-zstd size
    val (ct, tokensEnc) = Selector.encodeAutoZstdAware(toks.arr, 0, toks.len)
    val (cl, lengthsEnc) = Selector.encodeAuto(lengths.toArray)
    val (cd, docIdsEnc) = StrCodec.encodeAuto(docIds.toArray)
    val (cs, sourcesEnc) = StrCodec.encodeAuto(sources.toArray)
    val encodedBytes = tokensEnc.length.toLong + lengthsEnc.length +
      docIdsEnc.length + sourcesEnc.length
    EncodedChunk(
      chunk_id = chunkId,
      // chunks are single-source by construction (Chunker allocates
      // buckets per source); first row's source names the partition
      part_source = if (n > 0) sources(0) else "",
      input_split = inputSplit,
      n_rows = n,
      n_tokens = toks.len.toLong,
      min_doc_id = if (minDoc == null) "" else minDoc,
      max_doc_id = if (maxDoc == null) "" else maxDoc,
      doc_bloom = DocBloom.build(docIds),
      token_cardinality = Selector.exactDistinct(toks.arr, 0, toks.len),
      min_token = minTok,
      max_token = maxTok,
      codec_tokens = ct.name,
      codec_lengths = cl.name,
      codec_doc_id = StrCodec.name(cd),
      codec_source = StrCodec.name(cs),
      doc_ids_enc = docIdsEnc,
      sources_enc = sourcesEnc,
      lengths_enc = lengthsEnc,
      tokens_enc = tokensEnc,
      raw_bytes = rawBytes,
      encoded_bytes = encodedBytes,
      checksum = Checksum.ofTokens(toks.arr, toks.len)
    )
  }

  /** Dataset[ChunkedRow] → Dataset[EncodedChunk].
    *
    * Repartition on the chunk_id COLUMN (not groupByKey on a lambda):
    * a typed groupByKey would deserialize every row map-side — copying
    * every tokens array — just to extract a key that already exists as
    * a column. Column-based repartition shuffles Tungsten binary rows
    * untouched; rows are deserialized exactly once, reduce-side, inside
    * the encode kernel. sortWithinPartitions gives the secondary sort
    * by doc_id (chunk payloads byte-deterministic across runs — the
    * property lineage checksums and resume rely on — and sorted
    * doc_ids delta/FSST-compress better).
    */
  def encode(chunks: Dataset[ChunkedRow], inputSplit: String = ""): Dataset[EncodedChunk] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.toDF()
      .repartition(col("chunk_id"))
      .sortWithinPartitions(col("chunk_id"), col("doc_id"))
      .as[ChunkedRow]
      .mapPartitions { rows =>
        // group consecutive rows sharing chunk_id (partition is sorted)
        new Iterator[EncodedChunk] {
          private var head: ChunkedRow = if (rows.hasNext) rows.next() else null
          def hasNext: Boolean = head != null
          def next(): EncodedChunk = {
            val id = head.chunk_id
            val group = new Iterator[ChunkedRow] {
              def hasNext: Boolean = head != null && head.chunk_id == id
              def next(): ChunkedRow = {
                val r = head
                head = if (rows.hasNext) rows.next() else null
                r
              }
            }
            encodeChunk(id, group, inputSplit)
          }
        }
      }
  }

  /** Full path: token table → deterministic chunks → encoded chunks.
    * @param meta optional (source, doc_id, n_tok) plan-statistics
    *        DataFrame for the Chunker pre-passes — see
    *        [[Chunker.assignChunks]]; pass it when `ds` is an opaque
    *        typed plan that column pruning cannot cheapen.
    */
  def encodeTable(
      ds: Dataset[TokenRow],
      tokensPerChunk: Long = Chunker.DefaultTokensPerChunk,
      meta: Option[org.apache.spark.sql.DataFrame] = None
  ): Dataset[EncodedChunk] =
    encode(Chunker.chunked(ds, tokensPerChunk, meta = meta))
}

/** Decode side: EncodedChunk → TokenRow, verifying stored checksums —
  * the round-trip half the reference exercises in its keystone test
  * (reference: schema/encoder_test.go:31-97).
  */
object Decoder {

  final class ChecksumMismatch(chunkId: Long, expected: Long, got: Long)
    extends RuntimeException(
      s"chunk $chunkId checksum mismatch: stored=$expected decoded=$got")

  /** Decode one chunk back into rows; throws on checksum mismatch. */
  def decodeChunk(c: EncodedChunk, verifyChecksum: Boolean = true): Iterator[TokenRow] = {
    val docIds = StrCodec.decode(c.doc_ids_enc)
    val sources = StrCodec.decode(c.sources_enc)
    val lengths = IntCodec.decode(c.lengths_enc)
    val tokens = IntCodec.decode(c.tokens_enc)
    if (verifyChecksum) {
      val got = Checksum.ofTokens(tokens, tokens.length)
      if (got != c.checksum) throw new ChecksumMismatch(c.chunk_id, c.checksum, got)
    }
    new Iterator[TokenRow] {
      private var i = 0
      private var off = 0
      def hasNext: Boolean = i < docIds.length
      def next(): TokenRow = {
        val l = lengths(i)
        val t = java.util.Arrays.copyOfRange(tokens, off, off + l)
        val row = TokenRow(docIds(i), t, l, sources(i))
        off += l
        i += 1
        row
      }
    }
  }

  def decode(chunks: Dataset[EncodedChunk], verifyChecksum: Boolean = true): Dataset[TokenRow] = {
    val spark = chunks.sparkSession
    import spark.implicits._
    chunks.flatMap(c => decodeChunk(c, verifyChecksum))
  }

  /** Point decode: one doc's row out of a chunk, materializing O(doc)
    * tokens instead of O(chunk) — the reference's page-grain row-range
    * materialization (reference: search/constraint.go:520-595 binary
    * search on the sorted column; search/iterators.go:359-494
    * RowRangesValueIterator decodes only the selected ranges) brought
    * within the chunk: the doc index (ids + lengths, tiny) locates the
    * doc and its token offset by prefix sum; [[graft.codec.IntCodec
    * .decodeRange]] then decodes only that slice for offset-addressable
    * codecs (plain/bitpack/for/for8/forsplit/dict; fordelta falls back
    * to a full decode).
    *
    * Skips checksum verification by design — the checksum covers the
    * whole token stream, and hashing it would cost the O(chunk) decode
    * this path exists to avoid.
    */
  def decodeDocTokens(c: EncodedChunk, docId: String): Option[TokenRow] = {
    val docIds = StrCodec.decode(c.doc_ids_enc)
    var idx = -1
    var i = 0
    while (idx < 0 && i < docIds.length) {
      if (docIds(i) == docId) idx = i
      i += 1
    }
    if (idx < 0) None
    else {
      val lengths = IntCodec.decode(c.lengths_enc)
      var off = 0
      i = 0
      while (i < idx) { off += lengths(i); i += 1 }
      val toks = IntCodec.decodeRange(c.tokens_enc, off, lengths(idx))
      val source = StrCodec.decode(c.sources_enc)(idx)
      Some(TokenRow(docId, toks, lengths(idx), source))
    }
  }

  /** Batch point decode: every requested doc of one chunk in a single
    * doc-index pass — k lookups pay ONE doc_ids/lengths decode instead
    * of k ([[decodeDocTokens]] repeated), and each hit still
    * materializes only its own token slice. The natural consumer is
    * [[Pipeline.readTokensForDocIds]], where a candidate chunk often
    * holds several of the requested keys.
    */
  def decodeDocsTokens(c: EncodedChunk, keys: Set[String]): Iterator[TokenRow] = {
    if (keys.isEmpty) Iterator.empty
    else decodeDocsTokensWhere(c, keys.contains)
  }

  /** Predicate decode: every doc of one chunk whose id satisfies
    * `pred`, in a single doc-index pass with per-hit token slicing —
    * the range/prefix generalization of [[decodeDocsTokens]] (the
    * reference derives [minv,maxv] page bounds for prefix regexes,
    * reference: search/constraint.go:894-909; the chunk-grain analog
    * needs an arbitrary id predicate at decode time). Only the hits'
    * token slices are materialized; misses cost one string compare.
    */
  def decodeDocsTokensWhere(
      c: EncodedChunk,
      pred: String => Boolean
  ): Iterator[TokenRow] = {
    val docIds = StrCodec.decode(c.doc_ids_enc)
    val hits = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < docIds.length) {
      if (pred(docIds(i))) hits += i
      i += 1
    }
    if (hits.isEmpty) return Iterator.empty
    val lengths = IntCodec.decode(c.lengths_enc)
    val sources = StrCodec.decode(c.sources_enc)
    val offsets = new Array[Long](lengths.length)
    var off = 0L
    i = 0
    while (i < lengths.length) { offsets(i) = off; off += lengths(i); i += 1 }
    // any encodable chunk's token stream is one Int-indexed array
    // (encodeChunk builds it), so every in-chunk offset fits an Int;
    // guard the narrowing anyway — corrupt lengths metadata must fail
    // loudly, not slice at a wrapped offset
    require(off <= Int.MaxValue,
      s"chunk ${c.chunk_id} claims $off tokens — exceeds the Int-indexed chunk bound")
    hits.iterator.map { idx =>
      val toks = IntCodec.decodeRange(c.tokens_enc, offsets(idx).toInt, lengths(idx))
      TokenRow(docIds(idx), toks, lengths(idx), sources(idx))
    }
  }

  /** Column-masked decode: ids/lengths/sources only — the token payload
    * (the dominant decode cost AND the dominant byte volume) is never
    * touched. Pair with a parquet scan that doesn't select tokens_enc
    * ([[Pipeline.readDocIndex]]) and a metadata consumer pays neither
    * token I/O nor token decode — the projection split the reference
    * achieves with separate labels/chunks files
    * (reference: convert/writer.go:222-243).
    */
  def decodeDocIndex(
      chunkId: Long,
      docIdsEnc: Array[Byte],
      lengthsEnc: Array[Byte],
      sourcesEnc: Array[Byte]
  ): Iterator[DocIndexRow] = {
    val docIds = StrCodec.decode(docIdsEnc)
    val sources = StrCodec.decode(sourcesEnc)
    val lengths = IntCodec.decode(lengthsEnc)
    Iterator.tabulate(docIds.length) { i =>
      DocIndexRow(chunkId, docIds(i), lengths(i), sources(i))
    }
  }

  /** Cheap may-contain test for a token value — the reference's
    * Equal-constraint skip ladder (stats, then dictionary, before any
    * data read; reference: search/constraint.go:343-463) at chunk
    * grain: (1) chunk min/max token bounds (plain metadata columns, so
    * parquet row-group stats prune the SCAN too); (2) for Dict-coded
    * chunks, binary search of the ascending dictionary header —
    * O(log distinct), no payload decode. Returns true when containment
    * cannot be ruled out cheaply (non-dict codecs after a bounds pass).
    */
  def chunkMayContainToken(c: EncodedChunk, t: Int): Boolean =
    t >= c.min_token && t <= c.max_token &&
      graft.codec.IntCodec.dictValues(c.tokens_enc)
        .forall(vs => java.util.Arrays.binarySearch(vs, t) >= 0)

  /** Distinct token values of a chunk. For Dict-coded chunks this reads
    * ONLY the dictionary header — O(distinct), no row decode (the
    * reference's dictionary-page-only distinct,
    * reference: search/materialize.go:358-380); other codecs fall back
    * to full decode + dedup. Returned ascending either way.
    */
  def distinctTokens(c: EncodedChunk): Array[Int] =
    IntCodec.dictValues(c.tokens_enc).getOrElse {
      val all = IntCodec.decode(c.tokens_enc)
      val sorted = all.clone()
      java.util.Arrays.sort(sorted)
      var distinct = 0
      var i = 0
      while (i < sorted.length) {
        if (i == 0 || sorted(i) != sorted(i - 1)) {
          sorted(distinct) = sorted(i); distinct += 1
        }
        i += 1
      }
      java.util.Arrays.copyOf(sorted, distinct)
    }
}
