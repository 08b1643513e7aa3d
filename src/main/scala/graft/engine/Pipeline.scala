package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Dataset, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Job wiring: resumable encode with per-chunk lineage.
  *
  * The metrics/lineage table is the Iceberg-manifest analog (SURVEY.md
  * §1.5 note: no Iceberg runtime jar ships in this sandbox, so the
  * "Iceberg table" is a partitioned Parquet directory + an explicit
  * manifest table — the exact subset of Iceberg semantics the north
  * rule exercises).
  *
  * Resume model: encoding proceeds in `waves` (hash-partitioned groups
  * of chunk ids); each wave is one atomic Spark write (chunks, then the
  * lineage derived from the *written* chunks — so a lineage row exists
  * only for durably persisted data). A failure kills at most the
  * current wave; a re-run left_anti-joins completed chunk ids out of
  * the plan and re-encodes only the remainder — per-partition
  * checkpointing at the granularity a 1000-executor job needs.
  */
object Pipeline {

  final case class EncodeReport(
      wavesRun: Int,
      chunksEncoded: Long,
      chunksSkipped: Long,
      rows: Long,
      tokens: Long,
      rawBytes: Long,
      encodedBytes: Long,
      /** rows discarded by [[compact]]'s duplicate-doc_id dedup (0 for
        * plain encode runs) — surfaced, never silent: the engine's
        * verify contract is multiset-exact, so a caller compacting a
        * table with legitimate duplicate doc_ids must see the loss.
        */
      rowsDropped: Long = 0L
  )

  def chunksPath(outDir: String) = s"$outDir/chunks"
  def lineagePath(outDir: String) = s"$outDir/lineage"

  private def fsOf(spark: SparkSession, path: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** JVM-side mirror of the SQL wave assignment
    * pmod(xxhash64(chunk_id), waves) — Spark's xxhash64 uses seed 42.
    * Lets tests/tools target one wave deterministically.
    */
  def waveOfId(id: Long, waves: Int): Long =
    Math.floorMod(
      org.apache.spark.sql.catalyst.expressions.XXH64.hashLong(id, 42L),
      waves.toLong)

  /** Lineage rows derived from durable chunk metadata. `input_split`
    * comes from the CHUNK (persisted at encode time), never from the
    * currently-running job's argument: an adopted orphan may have been
    * written under a different split than the run that adopts it.
    */
  private def lineageFromChunks(chunks: DataFrame): DataFrame =
    chunks.select(
      col("chunk_id"),
      col("part_source"),
      col("input_split"),
      col("min_doc_id"), col("max_doc_id"),
      col("token_cardinality"),
      col("codec_tokens"), col("codec_lengths"),
      col("codec_doc_id"), col("codec_source"),
      col("n_rows").cast("long").as("row_count"),
      col("n_tokens").as("token_count"),
      col("raw_bytes"), col("encoded_bytes"),
      col("checksum"),
      lit("completed").as("status")
    )

  /** Reconcile chunks that are durable but missing from lineage — the
    * crash window between a wave's chunk write and its lineage write.
    * Without this, resume re-encodes those chunks (they fail the
    * left_anti against lineage) and APPENDS duplicates. Orphans are
    * ADOPTED: their lineage rows are derived from the written chunk
    * metadata (each wave's parquet commit is atomic, so a chunk present
    * in the directory is complete and valid). Metadata-only read — the
    * payload columns are pruned by the explicit select.
    */
  def adoptOrphans(spark: SparkSession, outDir: String): Long = {
    val chunksMeta =
      try {
        withMetadataDefaults(spark.read
          .schema(org.apache.spark.sql.Encoders.product[EncodedChunk].schema)
          .parquet(chunksPath(outDir))
          .drop("doc_ids_enc", "sources_enc", "lengths_enc", "tokens_enc"))
      } catch { case _: org.apache.spark.sql.AnalysisException => return 0L }
    val orphans = readLineage(spark, outDir) match {
      case Some(lin) =>
        chunksMeta.join(broadcast(lin.select("chunk_id").distinct()), Seq("chunk_id"), "left_anti")
      case None => chunksMeta
    }
    // one tiny metadata job; zero when the previous run committed cleanly
    val adopted = orphans.count()
    if (adopted > 0)
      lineageFromChunks(orphans)
        .write.mode(SaveMode.Append).parquet(lineagePath(outDir))
    adopted
  }

  def readLineage(spark: SparkSession, outDir: String): Option[DataFrame] =
    try {
      val df = spark.read.parquet(lineagePath(outDir))
      Some(df)
    } catch { case _: org.apache.spark.sql.AnalysisException => None }

  /** Schema evolution for chunks at rest: metadata columns added in
    * later engine versions (input_split, token_cardinality, min_token /
    * max_token) are filled with unknown/never-prune defaults when a
    * directory written by an older version lacks them (absent column)
    * or an explicit-schema read surfaced them as null. Payload columns
    * are NOT defaulted — their absence still fails loudly. min_token =
    * MinValue / max_token = MaxValue is the never-prune range (the
    * inverse of the empty-chunk (MaxValue, MinValue) prune-always
    * convention); token_cardinality -1 = unknown, consumers decode.
    */
  private def withMetadataDefaults(df: DataFrame): DataFrame = {
    val defaults = Seq[(String, Column)](
      ("input_split", lit("")),
      ("token_cardinality", lit(-1)),
      ("min_token", lit(Int.MinValue)),
      ("max_token", lit(Int.MaxValue)))
    val d0 =
      // doc_bloom's never-prune default IS null (DocBloom.mayContain
      // treats null as may-contain), so only the absent-column case
      // needs a synthesized column — no coalesce
      if (!df.columns.contains("doc_bloom"))
        df.withColumn("doc_bloom", lit(null).cast("binary"))
      else df
    defaults.foldLeft(d0) { case (d, (name, dflt)) =>
      if (!d.columns.contains(name)) d.withColumn(name, dflt)
      else d.withColumn(name, coalesce(col(name), dflt))
    }
  }

  def readChunks(spark: SparkSession, outDir: String): Dataset[EncodedChunk] = {
    import spark.implicits._
    withMetadataDefaults(spark.read.parquet(chunksPath(outDir))).as[EncodedChunk]
  }

  /** Consumer read path: decode the chunks table back to token rows,
    * optionally restricted to some sources. The source filter lands on
    * the Hive partition column (`partitionBy(part_source)` at write),
    * so pruning happens at the directory/file-listing level — chunks of
    * other sources are never read, the analog of the reference's
    * stats-driven row-range pruning (reference: search/constraint.go:394-433).
    */
  def readTokens(
      spark: SparkSession,
      outDir: String,
      sources: Seq[String] = Nil,
      verifyChecksum: Boolean = true
  ): Dataset[TokenRow] = {
    val chunks = readChunks(spark, outDir)
    val pruned =
      if (sources.isEmpty) chunks
      else chunks.filter(org.apache.spark.sql.functions.col("part_source").isin(sources: _*))
    Decoder.decode(pruned, verifyChecksum)
  }

  /** [[readTokens]] behind admission control: the decode's cost (rows,
    * tokens, encoded payload bytes) is pre-flighted from chunk metadata
    * and reserved against `budgets` BEFORE any payload is read — a
    * refused query costs one footer-grade metadata job, never a
    * full-cluster decode (the reference's quota checks before page
    * materialization, reference: search/materialize.go:939-957).
    */
  def readTokensAdmitted(
      spark: SparkSession,
      outDir: String,
      budgets: Admission.Budgets,
      sources: Seq[String] = Nil,
      verifyChecksum: Boolean = true
  ): Dataset[TokenRow] =
    readTokensAdmittedWithCost(spark, outDir, budgets, sources, verifyChecksum)._1

  /** [[readTokensAdmitted]] plus the cost the reservation admitted, so
    * callers report it without a second metadata job (and without
    * duplicating the source-pruning logic).
    */
  def readTokensAdmittedWithCost(
      spark: SparkSession,
      outDir: String,
      budgets: Admission.Budgets,
      sources: Seq[String] = Nil,
      verifyChecksum: Boolean = true
  ): (Dataset[TokenRow], Admission.AdmittedCost) = {
    val chunks = readChunks(spark, outDir)
    val pruned =
      if (sources.isEmpty) chunks
      else chunks.filter(col("part_source").isin(sources: _*))
    Admission.decodeAdmittedWithCost(pruned, budgets, verifyChecksum)
  }

  /** Compact one or more chunks tables into a NEW deduplicated table —
    * the maintenance analog of the reference's multi-block conversion
    * with duplicate-series merge (reference: convert/convert.go
    * `ConvertTSDBBlock` over several blocks; convert_test.go:641-759
    * asserts duplicated series across blocks merge). Streaming ingest
    * accumulates a wave per micro-batch and incremental backfills
    * accumulate whole directories; compaction folds them into one table
    * of full-size chunks.
    *
    * Duplicate doc_ids (within or across inputs) keep ONE deterministic
    * winner — min by (source, n_tok, content checksum) — so the output
    * is a pure function of the input SET, independent of directory
    * order, partitioning or cluster size (the same idempotence
    * discipline as chunk ids and resume).
    *
    * Scale shape: inputs are decoded once (chunk-parallel); dedup is
    * one shuffle on doc_id with map-side combine (reduceGroups); then
    * the standard encode pipeline (one payload shuffle + write).
    * When the inputs are PROVABLY duplicate-free ([[compactPlan]]'s
    * metadata checks) the dedup shuffle is skipped entirely — the
    * common 100 TB compaction (backfills of disjoint date/id ranges)
    * pays one payload shuffle, not two.
    */
  /** The decoded-and-deduplicated row plan a compaction encodes, plus
    * whether the dedup shuffle was provably unnecessary and skipped.
    *
    * Fast path (the common case at scale — backfills compact disjoint
    * date/id ranges): when (a) the input dirs' doc_id RANGES are
    * pairwise disjoint (exact proof from chunk metadata min/max — one
    * tiny agg per dir) and (b) each dir is internally duplicate-free
    * (count == countDistinct over the payload-free doc index), no doc
    * can appear twice, so the union feeds the encoder directly and the
    * only payload shuffle left is run()'s repartition-by-chunk. The
    * proofs are metadata-priced: (a) never touches row data at all,
    * (b) shuffles only doc_id strings with partial aggregation. Any
    * doubt (overlapping ranges, an internal duplicate, an empty dir
    * answer) falls back to the full dedup — the fast path is an
    * optimization, never a correctness gate.
    */
  /** Per-input-dir chunk metadata in ONE Spark job (guide §1/§2: the
    * former shape paid one tiny driver job per dir per question —
    * ranges, fingerprint, row counts — 3·|dirs| scheduling floors for
    * data a single union+groupBy answers): for each dir index,
    * (min doc_id, max doc_id, decimal sum of the per-chunk content
    * hashes, sum of n_rows). Dirs may repeat; the index keys them.
    */
  private def compactDirMeta(
      spark: SparkSession,
      inDirs: Seq[String]
  ): IndexedSeq[(Option[String], Option[String], Option[java.math.BigDecimal], Long)] = {
    val per = inDirs.zipWithIndex.map { case (d, i) =>
      spark.read.parquet(chunksPath(d)).select(
        lit(i).as("dir"),
        col("min_doc_id"), col("max_doc_id"),
        xxhash64(col("chunk_id"), col("checksum"), col("n_rows"))
          .cast("decimal(20,0)").as("h"),
        col("n_rows").cast("long").as("n_rows"))
    }.reduce(_ unionByName _)
    val rows = per.groupBy(col("dir")).agg(
      min("min_doc_id"), max("max_doc_id"), sum("h"), sum("n_rows"))
      .collect()
      .map(r => r.getInt(0) -> ((Option(r.getString(1)), Option(r.getString(2)),
        Option(r.getDecimal(3)), if (r.isNullAt(4)) 0L else r.getLong(4))))
      .toMap
    // a dir with zero chunk rows produces no group — fill the empty shape
    inDirs.indices.map(i => rows.getOrElse(i, (None, None, None, 0L)))
  }

  /** Internal plan: winners + fast-path verdict + the metadata-only
    * (source, doc_id, n_tok) row-equivalent of the winners, which
    * [[run]] feeds to the Chunker pre-passes so the expensive
    * decode(+dedup) plan evaluates once, not three times
    * ([[Chunker.assignChunks]] meta).
    */
  private def compactPlanInternal(
      spark: SparkSession,
      inDirs: Seq[String],
      dirMeta: IndexedSeq[(Option[String], Option[String], Option[java.math.BigDecimal], Long)]
  ): (Dataset[TokenRow], Boolean, DataFrame) = {
    import spark.implicits._
    val all = inDirs.map(d => readTokens(spark, d)).reduce(_ union _)
    val metaAll = inDirs.map(d => readDocIndex(spark, d).toDF()
      .select(col("source"), col("doc_id"), col("n_tok"))).reduce(_ union _)
    val nonEmpty = dirMeta.collect { case (Some(lo), Some(hi), _, _) => (lo, hi) }
    // Utf8Order throughout: the per-dir bounds were aggregated by Spark
    // in UTF-8 byte order, so the driver-side disjointness proof must
    // sort and compare in the SAME order — mixing in Java's UTF-16
    // compare could declare overlapping supplementary-plane ranges
    // disjoint and wrongly skip the dedup
    val rangesDisjoint = nonEmpty.sortBy(_._1)(Utf8Order).sliding(2).forall {
      case Seq((_, aHi), (bLo, _)) => Utf8Order.lt(aHi, bLo)
      case _ => true
    }
    // internal-duplicate proof for ALL dirs in ONE payload-free job
    // (was one job per dir): count == countDistinct over each dir's
    // doc index
    val provablyUnique = rangesDisjoint && {
      val per = inDirs.zipWithIndex.map { case (d, i) =>
        readDocIndex(spark, d).toDF().select(lit(i).as("dir"), col("doc_id"))
      }.reduce(_ unionByName _)
        .groupBy(col("dir"))
        .agg(count(col("doc_id")).as("n"), countDistinct(col("doc_id")).as("nd"))
        .collect()
      per.forall(r => r.getLong(1) == r.getLong(2))
    }
    if (provablyUnique) (all, true, metaAll)
    else {
      // key each row ONCE (content checksum is O(n_tok)); the combiner
      // then compares precomputed keys however many inputs collide. No
      // persist: at target scale materializing the decoded union would
      // demand corpus-size executor storage — the single remaining
      // payload evaluation (the encode pass; pre-passes read metadata)
      // is the cheaper trade, and compact's row accounting is
      // metadata-only.
      val winners = all
        .map(r => ((r.source, r.n_tok, Checksum.ofTokens(r.tokens, r.n_tok)), r))
        .groupByKey(_._2.doc_id)
        .reduceGroups((x, y) =>
          if (Ordering[(String, Int, Long)].lteq(x._1, y._1)) x else y)
        .map(_._2._2)
      // metadata twin of the dedup: min by (source, n_tok) per doc_id —
      // same (source, n_tok) as the winners' (source, n_tok, checksum)
      // min for every doc (the checksum only breaks exact ties, which
      // share source and n_tok), so the Chunker pre-pass masses match.
      // (Struct min orders strings in UTF-8 byte order vs the kernel's
      // UTF-16 — for a supplementary-plane source name the two could
      // pick different winners; that would only shift bucket masses,
      // never which rows encode, and both orders are deterministic, so
      // chunk ids stay a pure function of the input set.)
      val metaWinners = metaAll
        .groupBy(col("doc_id"))
        .agg(min(struct(col("source"), col("n_tok"))).as("w"))
        .select(col("w.source").as("source"), col("doc_id"),
          col("w.n_tok").as("n_tok"))
      (winners, false, metaWinners)
    }
  }

  def compactPlan(
      spark: SparkSession,
      inDirs: Seq[String]
  ): (Dataset[TokenRow], Boolean) = {
    val (winners, fast, _) = compactPlanInternal(spark, inDirs, compactDirMeta(spark, inDirs))
    (winners, fast)
  }

  def compact(
      spark: SparkSession,
      inDirs: Seq[String],
      outDir: String,
      tokensPerChunk: Long = Chunker.DefaultTokensPerChunk,
      waves: Int = 4,
      verify: Boolean = false
  ): EncodeReport = {
    import spark.implicits._
    require(inDirs.nonEmpty, "compact needs at least one input dir")
    val tag = s"compact:${inDirs.sorted.mkString(",")}"
    // in-place compaction can never work: run() appends to the target
    // while readTokens streams from it
    def canon(p: String) = try new java.io.File(p).getCanonicalPath catch { case _: Throwable => p }
    require(!inDirs.map(canon).contains(canon(outDir)),
      s"compact target $outDir must not be one of its inputs (in-place compaction would read while appending)")
    // a populated target is allowed ONLY when it is this exact
    // compaction's partial output (same input set -> same persisted
    // input_split -> identical deterministic chunk ids): that is run()'s
    // designed wave-checkpoint resume. Any other content would be
    // silently duplicated by the append semantics — refuse.
    //
    // The input-split tag names the input DIRECTORIES; it cannot see
    // that a directory's CONTENT changed between the partial run and
    // this resume (appended waves, a re-encode) — in which case resume
    // would mix chunks planned against the old content with chunks
    // planned against the new, and the same doc could land twice. A
    // content fingerprint (order-independent hash over every input
    // chunk's (chunk_id, checksum, n_rows) — metadata-only scan) is
    // persisted beside the partial output and must match on resume.
    val fpFile = new org.apache.hadoop.fs.Path(outDir, "_compact_inputs.fp")
    val fs = fsOf(spark, outDir)
    // ONE metadata job answers every per-dir question (content
    // fingerprint, doc_id ranges, input row counts) — the former shape
    // ran 3 separate driver jobs per input dir for the same tiny scan
    val dirMeta = compactDirMeta(spark, inDirs)
    val contentFp: String = {
      // decimal sum: order-independent AND overflow-free under ANSI
      // mode (a long sum of 2^63-scale hashes would throw); the global
      // sum is the sum of the per-dir sums
      val tot = dirMeta.flatMap(_._3)
        .foldLeft(java.math.BigDecimal.ZERO)(_.add(_))
      if (dirMeta.forall(_._3.isEmpty)) "0" else tot.toBigInteger.toString
    }
    val targetHadChunks =
      fsOf(spark, chunksPath(outDir)).exists(new org.apache.hadoop.fs.Path(chunksPath(outDir)))
    if (targetHadChunks) {
      val splits = readChunks(spark, outDir).toDF()
        .select("input_split").distinct().collect().map(_.getString(0)).toSet
      require(splits == Set(tag),
        s"compact target $outDir holds a chunks table from a different input set " +
          s"(${splits.mkString(", ")}); compaction writes a NEW table or resumes its own partial output")
      if (fs.exists(fpFile)) {
        val stored = readSmallText(fs, fpFile, 64) // a Long prints in <= 20 chars
        require(stored == contentFp.toString,
          s"compact inputs changed since the partial run in $outDir " +
            s"(fingerprint $stored -> $contentFp); inputs must be immutable across " +
            "a resumed compaction — restart into a fresh target")
      }
      // an older partial output without a fingerprint file resumes on
      // the tag check alone (pre-fingerprint behavior), and gains the
      // file below for subsequent resumes
    }
    val out = fs.create(fpFile, true)
    try out.write(contentFp.toString.getBytes("UTF-8")) finally out.close()
    val (winners, _, metaWinnersRaw) = compactPlanInternal(spark, inDirs, dirMeta)
    // persist the METADATA twin for the duration of the encode: the two
    // Chunker pre-passes both aggregate it, and without the persist the
    // doc-index union + dedup shuffle evaluates once per pre-pass. This
    // is ~1% of the payload bytes (ids/lengths/sources only) — bounded,
    // unlike the corpus-sized payload persist compactPlan deliberately
    // declines above.
    val metaWinners = metaWinnersRaw
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rpt =
      try run(spark, winners, outDir, tokensPerChunk, waves, inputSplit = tag,
        planMeta = Some(metaWinners))
      finally metaWinners.unpersist()
    if (verify) {
      val v = Verifier.verify(winners, readChunks(spark, outDir))
      require(v.ok, s"compact round-trip verification FAILED: $v")
    }
    // dedup accounting from chunk METADATA (payload pruned), correct on
    // resume too — rpt.rows counts only the waves this invocation
    // wrote. Input row counts come from the combined dirMeta job. A
    // FRESH target needs no metadata job at all: every output row was
    // written by this invocation's waves, so rpt.rows IS the target
    // row count; only a resumed target (pre-existing chunks) re-reads
    // the directory.
    val outRows =
      if (!targetHadChunks) rpt.rows
      else {
        val r = spark.read.parquet(chunksPath(outDir)).agg(sum("n_rows")).first()
        if (r.isNullAt(0)) 0L else r.getLong(0)
      }
    rpt.copy(rowsDropped = dirMeta.map(_._4).sum - outRows)
  }

  /** Point-lookup decode: only chunks whose [min_doc_id, max_doc_id]
    * covers the key are decoded — the reference's precise row-range
    * pruning from page min/max statistics re-expressed at chunk grain
    * (reference: search/constraint.go:394-433, binary search on the
    * sorted column 520-595). The bounds live as plain parquet columns,
    * so parquet row-group stats prune the SCAN too, before the kernel
    * ever sees a chunk.
    */
  def readTokensForDocId(
      spark: SparkSession,
      outDir: String,
      docId: String
  ): Dataset[TokenRow] = {
    import spark.implicits._
    // prefer the doc-sorted index (log-pruned probe) when one is fresh;
    // the range+bloom metadata scan is the always-available fallback
    val ids = lookupChunkIdsViaIndex(spark, outDir, Seq(docId))
      .getOrElse(pointLookupChunkIds(spark, outDir, docId))
    // phase 2: payload read restricted to the surviving chunk ids —
    // chunk_id is a plain parquet column, so the isin pushes to
    // row-group stats; within each survivor, decode only the target
    // doc's token slice (O(doc), not O(chunk) — Decoder.decodeDocTokens)
    val hit =
      if (ids.isEmpty)
        readChunks(spark, outDir).filter(lit(false))
      else if (ids.length <= 1024)
        readChunks(spark, outDir).filter(col("chunk_id").isin(ids: _*))
      else
        // old-layout dir (null blooms): the candidate list is every
        // range-covering chunk — too many for an In-list expression;
        // fall back to the pushable range predicate (same result set)
        readChunks(spark, outDir)
          .filter(col("min_doc_id") <= docId && col("max_doc_id") >= docId)
    hit.flatMap(c => Decoder.decodeDocTokens(c, docId))
  }

  /** Phase 1 of a point lookup: the candidate chunk ids, from a
    * PAYLOAD-FREE metadata scan (chunk_id, doc_id bounds, doc bloom —
    * tokens_enc never read) filtered by the two pruning rungs:
    *   1. [min_doc_id, max_doc_id] covers the key (also pushed to
    *      parquet row-group stats);
    *   2. the per-chunk doc_id Bloom filter may contain the key
    *      ([[DocBloom]] — the rung that stays selective under hash
    *      bucketing, where rung 1 alone approaches all-chunks at
    *      production rows-per-chunk; null bloom = may-contain).
    * Only the surviving ids come back to the driver — bounded by the
    * bloom FPR (<1% of chunks) plus true hits, never by corpus size.
    */
  def pointLookupChunkIds(
      spark: SparkSession,
      outDir: String,
      docId: String
  ): Seq[Long] = {
    import spark.implicits._
    withMetadataDefaults(spark.read
      .schema(org.apache.spark.sql.Encoders.product[EncodedChunk].schema)
      .parquet(chunksPath(outDir))
      .drop("doc_ids_enc", "sources_enc", "lengths_enc", "tokens_enc"))
      .filter(col("min_doc_id") <= docId && col("max_doc_id") >= docId)
      .select(col("chunk_id"), col("doc_bloom"))
      .as[(Long, Array[Byte])]
      .filter(r => DocBloom.mayContain(r._2, docId))
      .map(_._1)
      .collect()
      .toSeq
  }

  // ---- doc_id → chunk_id index (the log-pruning lookup path) --------
  //
  // The bloom rung bounds a point lookup's DECODE work, but its scan
  // still reads every chunk's bloom (~1.25 bytes per corpus doc per
  // lookup — fine for occasional lookups, linear all the same). The
  // reference gets true log pruning from its global sort
  // (convert/convert.go:765; search/constraint.go:520-595 binary
  // search). Graft keeps hash-bucketed chunks (deterministic, resume-
  // friendly, skew-free) and instead offers a DERIVED index table:
  // (doc_id, chunk_id) range-partitioned and sorted by doc_id, so a
  // lookup is a pushed-filter probe that parquet min/max stats prune
  // to ~one row-group — O(log) file/row-group selection, independent
  // of corpus size. The index is rebuildable metadata (~12 bytes/doc
  // at rest), carries a chunk-set fingerprint, and every lookup
  // validates freshness — a stale or absent index falls back to the
  // bloom path, never to a wrong answer.

  def docIndexPath(outDir: String) = s"$outDir/doc_index"
  private def docIndexFpPath(outDir: String) =
    new org.apache.hadoop.fs.Path(outDir, "_doc_index.fp")

  /** Deep content stamp of a local directory tree (every file's name,
    * length and mtime folded): the cheap invalidation key for
    * [[chunkSetFingerprint]]'s memo. Parquet files are immutable once
    * committed — any append/rewrite adds, removes or replaces files,
    * which changes the stamp. Non-local filesystems return 0 (memo
    * disabled, every call recomputes — the pre-memo behavior).
    */
  private def dirStampDeep(path: String): Long = {
    def walk(f: java.io.File, acc: Long): Long = {
      val kids = Option(f.listFiles()).getOrElse(Array.empty[java.io.File])
      kids.foldLeft(acc * 1099511628211L ^ f.getName.hashCode.toLong) { (a, k) =>
        if (k.isDirectory) walk(k, a)
        else a * 1099511628211L ^ k.getName.hashCode.toLong ^ k.lastModified() ^ k.length()
      }
    }
    val f = new java.io.File(path)
    if (!f.exists()) 0L else walk(f, -3750763034362895579L) // FNV-1a offset basis
  }

  /** Session-scoped memo of [[chunkSetFingerprint]], keyed by the
    * chunks directory's deep content stamp: every freshness check
    * still VALIDATES against the current directory contents (an
    * appended chunk changes the stamp and forces a recompute — the
    * stale-index fallback contract is untouched), but repeated lookups
    * against an unchanged table stop paying one Spark job each. The
    * same derived-metadata-cache convention as SparkEntry's encode
    * caches; nothing persists across JVMs.
    */
  private val fpMemo = scala.collection.concurrent.TrieMap.empty[String, (Long, String)]

  /** Order-independent fingerprint of the chunk-id set — one tiny
    * single-column agg (memoized per content stamp); pairs the index
    * with the exact chunks table it was built from. Format
    * "chunkCount:hashSum".
    */
  private def chunkSetFingerprint(spark: SparkSession, outDir: String): String = {
    val cp = chunksPath(outDir)
    val appId = spark.sparkContext.applicationId
    // entries of other applications belong to stopped sessions — drop
    // them so a long-lived JVM never accumulates dead memo entries
    // (same eviction convention as SparkEntry's encode caches)
    fpMemo.keys.filter(!_.startsWith(s"$appId:")).foreach(fpMemo.remove)
    val key = s"$appId:${new java.io.File(cp).getAbsolutePath}"
    val stamp = dirStampDeep(cp)
    fpMemo.get(key) match {
      case Some((st, fp)) if st == stamp && stamp != 0L => fp
      case _ =>
        val r = spark.read
          .schema(org.apache.spark.sql.Encoders.product[EncodedChunk].schema)
          .parquet(cp)
          .select(xxhash64(col("chunk_id")).as("h"))
          .agg(count(lit(1)), sum(col("h").cast("decimal(20,0)"))).first()
        val s = if (r.isNullAt(1)) "0" else r.getDecimal(1).toBigInteger.toString
        val fp = s"${r.getLong(0)}:$s"
        if (stamp != 0L) fpMemo(key) = (stamp, fp)
        fp
    }
  }

  /** Is the doc-sorted index present and paired with the CURRENT
    * chunks table? The freshness half of [[lookupChunkIdsViaIndex]]
    * without the probe — callers deciding build-vs-lookup check this
    * first instead of paying a throwaway probe job.
    */
  def docIndexIsFresh(spark: SparkSession, outDir: String): Boolean = {
    val fs = fsOf(spark, outDir)
    fs.exists(docIndexFpPath(outDir)) &&
      readSmallText(fs, docIndexFpPath(outDir), 96) == chunkSetFingerprint(spark, outDir)
  }

  /** Build (or rebuild) the doc_id → chunk_id index for an encoded
    * directory. Payload-free: reads only the three small encoded index
    * columns ([[readDocIndex]]), writes doc-sorted parquet. One range
    * shuffle of (doc_id, chunk_id) pairs — metadata-priced at any
    * scale. Derived data: safe to rebuild at any time; concurrent
    * encodes invalidate it via the fingerprint, not via locking.
    */
  def buildDocIndex(spark: SparkSession, outDir: String, indexFiles: Int = 0): Unit = {
    // fingerprint FIRST, then read the pairs: chunks appended while the
    // (long) index write runs are then absent from the STORED
    // fingerprint too, so the next lookup sees stored != current and
    // falls back — computing it after the write would capture the
    // appended chunks in the fingerprint but not in the index, making
    // a stale index validate as fresh
    val fpAtStart = chunkSetFingerprint(spark, outDir)
    val pairs = readDocIndex(spark, outDir).toDF()
      .select(col("doc_id"), col("chunk_id"))
    val files =
      if (indexFiles > 0) indexFiles
      else {
        // chunk count is the first field of the fingerprint already
        // computed above — no separate count job
        val nChunks = fpAtStart.split(":")(0).toLong
        // ~8 chunks' doc ids per index file keeps files in the low MBs
        math.max(1, (nChunks / 8).toInt)
      }
    pairs.repartitionByRange(files, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .write.mode(SaveMode.Overwrite).option("compression", "zstd")
      .parquet(docIndexPath(outDir))
    val fs = fsOf(spark, outDir)
    val out = fs.create(docIndexFpPath(outDir), true)
    try out.write(fpAtStart.getBytes("UTF-8"))
    finally out.close()
  }

  /** Whole small file as trimmed UTF-8, short-read safe (Hadoop input
    * streams may return fewer bytes than asked — a single read() can
    * truncate the fingerprint and poison the comparison).
    */
  private def readSmallText(
      fs: org.apache.hadoop.fs.FileSystem,
      p: org.apache.hadoop.fs.Path,
      cap: Int
  ): String = {
    val in = fs.open(p)
    try {
      val buf = new Array[Byte](cap)
      var off = 0
      var n = 0
      while (off < cap && { n = in.read(buf, off, cap - off); n > 0 }) off += n
      new String(buf, 0, off, "UTF-8").trim
    } finally in.close()
  }

  /** Candidate chunk ids for a key set via the index, or None when the
    * index is absent or stale (its fingerprint no longer matches the
    * chunk-id set — e.g. chunks appended since the build). The probe is
    * a pushed isin filter over doc-sorted parquet: min/max stats prune
    * to the few row-groups covering the keys.
    */
  def lookupChunkIdsViaIndex(
      spark: SparkSession,
      outDir: String,
      docIds: Seq[String]
  ): Option[Seq[Long]] = {
    import spark.implicits._
    if (!docIndexIsFresh(spark, outDir)) return None
    Some(spark.read.parquet(docIndexPath(outDir))
      .filter(col("doc_id").isin(docIds: _*))
      .select(col("chunk_id")).distinct()
      .as[Long].collect().toSeq)
  }

  /** Least string strictly greater (in UTF-8 order, [[Utf8Order]] =
    * Spark's string order) than every string with the given prefix —
    * the exclusive upper bound that turns `doc_id LIKE 'p%'` into the
    * range [p, successor(p)). Computed by incrementing the prefix's
    * last code point (UTF-8 byte order is monotone in code-point
    * value, so the increment bounds the prefix family exactly);
    * trailing U+10FFFF code points cannot be incremented and are
    * dropped first. None = no finite bound (prefix is all-U+10FFFF or
    * empty): the caller's range is [p, +inf).
    */
  def prefixSuccessor(prefix: String): Option[String] = {
    val cps = prefix.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0 && cps(i) == 0x10FFFF) i -= 1
    if (i < 0) None
    else {
      val out = java.util.Arrays.copyOf(cps, i + 1)
      out(i) += 1
      // skip the surrogate block: no valid string contains a lone
      // surrogate code point (String.getBytes(UTF_8) would mangle it
      // to '?', making the stored bound sort BELOW the range's lo and
      // match nothing), and every code point in [U+D800, U+DFFF] is
      // unencodable, so U+E000 is the least valid next code point —
      // the bound stays exact
      if (out(i) >= 0xD800 && out(i) <= 0xDFFF) out(i) = 0xE000
      Some(new String(out, 0, out.length))
    }
  }

  /** Candidate chunk ids whose doc_id span intersects [lo, hi) —
    * hi = None means unbounded above. The chunk-grain analog of the
    * reference's regex-derived page bounds (it turns a prefix/set
    * regex into [minv,maxv] and prunes pages on sorted-column stats,
    * reference: search/constraint.go:894-909): graft's chunks are
    * hash-bucketed, so the ordered structure lives in the DERIVED
    * doc-sorted index — when fresh, the probe is a pushed range filter
    * whose parquet min/max stats prune to the few row-groups covering
    * [lo, hi), O(log) in corpus size. Absent/stale index falls back to
    * the chunks' [min_doc_id, max_doc_id] metadata columns (the Bloom
    * rung serves only point probes — a Bloom cannot answer a range).
    */
  def lookupChunkIdsForRange(
      spark: SparkSession,
      outDir: String,
      lo: String,
      hi: Option[String]
  ): Seq[Long] = {
    import spark.implicits._
    val viaIndex =
      if (!docIndexIsFresh(spark, outDir)) None
      else {
        val probe = spark.read.parquet(docIndexPath(outDir))
          .filter(hi.foldLeft(col("doc_id") >= lo)((p, h) => p && col("doc_id") < h))
        Some(probe.select(col("chunk_id")).distinct().as[Long].collect().toSeq)
      }
    viaIndex.getOrElse {
      withMetadataDefaults(spark.read
        .schema(org.apache.spark.sql.Encoders.product[EncodedChunk].schema)
        .parquet(chunksPath(outDir))
        .drop("doc_ids_enc", "sources_enc", "lengths_enc", "tokens_enc"))
        .filter(hi.foldLeft(col("max_doc_id") >= lo)((p, h) => p && col("min_doc_id") < h))
        .select(col("chunk_id"))
        .as[Long]
        .collect()
        .toSeq
    }
  }

  /** Range read over AT-REST chunks: every doc with lo <= doc_id < hi
    * (UTF-8 order — hi = None means unbounded). Candidates from
    * [[lookupChunkIdsForRange]]; each surviving chunk decodes its doc
    * index once and slices ONLY the in-range docs' tokens
    * ([[Decoder.decodeDocsTokensWhere]]).
    */
  def readTokensForDocIdRange(
      spark: SparkSession,
      outDir: String,
      lo: String,
      hi: Option[String]
  ): Dataset[TokenRow] = {
    import spark.implicits._
    val ids = lookupChunkIdsForRange(spark, outDir, lo, hi)
    val inRange = (id: String) => Utf8Order.lteq(lo, id) &&
      hi.forall(h => Utf8Order.lt(id, h))
    val hit =
      if (ids.isEmpty) readChunks(spark, outDir).filter(lit(false))
      else if (ids.length <= 1024)
        readChunks(spark, outDir).filter(col("chunk_id").isin(ids: _*))
      else readChunks(spark, outDir)
        .filter(hi.foldLeft(col("max_doc_id") >= lo)((p, h) => p && col("min_doc_id") < h))
    hit.flatMap(c => Decoder.decodeDocsTokensWhere(c, inRange))
  }

  /** Prefix read: every doc whose id starts with `prefix` — the
    * `doc_id LIKE 'prefix%'` point-family lookup, served as the range
    * [prefix, [[prefixSuccessor]]) so the doc-sorted index prunes it
    * like any range probe. The decode predicate is startsWith (exact,
    * order-free); the range bounds only select candidates.
    */
  def readTokensForDocIdPrefix(
      spark: SparkSession,
      outDir: String,
      prefix: String
  ): Dataset[TokenRow] = {
    import spark.implicits._
    val ids = lookupChunkIdsForRange(spark, outDir, prefix, prefixSuccessor(prefix))
    val hit =
      if (ids.isEmpty) readChunks(spark, outDir).filter(lit(false))
      else if (ids.length <= 1024)
        readChunks(spark, outDir).filter(col("chunk_id").isin(ids: _*))
      else readChunks(spark, outDir).filter(
        prefixSuccessor(prefix).foldLeft(col("max_doc_id") >= prefix)(
          (p, h) => p && col("min_doc_id") < h))
    hit.flatMap(c => Decoder.decodeDocsTokensWhere(c, _.startsWith(prefix)))
  }

  /** Batch point lookup: all requested docs in one pass. Candidates
    * come from the index when fresh (log-pruned probe), else from the
    * range+bloom metadata scan; each surviving chunk is decoded ONCE
    * for all its requested keys ([[Decoder.decodeDocsTokens]]).
    */
  def readTokensForDocIds(
      spark: SparkSession,
      outDir: String,
      docIds: Seq[String]
  ): Dataset[TokenRow] = {
    import spark.implicits._
    if (docIds.isEmpty) return spark.emptyDataset[TokenRow]
    val ids = lookupChunkIdsViaIndex(spark, outDir, docIds).getOrElse {
      // bloom path: one payload-free metadata scan, any-key semantics.
      // Utf8Order for the driver/kernel-side key extremes and bound
      // compares — they must agree with the Spark column predicate and
      // the stored bounds, both UTF-8 byte order
      val kMax = docIds.max(Utf8Order)
      val kMin = docIds.min(Utf8Order)
      withMetadataDefaults(spark.read
        .schema(org.apache.spark.sql.Encoders.product[EncodedChunk].schema)
        .parquet(chunksPath(outDir))
        .drop("doc_ids_enc", "sources_enc", "lengths_enc", "tokens_enc"))
        .filter(col("min_doc_id") <= kMax && col("max_doc_id") >= kMin)
        .select(col("chunk_id"), col("min_doc_id"), col("max_doc_id"), col("doc_bloom"))
        .as[(Long, String, String, Array[Byte])]
        .filter { case (_, lo, hi, bloom) =>
          docIds.exists(k => Utf8Order.lteq(lo, k) && Utf8Order.lteq(k, hi) &&
            DocBloom.mayContain(bloom, k))
        }
        .map(_._1)
        .collect()
        .toSeq
    }
    readTokensForChunkIds(spark, outDir, ids, docIds)
  }

  /** Decode phase of a batch point lookup: given the surviving
    * candidate chunk ids (from an index probe or the bloom scan),
    * decode each chunk ONCE for all requested keys. Public so a caller
    * that already probed the index (e.g. to decide whether to build
    * it) reuses its candidates instead of paying a second freshness
    * check + probe.
    */
  def readTokensForChunkIds(
      spark: SparkSession,
      outDir: String,
      ids: Seq[Long],
      docIds: Seq[String]
  ): Dataset[TokenRow] = {
    import spark.implicits._
    if (docIds.isEmpty) return spark.emptyDataset[TokenRow]
    val keys = docIds.toSet
    val hit =
      if (ids.isEmpty) readChunks(spark, outDir).filter(lit(false))
      else if (ids.length <= 1024)
        readChunks(spark, outDir).filter(col("chunk_id").isin(ids: _*))
      else readChunks(spark, outDir)
        .filter(col("max_doc_id") >= docIds.min(Utf8Order) &&
          col("min_doc_id") <= docIds.max(Utf8Order))
    hit.flatMap(c => Decoder.decodeDocsTokens(c, keys))
  }

  /** Projection-aware metadata read: (chunk_id, doc_id, n_tok, source)
    * without touching the token payload — neither its bytes (the scan
    * selects only the three small encoded columns; tokens_enc never
    * leaves parquet) nor its decode CPU ([[Decoder.decodeDocIndex]]
    * skips the tokens kernel). The analog of the reference's
    * labels-file-only scan (reference: convert/writer.go:222-243).
    */
  def readDocIndex(spark: SparkSession, outDir: String): Dataset[DocIndexRow] = {
    import spark.implicits._
    spark.read
      .schema(org.apache.spark.sql.Encoders.product[EncodedChunk].schema)
      .parquet(chunksPath(outDir))
      .select(col("chunk_id"), col("doc_ids_enc"), col("lengths_enc"), col("sources_enc"))
      .as[(Long, Array[Byte], Array[Byte], Array[Byte])]
      .mapPartitions(_.flatMap { case (id, d, l, s) =>
        Decoder.decodeDocIndex(id, d, l, s)
      })
  }

  /** Run the resumable encode job.
    *
    * @param failOnChunk test hook: a predicate on chunk_id that makes
    *        the encode kernel throw (kill-one-partition test,
    *        FIXTURES.md §2). Pure function, serialized to tasks.
    */
  def run(
      spark: SparkSession,
      input: Dataset[TokenRow],
      outDir: String,
      tokensPerChunk: Long = Chunker.DefaultTokensPerChunk,
      waves: Int = 4,
      inputSplit: String = "",
      failOnChunk: Long => Boolean = _ => false,
      /** optional (source, doc_id, n_tok) plan-statistics DataFrame,
        * row-equivalent to `input`'s projection — see
        * [[Chunker.assignChunks]]'s meta param. Callers whose input is
        * an expensive opaque plan (compaction) pass the metadata-only
        * equivalent so the payload plan evaluates once, not three
        * times.
        */
      planMeta: Option[DataFrame] = None
  ): EncodeReport = {
    import spark.implicits._

    // crash-window repair BEFORE planning: chunks durable from a run
    // that died between its chunk write and its lineage write are
    // adopted into lineage, so the left_anti below skips them instead
    // of re-encoding duplicates
    adoptOrphans(spark, outDir)

    // inputSplit scopes chunk identity (Chunker.assignChunks planTag):
    // re-running the SAME split resumes/replays idempotently; a
    // different split gets disjoint chunk ids
    val planned = Chunker.chunked(input, tokensPerChunk, planTag = inputSplit, meta = planMeta)

    // chunks already durable from a previous (partial) run
    val completed: Option[DataFrame] =
      readLineage(spark, outDir).map(_.select("chunk_id").distinct())
    // report-only: skipped = planned ∩ completed. Chunk ids are scoped
    // by input_split (disjoint across splits), so the completed chunks
    // OF THIS SPLIT are exactly the planned ones a resume skips —
    // counting all lineage rows would overstate skips when the target
    // also holds chunks from other splits (e.g. streaming micro-batches)
    val skippedCount = readLineage(spark, outDir)
      .map { lin =>
        // pre-input_split lineage (older layout): no way to scope, keep
        // the permissive all-rows count there
        val scoped =
          if (lin.columns.contains("input_split"))
            lin.filter(coalesce(col("input_split"), lit("")) === inputSplit)
          else lin
        scoped.select("chunk_id").distinct().count()
      }
      .getOrElse(0L)

    val pending = completed match {
      case Some(done) =>
        // completed chunk ids are tiny relative to data: broadcast anti-join
        planned.join(broadcast(done), Seq("chunk_id"), "left_anti")
          .as[ChunkedRow]
      case None => planned
    }

    var encoded = 0L
    var rows = 0L
    var tokens = 0L
    var rawB = 0L
    var encB = 0L
    var wavesRun = 0

    // wave = hash of chunk_id, NOT chunk_id % waves: chunk ids are
    // base*MaxSplit + salt, and MaxSplit ≡ 0 mod any small wave count,
    // so modulo would pile every unsalted chunk into wave 0
    def waveOf(c: org.apache.spark.sql.Column) = pmod(xxhash64(c), lit(waves.toLong))

    // ---- stage the plan ONCE, wave-partitioned --------------------------
    // Waves exist for checkpoint granularity (each wave is one atomic
    // chunks-write + lineage commit; a crash loses at most one wave).
    // Round 1 paid for that granularity with `waves` FULL input scans —
    // pending.filter(waveOf) recomputed the whole scan+chunk-plan per
    // wave, the dominant cost of the job at 100 TB. Now the planned rows
    // are written once to a staging dir partitioned by wave; each wave's
    // job reads only its own partition directory (file-listing-level
    // pruning). Total I/O regardless of `waves`: 1x input scan + 1x
    // staging write + 1x staging read + 1x shuffle + 1x final write.
    val wavesEff = math.max(1, waves)
    val stagingDir = s"$outDir/_staging"
    val hadoopPath = new org.apache.hadoop.fs.Path(stagingDir)
    val fs = hadoopPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stagedSchema = org.apache.spark.sql.Encoders.product[ChunkedRow].schema
      .add("wave", org.apache.spark.sql.types.LongType)

    val source: Int => Dataset[ChunkedRow] =
      if (wavesEff == 1) { _ => pending } // single wave: no staging pass
      else {
        pending.withColumn("wave", waveOf(col("chunk_id")))
          .write.mode(SaveMode.Overwrite)
          .partitionBy("wave")
          .parquet(stagingDir)
        w =>
          spark.read.schema(stagedSchema).parquet(stagingDir)
            .filter(col("wave") === w.toLong)
            .drop("wave")
            .as[ChunkedRow]
      }

    var w = 0
    while (w < wavesEff) {
      val enc = Encoder.encode(source(w), inputSplit).map { c =>
        if (failOnChunk(c.chunk_id))
          throw new RuntimeException(s"injected failure on chunk ${c.chunk_id}")
        c
      }(org.apache.spark.sql.Encoders.product[EncodedChunk])

      // wave write: chunks first; lineage derived from what was written
      // (a lineage row exists only for durably persisted data). Reading
      // back only touches metadata columns — parquet prunes the payload.
      // zstd whole-file compression on top of our per-column codecs —
      // the reference's layering too (parquet encodings under zstd,
      // reference: schema/schema.go:38-75)
      // Hive-partitioned by (wave_id, source). wave_id FIRST so each
      // wave owns its own subtree: deriving a wave's lineage reads
      // ONLY that wave's directory — round 2 re-listed and stat-scanned
      // the entire chunks tree every wave, O(waves x total-files)
      // driver-side listings that become the bottleneck at 10^6-10^7
      // chunks. The source level below it keeps decode-side partition
      // pruning (a one-source read touches one directory per wave —
      // the Spark-native analog of the reference's stats-driven
      // row-range pruning, reference: search/constraint.go:394-433).
      // Bloom filters on chunk_id serve point lookups: hash-derived
      // chunk ids span the full int64 range in every row group, so
      // min/max stats never prune them — bloom is the only row-group
      // skip, mirroring the reference's bloom on its sorted label
      // (reference: convert/convert.go:86-93). NDV sized for real row
      // groups (~30 multi-MB chunks each; 4096 is generous headroom at
      // ~5KB/row-group) — the parquet default assumes 1M NDV and pads
      // 1MB per row group, which dwarfs small files.
      enc.toDF().withColumn("wave_id", lit(w))
        .write.mode(SaveMode.Append)
        .option("compression", "zstd")
        .option("parquet.bloom.filter.enabled#chunk_id", "true")
        .option("parquet.bloom.filter.expected.ndv#chunk_id", "4096")
        .partitionBy("wave_id", "part_source")
        .parquet(chunksPath(outDir))

      // this wave's lineage, derived from this wave's directory ALONE
      // (O(1) listings per wave). The dir is absent when the wave had
      // nothing pending (empty append writes no partition dirs).
      val waveDir = s"${chunksPath(outDir)}/wave_id=$w"
      if (fsOf(spark, waveDir).exists(new org.apache.hadoop.fs.Path(waveDir))) {
        val writtenAll = spark.read
          .schema(org.apache.spark.sql.Encoders.product[EncodedChunk].schema)
          .parquet(waveDir)
        // on resume, the dir also holds chunks from the previous run:
        // exclude anything already in the lineage table
        val written = completed match {
          case Some(done) => writtenAll.join(broadcast(done), Seq("chunk_id"), "left_anti")
          case None => writtenAll
        }
        // wave stats ride the lineage write as observed metrics (one
        // job instead of a write + a second aggregate over the same
        // directory)
        val obs = org.apache.spark.sql.Observation(s"wave-$w-stats")
        val lin = lineageFromChunks(written).observe(obs,
          count(lit(1)).as("n"), sum("row_count").as("r"),
          sum("token_count").as("t"), sum("raw_bytes").as("rb"),
          sum("encoded_bytes").as("eb"))
        lin.write.mode(SaveMode.Append).parquet(lineagePath(outDir))
        val stats = obs.get
        encoded += stats("n").asInstanceOf[Long]
        if (stats("r") != null) {
          rows += stats("r").asInstanceOf[Long]
          tokens += stats("t").asInstanceOf[Long]
          rawB += stats("rb").asInstanceOf[Long]
          encB += stats("eb").asInstanceOf[Long]
        }
      }
      wavesRun += 1
      w += 1
    }
    if (wavesEff > 1) fs.delete(hadoopPath, true)
    EncodeReport(wavesRun, encoded, skippedCount, rows, tokens, rawB, encB)
  }
}
