package graft.engine

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import java.nio.file.Files

/** Brute-force distinct for cross-checking the dictionary-only path. */
object IntCodecBrute {
  def distinct(c: EncodedChunk): Array[Int] =
    graft.codec.IntCodec.decode(c.tokens_enc).distinct.sorted
}

/** E2E engine suite per FIXTURES.md §§2-3: bit-identical round-trip,
  * kill-one-partition resume, token-weighted skew splitting, and the
  * size-vs-stock-parquet bar.
  */
class EngineSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-engine-spec")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  locally { spark.sparkContext.setLogLevel("WARN") }

  override def afterAll(): Unit = spark.stop()

  def tmpDir(): String = Files.createTempDirectory("graft-test").toString

  test("chunker: deterministic ids, token-weighted budget respected") {
    import spark.implicits._
    val ds = Fixtures.tokenTable(spark, 2000, seed = 1, medianLen = 128, maxLen = 4096, partitions = 4)
    val a = Chunker.chunked(ds, tokensPerChunk = 64 * 1024).select("doc_id", "chunk_id").as[(String, Long)].collect().toMap
    val b = Chunker.chunked(ds, tokensPerChunk = 64 * 1024).select("doc_id", "chunk_id").as[(String, Long)].collect().toMap
    assert(a == b, "chunk assignment must be deterministic across runs")

    val loads = Chunker.chunked(ds, tokensPerChunk = 64 * 1024)
      .groupBy("chunk_id").sum("n_tok").as[(Long, Long)].collect()
    val budget = 64 * 1024
    // post-split chunks stay within ~2x budget + one max doc (greedy hash
    // split can't do better than doc granularity)
    val tooFat = loads.filter(_._2 > 2L * budget + 4096)
    assert(tooFat.isEmpty, s"overweight chunks: ${tooFat.mkString(",")}")
  }

  test("chunker: metadata pre-pass plans identically to the payload plan") {
    import spark.implicits._
    // the meta param feeds the two sizing pre-passes a row-equivalent
    // (source, doc_id, n_tok) plan — chunk ids must come out identical
    // to the payload-derived plan (compact and chunksFor rely on this
    // to evaluate expensive opaque inputs once, not three times)
    val ds = Fixtures.tokenTable(spark, 1500, seed = 31, medianLen = 128, maxLen = 4096, partitions = 4)
    val meta = ds.toDF().select(
      org.apache.spark.sql.functions.col("source"),
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.col("n_tok"))
    val direct = Chunker.chunked(ds, tokensPerChunk = 64 * 1024)
      .select("doc_id", "chunk_id").as[(String, Long)].collect().toMap
    val viaMeta = Chunker.chunked(ds, tokensPerChunk = 64 * 1024, meta = Some(meta))
      .select("doc_id", "chunk_id").as[(String, Long)].collect().toMap
    assert(direct == viaMeta,
      "meta-based pre-passes must produce the identical chunk plan")
  }

  test("skew: one hot bucket splits into many chunks") {
    import spark.implicits._
    // all rows share ids that hash anywhere, but budget is tiny so every
    // base bucket is overweight and must split
    val ds = Fixtures.tokenTable(spark, 500, seed = 2, medianLen = 256, maxLen = 1024, partitions = 2)
    val nChunksTight = Chunker.chunked(ds, tokensPerChunk = 8 * 1024).select("chunk_id").distinct().count()
    val nChunksLoose = Chunker.chunked(ds, tokensPerChunk = 1 << 28).select("chunk_id").distinct().count()
    val nSources = ds.toDF().select("source").distinct().count()
    // loose budget: exactly one chunk per source (chunks are single-source)
    assert(nChunksLoose == nSources, s"expected $nSources chunks, got $nChunksLoose")
    assert(nChunksTight > 4L, s"expected salting to split, got $nChunksTight chunks")
  }

  test("chunks are single-source (enables decode-side partition pruning)") {
    import spark.implicits._
    val ds = Fixtures.tokenTable(spark, 2000, seed = 9, medianLen = 128, maxLen = 4096, partitions = 4)
    val mixed = Chunker.chunked(ds, tokensPerChunk = 64 * 1024)
      .groupBy("chunk_id")
      .agg(org.apache.spark.sql.functions.countDistinct("source").as("n_src"))
      .filter(org.apache.spark.sql.functions.col("n_src") > 1)
      .count()
    assert(mixed == 0L, s"$mixed chunks mix sources")
  }

  test("encode -> decode round-trip is bit-identical (keystone)") {
    val ds = Fixtures.tokenTable(spark, 3000, seed = 3, medianLen = 200, maxLen = 8192, partitions = 4)
    val out = tmpDir()
    val report = Pipeline.run(spark, ds, out, tokensPerChunk = 128 * 1024, waves = 3)
    assert(report.chunksSkipped == 0)
    assert(report.rows == 3000)

    val chunks = Pipeline.readChunks(spark, out)
    val v = Verifier.verify(ds, chunks)
    assert(v.ok, s"verify failed: $v")
    assert(v.sourceRows == 3000 && v.decodedRows == 3000 && v.mismatchedRows == 0)
    assert(v.sourceTokens == v.decodedTokens)
  }

  test("resume: kill one wave, re-run encodes only the remainder") {
    val ds = Fixtures.tokenTable(spark, 1500, seed = 4, medianLen = 100, maxLen = 2048, partitions = 4)
    val out = tmpDir()
    // first run: fail every chunk of (hash-)wave 2
    val failed = try {
      Pipeline.run(spark, ds, out, tokensPerChunk = 64 * 1024, waves = 3,
        failOnChunk = id => Pipeline.waveOfId(id, 3) == 2)
      false
    } catch { case _: Exception => true }
    assert(failed, "injected failure must surface")

    // waves 0 and 1 are durable
    val lin1 = Pipeline.readLineage(spark, out).get
    val done1 = lin1.select("chunk_id").distinct().count()
    assert(done1 > 0, "completed waves must have lineage")
    val wave2Done = lin1.select("chunk_id").collect()
      .count(r => Pipeline.waveOfId(r.getLong(0), 3) == 2)
    assert(wave2Done == 0, "failed wave must have no lineage")

    // second run: no failure; must skip completed chunks
    val report2 = Pipeline.run(spark, ds, out, tokensPerChunk = 64 * 1024, waves = 3)
    assert(report2.chunksSkipped == done1, s"expected $done1 skipped, got ${report2.chunksSkipped}")
    val lin2 = Pipeline.readLineage(spark, out).get
    assert(lin2.select("chunk_id").distinct().count() == lin2.count(), "no duplicate lineage rows")
    val wave2Now = lin2.select("chunk_id").collect()
      .count(r => Pipeline.waveOfId(r.getLong(0), 3) == 2)
    assert(wave2Now > 0, "failed wave now completed")

    // and the union still round-trips
    val v = Verifier.verify(ds, Pipeline.readChunks(spark, out))
    assert(v.ok, s"post-resume verify failed: $v")
  }

  test("size bar: encoded output <= stock parquet zstd on same rows") {
    val ds = Fixtures.tokenTable(spark, 4000, seed = 5, medianLen = 300, maxLen = 4096, partitions = 4)
    val out = tmpDir()
    Pipeline.run(spark, ds, out, tokensPerChunk = 512 * 1024, waves = 1)
    val (ours, ref) = Verifier.sizeVsReferenceParquet(ds, Pipeline.chunksPath(out), tmpDir())
    info(s"ours=$ours bytes, stock parquet zstd=$ref bytes, ratio=${ours.toDouble / ref}")
    assert(ours <= ref, s"encoded $ours > reference $ref")
  }

  test("readTokens: source-pruned decode returns exactly that source's rows") {
    import spark.implicits._
    val ds = Fixtures.tokenTable(spark, 800, seed = 12, medianLen = 64, maxLen = 512, partitions = 2)
    val out = tmpDir()
    Pipeline.run(spark, ds, out, tokensPerChunk = 64 * 1024, waves = 1)
    val web = Pipeline.readTokens(spark, out, sources = Seq("web"))
    val expected = ds.filter(_.source == "web")
    assert(web.count() == expected.count())
    val v = Verifier.verify(expected, Encoder.encodeTable(expected, 64 * 1024))
    assert(v.ok)
    // pruning proof: the decode plan only lists the web partition
    val files = web.queryExecution.executedPlan.toString()
    assert(!files.contains("part_source=books") || files.contains("PartitionFilters"),
      "expected partition pruning on part_source")
  }

  test("input is scanned O(1) times regardless of wave count") {
    import spark.implicits._
    // every materialization of the input bumps the accumulator; the
    // wave loop must NOT multiply input scans (round-1 regression:
    // waves=16 re-scanned the full input 16 times)
    val n = 600
    val base = Fixtures.tokenTable(spark, n, seed = 21, medianLen = 64, maxLen = 512, partitions = 2)
    val acc1 = spark.sparkContext.longAccumulator("scan1")
    Pipeline.run(spark, base.map { r => acc1.add(1); r }, tmpDir(),
      tokensPerChunk = 32 * 1024, waves = 1)
    val acc4 = spark.sparkContext.longAccumulator("scan4")
    Pipeline.run(spark, base.map { r => acc4.add(1); r }, tmpDir(),
      tokensPerChunk = 32 * 1024, waves = 4)
    val scans1 = acc1.value.toDouble / n
    val scans4 = acc4.value.toDouble / n
    info(s"input materializations: waves=1 -> $scans1, waves=4 -> $scans4")
    assert(scans4 <= scans1 + 0.01,
      s"wave count multiplied input scans: $scans1 vs $scans4")
  }

  test("orphan chunks (crash between chunk and lineage write) are adopted") {
    val ds = Fixtures.tokenTable(spark, 400, seed = 31, medianLen = 64, maxLen = 512, partitions = 2)
    val out = tmpDir()
    Pipeline.run(spark, ds, out, tokensPerChunk = 32 * 1024, waves = 2)
    val nChunks = Pipeline.readChunks(spark, out).count()
    val nRows = Pipeline.readTokens(spark, out).count()
    // simulate the crash window: chunks durable, lineage lost
    val linPath = new org.apache.hadoop.fs.Path(Pipeline.lineagePath(out))
    linPath.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(linPath, true)
    // resume must ADOPT the orphans (derive lineage from written chunk
    // metadata), not re-encode them into duplicates
    val report = Pipeline.run(spark, ds, out, tokensPerChunk = 32 * 1024, waves = 2)
    assert(report.chunksEncoded == 0, s"re-encoded ${report.chunksEncoded} adopted chunks")
    assert(Pipeline.readChunks(spark, out).count() == nChunks, "duplicate chunks appended")
    assert(Pipeline.readTokens(spark, out).count() == nRows, "decode emits duplicates")
    val lin = Pipeline.readLineage(spark, out).get
    assert(lin.count() == nChunks, "adopted lineage incomplete")
    val v = Verifier.verify(ds, Pipeline.readChunks(spark, out))
    assert(v.ok, s"post-adoption verify failed: $v")
  }

  test("point lookup decodes only a bounded fraction of chunks at production docs-per-chunk") {
    import spark.implicits._
    // production-RATIO fixture: hundreds of docs per chunk, the regime
    // where hash bucketing makes each chunk's [min_doc_id, max_doc_id]
    // cover ~the whole corpus range and the range rung alone prunes
    // ~nothing (round-3 verdict: the old `hit < total` assertion was
    // satisfiable at >95% selectivity). The doc_id bloom rung must keep
    // the candidate set near-constant regardless.
    val ds = Fixtures.tokenTable(spark, 2000, seed = 33, medianLen = 64, maxLen = 512, partitions = 4)
    val out = tmpDir()
    Pipeline.run(spark, ds, out, tokensPerChunk = 32 * 1024, waves = 1)
    val all = Pipeline.readChunks(spark, out)
    val total = all.count()
    assert(total >= 4, s"fixture must span several chunks, got $total")
    // a MID-corpus key: the global min/max doc_ids are covered by one
    // chunk by construction even under hash bucketing — the worst (and
    // typical) case is a key strictly inside every chunk's range
    val key = ds.orderBy("doc_id").limit(1001).collect().last.doc_id
    val rangeHits = all.filter(
      org.apache.spark.sql.functions.col("min_doc_id") <= key &&
        org.apache.spark.sql.functions.col("max_doc_id") >= key).count()
    val candidates = Pipeline.pointLookupChunkIds(spark, out, key)
    info(s"chunk pruning for doc_id=$key: range rung $rangeHits/$total, " +
      s"range+bloom ${candidates.size}/$total")
    // pin the premise: under hash bucketing the range rung alone is
    // near-vacuous for an interior key (this is WHY the bloom exists)
    assert(rangeHits > total / 2,
      s"fixture no longer exercises the hash-bucket worst case ($rangeHits/$total)")
    // real selectivity: the bloom holds the candidate set to a small
    // fraction of the chunk count (FPR <1%; the bound leaves room for
    // unlucky small-sample collisions)
    assert(candidates.size <= math.max(1L, total / 4),
      s"bloom rung not selective: ${candidates.size} of $total chunks")
    val rows = Pipeline.readTokensForDocId(spark, out, key).collect()
    val expected = ds.filter(_.doc_id == key).head()
    assert(rows.length == 1)
    assert(rows.head.tokens.sameElements(expected.tokens))
    // a key that does not exist anywhere: bloom should normally reject
    // every chunk, and the decode must return nothing either way
    val missCandidates = Pipeline.pointLookupChunkIds(spark, out, "no-such-doc-id")
    info(s"absent-key candidates: ${missCandidates.size}/$total")
    assert(missCandidates.size <= math.max(1L, total / 4))
    assert(Pipeline.readTokensForDocId(spark, out, "no-such-doc-id").isEmpty)
  }

  test("decodeDocTokens materializes O(doc), not O(chunk)") {
    import spark.implicits._
    // one big chunk, many docs; pick a doc in the middle
    val rows = (0 until 200).map { i =>
      val len = 50 + (i * 31) % 400
      TokenRow(f"d$i%04d", Array.tabulate(len)(j => 100000 + (i * 7919 + j * 131) % 50000), len, "web")
    }
    val ds = spark.createDataset(rows)
    val chunks = Encoder.encodeTable(ds, tokensPerChunk = 1 << 30).collect()
    assert(chunks.length == 1, "fixture must produce a single chunk")
    val c = chunks.head
    // this fixture's token stream selects a byte-addressable codec —
    // the case where the slice decode is provably O(doc) (see the
    // corruption test in IntCodecSpec); fordelta would fall back
    info(s"tokens codec under point decode: ${c.codec_tokens}")
    assert(c.codec_tokens != "fordelta" && c.codec_tokens != "rle")
    val target = rows(123)
    val got = Decoder.decodeDocTokens(c, target.doc_id)
    assert(got.isDefined)
    assert(got.get.tokens.sameElements(target.tokens),
      "point decode differs from source")
    // exactly the doc's tokens are materialized by construction
    // (decodeRange returns a len-sized array); also: a missing key
    assert(got.get.tokens.length == target.n_tok)
    assert(Decoder.decodeDocTokens(c, "no-such-doc").isEmpty)
  }

  test("decodeDocTokens falls back correctly on non-addressable codecs") {
    import spark.implicits._
    // sorted-ascending tokens force the fordelta codec, which has no
    // offset access — the point decode must still return exact rows
    // via its full-decode fallback
    val rows = (0 until 40).map { i =>
      TokenRow(f"d$i%03d", Array.tabulate(300)(j => i * 300 + j), 300, "web")
    }
    val ds = spark.createDataset(rows)
    val chunks = Encoder.encodeTable(ds, tokensPerChunk = 1 << 30).collect()
    assert(chunks.length == 1)
    val c = chunks.head
    info(s"tokens codec under fallback test: ${c.codec_tokens}")
    val target = rows(17)
    val got = Decoder.decodeDocTokens(c, target.doc_id)
    assert(got.isDefined && got.get.tokens.sameElements(target.tokens))
    assert(got.get.source == "web" && got.get.n_tok == 300)
  }

  test("adopted orphans keep the input_split they were encoded under") {
    val ds = Fixtures.tokenTable(spark, 300, seed = 41, medianLen = 64, maxLen = 512, partitions = 2)
    val out = tmpDir()
    Pipeline.run(spark, ds, out, tokensPerChunk = 32 * 1024, waves = 1, inputSplit = "split-A")
    // crash window: lineage lost, chunks durable
    val linPath = new org.apache.hadoop.fs.Path(Pipeline.lineagePath(out))
    linPath.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(linPath, true)
    // the adopting run does NOT know the original split — lineage must
    // come from the chunk metadata, not the adopter's argument
    val adopted = Pipeline.adoptOrphans(spark, out)
    assert(adopted > 0)
    val splits = Pipeline.readLineage(spark, out).get
      .select("input_split").distinct().collect().map(_.getString(0)).toSeq
    assert(splits == Seq("split-A"), s"adopted lineage lost the original split: $splits")
  }

  test("each wave owns its own chunk subdirectory (O(1) listings per wave)") {
    val ds = Fixtures.tokenTable(spark, 900, seed = 42, medianLen = 64, maxLen = 512, partitions = 2)
    val out = tmpDir()
    Pipeline.run(spark, ds, out, tokensPerChunk = 16 * 1024, waves = 3)
    // layout: chunks/wave_id=<w>/part_source=<s>/... — per-wave lineage
    // derivation lists ONE wave_id dir, never the whole tree (round-2
    // regression: O(waves x total-files) listings)
    val waveDirs = new java.io.File(Pipeline.chunksPath(out))
      .listFiles().filter(_.isDirectory).map(_.getName).filter(_.startsWith("wave_id=")).sorted
    assert(waveDirs.nonEmpty && waveDirs.forall(_.matches("wave_id=\\d+")),
      s"expected wave_id partition dirs, got ${waveDirs.mkString(",")}")
    waveDirs.foreach { wd =>
      val srcDirs = new java.io.File(Pipeline.chunksPath(out), wd)
        .listFiles().filter(_.isDirectory).map(_.getName)
      assert(srcDirs.forall(_.startsWith("part_source=")),
        s"wave dir $wd lacks source partitioning: ${srcDirs.mkString(",")}")
    }
    // full-tree readers are unaffected
    val v = Verifier.verify(ds, Pipeline.readChunks(spark, out))
    assert(v.ok, s"verify failed over wave-partitioned layout: $v")
  }

  test("readDocIndex returns ids/lengths without token decode") {
    import spark.implicits._
    val ds = Fixtures.tokenTable(spark, 300, seed = 34, medianLen = 64, maxLen = 512, partitions = 2)
    val out = tmpDir()
    Pipeline.run(spark, ds, out, tokensPerChunk = 32 * 1024, waves = 1)
    val idx = Pipeline.readDocIndex(spark, out)
      .collect().map(r => r.doc_id -> (r.n_tok, r.source)).toMap
    val src = ds.collect().map(r => r.doc_id -> (r.n_tok, r.source)).toMap
    assert(idx == src)
  }

  test("distinctTokens: dict chunks read dictionary only; cardinality exact") {
    import spark.implicits._
    // low-cardinality tokens force the dict codec
    val rows = (0 until 50).map { i =>
      TokenRow(f"d$i%03d", Array.fill(2000)(i % 7), 2000, "web")
    }
    val ds = spark.createDataset(rows)
    val chunks = Encoder.encodeTable(ds, tokensPerChunk = 1 << 24).collect()
    assert(chunks.nonEmpty)
    chunks.foreach { c =>
      val viaApi = Decoder.distinctTokens(c)
      val brute = IntCodecBrute.distinct(c)
      assert(viaApi.sameElements(brute))
      assert(c.token_cardinality == viaApi.length)
    }
  }

  test("token value stats + dictionary skip rule out absent tokens without decode") {
    import spark.implicits._
    val rows = (0 until 40).map { i =>
      TokenRow(f"d$i%03d", Array.fill(1500)((i % 7) * 10), 1500, "web")
    }
    val chunks = Encoder.encodeTable(spark.createDataset(rows), tokensPerChunk = 1 << 24).collect()
    assert(chunks.nonEmpty)
    chunks.foreach { c =>
      val all = graft.codec.IntCodec.decode(c.tokens_enc)
      assert(c.min_token == all.min && c.max_token == all.max,
        s"chunk stats (${c.min_token},${c.max_token}) vs data (${all.min},${all.max})")
      // layer 1, bounds skip: outside [min,max] regardless of codec
      assert(!Decoder.chunkMayContainToken(c, c.min_token - 1))
      assert(!Decoder.chunkMayContainToken(c, c.max_token + 1))
      assert(Decoder.chunkMayContainToken(c, c.min_token))
      assert(Decoder.chunkMayContainToken(c, c.max_token))
    }
    // layer 2, dictionary skip: pin the Dict codec explicitly (the
    // auto-selector may legitimately prefer RLE/plain+zstd for this
    // fixture) — a probe INSIDE the bounds but absent from the data
    // (35 sits between the multiples of 10) is ruled out by the
    // dictionary header alone, no payload decode
    val vals = Array.tabulate(5000)(i => (i % 7) * 10)
    val sink = new graft.codec.ByteSink(5000 * 4 + 16)
    graft.codec.IntCodec.Dict.encode(vals, 0, vals.length, sink)
    val dictChunk = chunks.head.copy(
      tokens_enc = sink.result(), min_token = 0, max_token = 60)
    assert(graft.codec.IntCodec.dictValues(dictChunk.tokens_enc).isDefined)
    assert(!Decoder.chunkMayContainToken(dictChunk, 35))
    assert(Decoder.chunkMayContainToken(dictChunk, 30))
  }

  test("packer: docs never split, budget overflows by at most one doc") {
    import spark.implicits._
    val r = new scala.util.Random(7)
    val rows = (0 until 200).map { i =>
      val n = 1 + r.nextInt(900)
      TokenRow(f"d$i%04d", Array.tabulate(n)(j => (i * 31 + j) % 997), n, s"src${i % 3}")
    }
    val ds = spark.createDataset(rows)
    val budget = 1000L
    val packed = Packer.pack(ds, budget).collect()
    // conservation: every doc and every token lands in exactly one bin
    assert(packed.map(_.n_docs).sum == rows.length)
    assert(packed.map(_.n_tok.toLong).sum == rows.map(_.n_tok.toLong).sum)
    packed.foreach { p =>
      // internal consistency: boundaries describe the concatenation
      assert(p.lengths.sum == p.n_tok && p.tokens.length == p.n_tok)
      assert(p.doc_ids.length == p.n_docs)
      assert(p.doc_ids.sorted.sameElements(p.doc_ids), "docs out of order in bin")
      // never-split discipline: a bin exceeds the budget only by the
      // tail of its last doc — every doc STARTS inside the budget
      assert(p.n_tok - p.lengths.last < budget,
        s"bin ${p.bin} of ${p.source}: last doc starts at offset ${p.n_tok - p.lengths.last} >= $budget")
    }
    // the packed concatenation reproduces each doc bit-identically
    val byDoc = rows.map(x => x.doc_id -> x.tokens).toMap
    packed.foreach { p =>
      var off = 0
      p.doc_ids.zip(p.lengths).foreach { case (id, len) =>
        assert(java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(p.tokens, off, off + len), byDoc(id)))
        off += len
      }
    }
    // plan and materialization agree on bin assignment
    import org.apache.spark.sql.functions.{col => fcol, sum => fsum}
    val plan = Packer.plan(ds, budget)
      .groupBy(fcol("source"), fcol("bin"))
      .agg(fsum("n_tok").cast("long").as("t"))
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getLong(2)).toMap
    packed.foreach(p => assert(plan((p.source, p.bin)) == p.n_tok.toLong))
  }

  test("packer: duplicate (doc_id, source) rows fail loudly instead of corrupting bins") {
    import spark.implicits._
    val rows = Seq(
      TokenRow("d0001", Array(1, 2, 3), 3, "web"),
      TokenRow("d0002", Array(4, 5), 2, "web"),
      TokenRow("d0001", Array(9, 9, 9, 9), 4, "web")) // duplicate key
    val ds = spark.createDataset(rows)
    // the precondition check rides the plan's window — any action
    // evaluating the duplicated partition must surface the error
    val e = intercept[Exception] {
      Packer.pack(ds, 1000L).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("duplicate (doc_id, source)")),
      s"wrong failure: ${messages(e).mkString(" | ")}")
    // unique input still packs fine through the same code path
    val ok = Packer.pack(ds.dropDuplicates("doc_id", "source"), 1000L).collect()
    assert(ok.map(_.n_docs).sum == 2)
  }

  test("compact: resume refuses inputs whose content changed since the partial run") {
    import spark.implicits._
    val dirA = tmpDir()
    val dsA = Fixtures.tokenTable(spark, 300, seed = 61, medianLen = 64, maxLen = 512, partitions = 2)
    Pipeline.run(spark, dsA, dirA, tokensPerChunk = 16 * 1024, waves = 1)
    val out = tmpDir()
    Pipeline.compact(spark, Seq(dirA), out, tokensPerChunk = 16 * 1024, waves = 1)
    // same inputs, unchanged: idempotent resume/replay still allowed
    Pipeline.compact(spark, Seq(dirA), out, tokensPerChunk = 16 * 1024, waves = 1)
    // now APPEND to the input dir (content changes, path set unchanged —
    // the input_split tag alone cannot see this); a distinct inputSplit
    // gives the new docs disjoint chunk ids so the append is real
    val extra = Fixtures.tokenTable(spark, 50, seed = 62, medianLen = 64, maxLen = 512, partitions = 1)
      .map(r => r.copy(doc_id = "zz-" + r.doc_id))
    Pipeline.run(spark, extra, dirA, tokensPerChunk = 16 * 1024, waves = 1,
      inputSplit = "late-wave")
    val e = intercept[IllegalArgumentException] {
      Pipeline.compact(spark, Seq(dirA), out, tokensPerChunk = 16 * 1024, waves = 1)
    }
    assert(e.getMessage.contains("inputs changed"), e.getMessage)
  }

  test("doc index: exact chunk candidates, stale index falls back, batch decode is one pass") {
    import spark.implicits._
    val ds = Fixtures.tokenTable(spark, 1500, seed = 81, medianLen = 64, maxLen = 512, partitions = 4)
    val out = tmpDir()
    Pipeline.run(spark, ds, out, tokensPerChunk = 32 * 1024, waves = 1)
    val total = Pipeline.readChunks(spark, out).count()
    assert(total >= 4)
    // no index yet: lookups must fall back (bloom path), not fail
    assert(Pipeline.lookupChunkIdsViaIndex(spark, out, Seq("doc_000000000007")).isEmpty)
    Pipeline.buildDocIndex(spark, out)
    val keys = Seq("doc_000000000007", "doc_000000000433", "doc_000000001111")
    // the index is exact: no bloom false positives, candidates are
    // precisely the chunks holding the keys
    val viaIndex = Pipeline.lookupChunkIdsViaIndex(spark, out, keys)
    assert(viaIndex.isDefined)
    val expectedChunks = Pipeline.readDocIndex(spark, out)
      .filter(r => keys.contains(r.doc_id)).map(_.chunk_id).distinct().collect().sorted
    assert(viaIndex.get.sorted.sameElements(expectedChunks),
      s"index candidates ${viaIndex.get.sorted.toSeq} != exact $expectedChunks")
    // batch read returns every requested doc bit-identically
    val got = Pipeline.readTokensForDocIds(spark, out, keys).collect()
      .map(r => r.doc_id -> r).toMap
    assert(got.keySet == keys.toSet)
    val src = ds.filter(r => keys.contains(r.doc_id)).collect()
    src.foreach(r => assert(got(r.doc_id).tokens.sameElements(r.tokens)))
    // the index probe is a pushed equality/in filter over doc-sorted
    // parquet: assert the filter actually reaches the scan
    val probe = spark.read.parquet(Pipeline.docIndexPath(out))
      .filter(org.apache.spark.sql.functions.col("doc_id") === keys.head)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("doc_id"), plan)
    // append more chunks (content change) → fingerprint mismatch → the
    // index reports stale and the single-key path still answers
    // correctly through the bloom fallback
    val extra = Fixtures.tokenTable(spark, 60, seed = 82, medianLen = 64, maxLen = 512, partitions = 1)
      .map(r => r.copy(doc_id = "zz-" + r.doc_id))
    Pipeline.run(spark, extra, out, tokensPerChunk = 32 * 1024, waves = 1,
      inputSplit = "late")
    assert(Pipeline.lookupChunkIdsViaIndex(spark, out, keys).isEmpty,
      "stale index must not serve lookups")
    val zz = extra.head()
    val found = Pipeline.readTokensForDocId(spark, out, zz.doc_id).collect()
    assert(found.length == 1 && found.head.tokens.sameElements(zz.tokens))
    // rebuild restores the fast path over the grown table
    Pipeline.buildDocIndex(spark, out)
    val again = Pipeline.lookupChunkIdsViaIndex(spark, out, Seq(zz.doc_id))
    assert(again.isDefined && again.get.nonEmpty)
    // batch lookup with absent keys returns only the present ones
    val mixed = Pipeline.readTokensForDocIds(spark, out, Seq(keys.head, "no-such-doc")).collect()
    assert(mixed.length == 1 && mixed.head.doc_id == keys.head)
  }

  test("prefix successor: exact exclusive bound in UTF-8 order") {
    // basic increment
    assert(Pipeline.prefixSuccessor("4").contains("5"))
    assert(Pipeline.prefixSuccessor("doc_00000000043").contains("doc_00000000044"))
    // the bound is tight: p <= s < succ(p) iff s startsWith p (spot
    // facts at the boundary)
    assert(Utf8Order.lt("499999", "5") && Utf8Order.lteq("4", "4"))
    assert(Utf8Order.gteq("5", "4z"))
    // trailing U+10FFFF cannot increment — drop it, bump the previous
    val maxCp = new String(Character.toChars(0x10FFFF))
    assert(Pipeline.prefixSuccessor("a" + maxCp).contains("b"))
    // no finite bound exists for all-max or empty prefixes
    assert(Pipeline.prefixSuccessor(maxCp * 3).isEmpty)
    assert(Pipeline.prefixSuccessor("").isEmpty)
    // supplementary-plane increment stays in code-point (= UTF-8) order
    val s = Pipeline.prefixSuccessor(new String(Character.toChars(0x10000))).get
    assert(Utf8Order.lt(new String(Character.toChars(0x10000)), s))
    // a prefix ending in U+D7FF must skip the surrogate block: naive
    // increment yields lone U+D800, which UTF-8-encodes as '?' (0x3F)
    // and would sort BELOW the range's lo — the pushed range filter
    // would silently match nothing
    val preSurrogate = "a\ud7ff" // a + U+D7FF (last cp before surrogates)
    val dSucc = Pipeline.prefixSuccessor(preSurrogate).get
    assert(dSucc == "a\ue000", f"got U+${dSucc.codePointAt(1)}%04x")
    assert(Utf8Order.lt(preSurrogate, dSucc))
    // the bound stays tight: any string with the prefix sorts below it
    assert(Utf8Order.lt(preSurrogate + "zzz", dSucc))
  }

  test("prefix/range lookup: index range probe is exact and pushed, stale index falls back") {
    import spark.implicits._
    val ds = Fixtures.tokenTable(spark, 1500, seed = 83, medianLen = 64, maxLen = 512, partitions = 4)
    val out = tmpDir()
    Pipeline.run(spark, ds, out, tokensPerChunk = 32 * 1024, waves = 1)
    val prefix = "doc_00000000043" // doc_000000000430 .. _439
    // no index yet: the metadata fallback must already answer correctly
    val cold = Pipeline.readTokensForDocIdPrefix(spark, out, prefix).collect()
    val want = ds.filter(_.doc_id.startsWith(prefix)).collect()
      .map(r => r.doc_id -> r).toMap
    assert(cold.map(_.doc_id).toSet == want.keySet)
    Pipeline.buildDocIndex(spark, out)
    // index candidates are exactly the chunks holding prefix docs
    val hi = Pipeline.prefixSuccessor(prefix)
    val got = Pipeline.lookupChunkIdsForRange(spark, out, prefix, hi)
    val exact = Pipeline.readDocIndex(spark, out)
      .filter(_.doc_id.startsWith(prefix)).map(_.chunk_id).distinct().collect().sorted
    assert(got.sorted.sameElements(exact),
      s"range candidates ${got.sorted} != exact ${exact.toSeq}")
    // decoded rows are bit-identical to the source
    val viaIndex = Pipeline.readTokensForDocIdPrefix(spark, out, prefix).collect()
    assert(viaIndex.map(_.doc_id).toSet == want.keySet)
    viaIndex.foreach(r => assert(r.tokens.sameElements(want(r.doc_id).tokens)))
    // the range probe is PUSHED: both bounds reach the parquet scan of
    // the doc-sorted index (min/max row-group pruning depends on it)
    val probe = spark.read.parquet(Pipeline.docIndexPath(out))
      .filter(org.apache.spark.sql.functions.col("doc_id") >= prefix &&
        org.apache.spark.sql.functions.col("doc_id") < hi.get)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThanOrEqual(doc_id") && plan.contains("LessThan(doc_id"),
      plan)
    // half-open semantics: range [430, 435) excludes the upper bound
    val part = Pipeline.readTokensForDocIdRange(
      spark, out, "doc_000000000430", Some("doc_000000000435")).collect()
    assert(part.map(_.doc_id).toSet ==
      (430 until 435).map(i => f"doc_$i%012d").toSet)
    // unbounded-above range from the last decade of ids
    val tailRows = Pipeline.readTokensForDocIdRange(
      spark, out, "doc_000000001490", None).collect()
    assert(tailRows.map(_.doc_id).toSet ==
      (1490 until 1500).map(i => f"doc_$i%012d").toSet)
    // append (content change) → stale index → prefix lookup still
    // answers through the chunk min/max metadata fallback
    val extra = Fixtures.tokenTable(spark, 40, seed = 84, medianLen = 64, maxLen = 512, partitions = 1)
      .map(r => r.copy(doc_id = "zz-" + r.doc_id))
    Pipeline.run(spark, extra, out, tokensPerChunk = 32 * 1024, waves = 1,
      inputSplit = "late")
    val zz = Pipeline.readTokensForDocIdPrefix(spark, out, "zz-").collect()
    assert(zz.length == 40, s"stale-index fallback returned ${zz.length} of 40")
  }

  test("token NOT complement: provably-free chunks accept metadata-only, partition is exact") {
    import spark.implicits._
    val probe = 500
    // two sources → two chunk families: "low" docs can never contain
    // the probe (tokens < 100), "mixed" docs contain it in every other
    // doc — so both ladder branches are exercised
    val rows = (0 until 60).map { i =>
      if (i % 2 == 0)
        TokenRow(f"low_$i%04d", Array.tabulate(40)(j => (i * 7 + j) % 100), 40, "low")
      else {
        val base = Array.tabulate(40)(j => (i * 11 + j) % 100)
        if (i % 4 == 1) base(17) = probe
        TokenRow(f"mix_$i%04d", base, 40, "mixed")
      }
    }
    val ds = spark.createDataset(rows)
    val chunks = Encoder.encodeTable(ds, tokensPerChunk = 512).collect()
    val lowChunks = chunks.filter(_.part_source == "low")
    assert(lowChunks.nonEmpty &&
      lowChunks.forall(!Decoder.chunkMayContainToken(_, probe)),
      "every low chunk must be provably probe-free (fast-path trigger)")
    assert(chunks.exists(Decoder.chunkMayContainToken(_, probe)),
      "some mixed chunk must be may-contain (slow-path trigger)")
    // complement ladder (q83's kernel) vs brute-force full decode
    val ladder = chunks.flatMap { c =>
      if (!Decoder.chunkMayContainToken(c, probe))
        Decoder.decodeDocIndex(c.chunk_id, c.doc_ids_enc, c.lengths_enc, c.sources_enc)
          .map(_.doc_id)
      else Decoder.decodeChunk(c).collect {
        case r if !r.tokens.contains(probe) => r.doc_id
      }
    }.toSet
    val brute = rows.collect { case r if !r.tokens.contains(probe) => r.doc_id }.toSet
    assert(ladder == brute, s"complement mismatch: ${ladder.diff(brute)} / ${brute.diff(ladder)}")
    // and the complement really is the complement of the membership set
    val members = rows.collect { case r if r.tokens.contains(probe) => r.doc_id }.toSet
    assert((ladder & members).isEmpty && (ladder ++ members).size == rows.size)
  }

  test("compact: provably disjoint inputs skip the dedup shuffle; overlap does not") {
    import spark.implicits._
    val dsA = Fixtures.tokenTable(spark, 200, seed = 71, medianLen = 64, maxLen = 512, partitions = 2)
    val dsB = dsA.map(r => r.copy(doc_id = "zz-" + r.doc_id))
    val dirA = tmpDir(); val dirB = tmpDir()
    Pipeline.run(spark, dsA, dirA, tokensPerChunk = 16 * 1024, waves = 1)
    Pipeline.run(spark, dsB, dirB, tokensPerChunk = 16 * 1024, waves = 1)
    // doc ranges: dirA = doc_*, dirB = zz-doc_* — disjoint, both unique
    val (fastPlan, skipped) = Pipeline.compactPlan(spark, Seq(dirA, dirB))
    assert(skipped, "disjoint unique inputs must take the no-dedup fast path")
    // the fast plan is decode+union only: no shuffle stage at all
    // before the encoder's own repartition
    val physical = fastPlan.queryExecution.executedPlan.toString
    assert(!physical.contains("Exchange"),
      s"fast path still shuffles:\n$physical")
    // overlapping inputs (dirA twice) must fall back to the dedup
    val (slowPlan, skipped2) = Pipeline.compactPlan(spark, Seq(dirA, dirA))
    assert(!skipped2, "overlapping inputs must keep the dedup shuffle")
    assert(slowPlan.queryExecution.executedPlan.toString.contains("Exchange"))
    // end-to-end: the fast-path compaction reproduces the exact union
    val out = tmpDir()
    val rpt = Pipeline.compact(spark, Seq(dirA, dirB), out, tokensPerChunk = 16 * 1024, waves = 1)
    assert(rpt.rowsDropped == 0)
    val decoded = Pipeline.readTokens(spark, out).collect().map(r => r.doc_id -> r.tokens.toSeq).toMap
    val srcRows = dsA.collect() ++ dsB.collect()
    assert(decoded.size == srcRows.length)
    srcRows.foreach(r => assert(decoded(r.doc_id) == r.tokens.toSeq))
  }

  test("Utf8Order agrees with Spark's own string sort order") {
    import spark.implicits._
    val tricky = Seq(
      "", "a", "ab", "z~", "\u00e9", "\u07ff", "\u0800", "\ud7ff",
      "\ue000", "\ue001", "\uffff",
      new String(Character.toChars(0x10000)),
      new String(Character.toChars(0x1F600)),
      new String(Character.toChars(0x10FFFF)),
      "a\ue000", "a" + new String(Character.toChars(0x10000)))
    val sparkSorted = tricky.toDS().orderBy(org.apache.spark.sql.functions.col("value"))
      .collect().toSeq
    assert(sparkSorted == tricky.sorted(Utf8Order),
      s"Spark order ${sparkSorted.map(_.map(_.toInt.toHexString).mkString("+"))} != " +
        s"Utf8Order ${tricky.sorted(Utf8Order).map(_.map(_.toInt.toHexString).mkString("+"))}")
  }

  test("compact disjointness proof survives supplementary-plane doc ids") {
    import spark.implicits._
    // Regression (r04 review): Encoder computed chunk doc_id bounds in
    // UTF-16 order while Spark aggregates/compares in UTF-8 order. With
    // a supplementary-plane id (U+10000, UTF-16 surrogate sorts LOW,
    // UTF-8 4-byte sequence sorts HIGH) sharing a chunk with \ue000,
    // the stored chunk min was U+10000, the dir-level UTF-8 agg then
    // produced a range EXCLUDING \ue000, and compactPlan declared an
    // overlapping pair of dirs disjoint -- doc \ue000 landed twice in
    // the compacted output.
    val supp = new String(Character.toChars(0x10000))
    def row(id: String, src: String, t0: Int) = TokenRow(id, Array(t0, t0 + 1), 2, src)
    // two sources -> two single-source chunks in dirA: {\ue001} and {supp, \ue000}
    val dsA = spark.createDataset(Seq(
      row("\ue001", "s1", 10), row(supp, "s2", 20), row("\ue000", "s2", 30)))
    val dsB = spark.createDataset(Seq(row("\ue000", "s2", 30)))
    val dirA = tmpDir(); val dirB = tmpDir()
    Pipeline.run(spark, dsA, dirA, tokensPerChunk = 1024, waves = 1)
    Pipeline.run(spark, dsB, dirB, tokensPerChunk = 1024, waves = 1)
    // stored bounds must be UTF-8-ordered: no chunk may claim a min
    // above a doc it contains
    val s2chunk = Pipeline.readChunks(spark, dirA).collect().find(_.part_source == "s2").get
    assert(Utf8Order.lteq(s2chunk.min_doc_id, "\ue000"),
      s"chunk min ${s2chunk.min_doc_id.map(_.toInt.toHexString)} excludes contained \ue000")
    val (_, skipped) = Pipeline.compactPlan(spark, Seq(dirA, dirB))
    assert(!skipped, "overlapping dirs declared disjoint: the dedup shuffle was wrongly skipped")
    val out = tmpDir()
    Pipeline.compact(spark, Seq(dirA, dirB), out, tokensPerChunk = 1024, waves = 1)
    val ids = Pipeline.readTokens(spark, out).collect().map(_.doc_id)
    assert(ids.count(_ == "\ue000") == 1, s"duplicate doc in compacted output: ${ids.toSeq}")
    assert(ids.length == 3)
  }

  test("rmTree deletes a symlink itself, never the target's contents") {
    val victim = Files.createTempDirectory("graft-victim")
    val inside = victim.resolve("data.txt")
    Files.write(inside, "precious".getBytes)
    val scratch = Files.createTempDirectory("graft-scratch-test")
    Files.write(scratch.resolve("own.txt"), "x".getBytes)
    val link = scratch.resolve("link-to-victim")
    Files.createSymbolicLink(link, victim)
    Verifier.rmTree(scratch.toString)
    assert(!Files.exists(scratch), "scratch dir must be gone")
    assert(Files.exists(victim) && Files.exists(inside),
      "rmTree followed a symlink and deleted the target's contents")
    Verifier.rmTree(victim.toString)
  }

  test("chunks written by an older layout (missing metadata columns) still read") {
    import spark.implicits._
    val ds = Fixtures.tokenTable(spark, 200, seed = 21, medianLen = 64, maxLen = 512, partitions = 2)
    val cur = tmpDir()
    Pipeline.run(spark, ds, cur, tokensPerChunk = 16 * 1024, waves = 1)
    // simulate a directory written before input_split/token_cardinality/
    // min_token/max_token/doc_bloom existed
    val old = tmpDir()
    spark.read.parquet(Pipeline.chunksPath(cur))
      .drop("input_split", "token_cardinality", "min_token", "max_token", "doc_bloom")
      .write.option("compression", "zstd")
      .parquet(Pipeline.chunksPath(old))
    // read/decode path: defaults fill in, every row decodes
    val decoded = Pipeline.readTokens(spark, old).collect()
    assert(decoded.length == 200)
    // unknown token bounds must NEVER prune: a point lookup by value on
    // the old layout decodes rather than skipping
    val chunks = Pipeline.readChunks(spark, old).collect()
    assert(chunks.forall(c => c.min_token == Int.MinValue && c.max_token == Int.MaxValue))
    assert(chunks.forall(_.token_cardinality == -1))
    // absent doc_bloom = may-contain: a point lookup on the old layout
    // still finds its row (the bloom rung never prunes on null)
    assert(chunks.forall(_.doc_bloom == null))
    val someDoc = decoded.head
    val found = Pipeline.readTokensForDocId(spark, old, someDoc.doc_id).collect()
    assert(found.length == 1 && found.head.tokens.sameElements(someDoc.tokens))
    // resume over the old dir: adoption/lineage derivation doesn't crash
    // and records the unknown-split default
    val rpt = Pipeline.run(spark, ds, old, tokensPerChunk = 16 * 1024, waves = 1)
    assert(rpt.chunksSkipped > 0, "adopted old chunks must be resumable")
    assert(rpt.chunksEncoded == 0,
      "resume over an adopted old dir must re-encode nothing (duplicate append)")
  }

  test("compact: overlapping dirs merge deduplicated, independent of input order") {
    import spark.implicits._
    val ds = Fixtures.tokenTable(spark, 300, seed = 5, medianLen = 64, maxLen = 512, partitions = 2)
    val a = ds.filter(_.doc_id < "doc_000000000200")   // docs 0-199
    val b = ds.filter(_.doc_id >= "doc_000000000100")  // docs 100-299 (100 overlap)
    val dirA = tmpDir(); val dirB = tmpDir()
    Pipeline.run(spark, a, dirA, tokensPerChunk = 16 * 1024, waves = 1)
    Pipeline.run(spark, b, dirB, tokensPerChunk = 16 * 1024, waves = 1)

    val out = tmpDir()
    val rpt = Pipeline.compact(spark, Seq(dirA, dirB), out,
      tokensPerChunk = 16 * 1024, waves = 1, verify = true)
    assert(rpt.rowsDropped == 100, s"the 100 overlap duplicates must be SURFACED, got ${rpt.rowsDropped}")
    assert(rpt.rows == 300)
    val dec = Pipeline.readTokens(spark, out).collect()
    assert(dec.length == 300, s"dedup-union must have every doc once, got ${dec.length}")
    // guards: in-place compaction and targets holding a DIFFERENT input
    // set's table refuse loudly (run()'s resume semantics append — they
    // would silently duplicate)
    intercept[IllegalArgumentException](
      Pipeline.compact(spark, Seq(out), out, tokensPerChunk = 16 * 1024))
    intercept[IllegalArgumentException](
      Pipeline.compact(spark, Seq(dirA), out, tokensPerChunk = 16 * 1024))
    // resuming the SAME compaction is the designed wave-checkpoint path:
    // idempotent, nothing re-encoded, accounting unchanged
    val again = Pipeline.compact(spark, Seq(dirA, dirB), out, tokensPerChunk = 16 * 1024, waves = 1)
    assert(again.chunksEncoded == 0, "resume must skip every completed chunk")
    assert(again.rowsDropped == 100, s"metadata accounting must survive resume, got ${again.rowsDropped}")
    assert(Pipeline.readTokens(spark, out).count() == 300)
    val orig = ds.collect().map(r => r.doc_id -> r).toMap
    dec.foreach { r =>
      assert(r.tokens.sameElements(orig(r.doc_id).tokens), s"content mismatch at ${r.doc_id}")
    }
    // pure function of the input SET: reversed dir order yields the
    // identical chunk table (ids, checksums, bounds)
    val out2 = tmpDir()
    Pipeline.compact(spark, Seq(dirB, dirA), out2, tokensPerChunk = 16 * 1024, waves = 1)
    def sig(d: String) = Pipeline.readChunks(spark, d).collect()
      .map(c => (c.chunk_id, c.checksum, c.min_doc_id, c.max_doc_id)).sortBy(_._1).toSeq
    assert(sig(out) == sig(out2), "compaction must not depend on input dir order")
  }

  test("verify is exact under duplicate doc_ids") {
    import spark.implicits._
    // same doc_id twice with identical tokens: a naive doc_id join
    // would cross-multiply and report phantom rows
    val rows = Seq(
      TokenRow("dup", Array(1, 2, 3), 3, "web"),
      TokenRow("dup", Array(1, 2, 3), 3, "web"),
      TokenRow("solo", Array(9, 8), 2, "web"))
    val ds = spark.createDataset(rows)
    val v = Verifier.verify(ds, Encoder.encodeTable(ds, 1 << 20))
    assert(v.ok, s"duplicate doc_ids broke verify: $v")
    assert(v.sourceRows == 3 && v.decodedRows == 3)
    // and a real mismatch is still caught
    val bad = spark.createDataset(Seq(
      TokenRow("dup", Array(1, 2, 3), 3, "web"),
      TokenRow("dup", Array(7, 7, 7), 3, "web"),
      TokenRow("solo", Array(9, 8), 2, "web")))
    val v2 = Verifier.verify(bad, Encoder.encodeTable(ds, 1 << 20))
    assert(!v2.ok && v2.mismatchedRows > 0, s"mismatch not caught: $v2")
  }

  test("decoder detects corrupted payload via checksum") {
    val ds = Fixtures.tokenTable(spark, 50, seed = 6, medianLen = 64, maxLen = 256, partitions = 1)
    import spark.implicits._
    val chunks = Encoder.encodeTable(ds, tokensPerChunk = 1 << 24).collect()
    assert(chunks.nonEmpty)
    val c = chunks.head
    val corrupted = c.copy(checksum = c.checksum ^ 0xdeadbeefL)
    intercept[Decoder.ChecksumMismatch] {
      Decoder.decodeChunk(corrupted).foreach(_ => ())
    }
  }

  test("lineage carries codec choices and exact byte accounting") {
    import spark.implicits._
    val ds = Fixtures.tokenTable(spark, 500, seed = 7, medianLen = 128, maxLen = 1024, partitions = 2)
    val out = tmpDir()
    Pipeline.run(spark, ds, out, tokensPerChunk = 256 * 1024, waves = 1)
    val lin = Pipeline.readLineage(spark, out).get
    val rows = lin.collect()
    assert(rows.forall(_.getAs[String]("status") == "completed"))
    assert(rows.forall(_.getAs[Long]("encoded_bytes") > 0))
    // encoded_bytes in lineage equals the actual payload lengths
    val chunks = Pipeline.readChunks(spark, out).collect()
    val byId = chunks.map(c => c.chunk_id -> c).toMap
    rows.foreach { r =>
      val c = byId(r.getAs[Long]("chunk_id"))
      val actual = c.tokens_enc.length.toLong + c.lengths_enc.length +
        c.doc_ids_enc.length + c.sources_enc.length
      assert(r.getAs[Long]("encoded_bytes") == actual)
      assert(r.getAs[Long]("token_count") == c.n_tokens)
    }
  }
}
