package graft

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Pins the property that cost rounds 1-3 their official bench result:
  * the final stdout line must fit the driver's 2,000-char tail capture
  * (with sbt's ~80-char "[success] ..." trailer printed after it).
  * The fixture below reproduces round 3's real payload shape — 51
  * queries with full names, the complete 28-field encode object — which
  * produced a ~3.9 KB single line and parsed:null three rounds running.
  */
class BenchEmitSpec extends AnyFunSuite {

  // round-3-shaped fixture: 51 queries, real name lengths
  private val queryNames = Seq(
    "q01_scan_filter_project", "q02_agg_groupby", "q03_distinct_sorted",
    "q04_sort_topk", "q05_union_distinct", "q06_join_agg",
    "q07_filter_regex", "q08_filter_in_not", "q09_tokenize_counts",
    "q10_roundtrip_encode_decode", "q11_dedup_exact", "q12_dedup_stats",
    "q13_window_rank", "q14_quality_score", "q15_langid",
    "q16_token_count_ws", "q17_fingerprint", "q18_minhash",
    "q19_lsh_buckets", "q20_ngram_jaccard", "q21_embed_stats",
    "q22_media_meta", "q23_decode_pruned", "q24_intersect_except",
    "q25_token_count_bpe", "q26_decode_point_lookup", "q27_decode_meta_only",
    "q28_distinct_from_metadata", "q30_ann_cosine_topk", "q31_simhash",
    "q32_encode_lineage", "q33_media_features", "q34_ann_lsh",
    "q35_winnow_fingerprint", "q36_langid_ngram", "q37_embed_neardup",
    "q38_shingle_neardup_pairs", "q39_admission_report", "q40_ann_dot_topk",
    "q41_embed_neardup_exact", "q42_ann_ivf", "q43_media_frame_sample",
    "q44_event_time_windows", "q45_token_search", "q46_pack_plan",
    "q47_pack_examples", "q48_source_mix_sample", "q49_split_assign",
    "q50_decontaminate", "q51_embed_roundtrip", "q52_compact_merge")
  private val results = queryNames.zipWithIndex.map { case (n, i) => n -> (0.25 + i * 0.22) }

  private def js(s: String) = BenchEmit.jstr(s)
  // the full r03 encode object, every field
  private val encFields = Seq(
    "status" -> js("complete"), "rows" -> "2400000", "cpus_low" -> "2",
    "cpus_high" -> "8", "tokens" -> "2027368928",
    "stock_parquet_zstd_bytes" -> "2709702509", "effective_cores_best" -> "12.3",
    "warmup_secs_low" -> "468.5", "warmup_secs_high" -> "279.1",
    "chunks" -> "707", "encoded_bytes" -> "4097551170",
    "pre_zstd_bytes_per_token" -> "2.0211", "bytes_per_token" -> "1.0000",
    "our_disk_bytes" -> "2027295642", "size_vs_stock" -> "0.7482",
    "secs_low" -> "78.26", "tokens_per_sec_low" -> "25906285",
    "secs_high" -> "22.90", "tokens_per_sec_high" -> "88533713",
    "measured_pairs" -> "9", "pass_attempts" -> "9",
    "ambient_canary_secs" -> "0.64", "scaling_efficiency_minima" -> "0.854",
    "clean_passes" -> "1", "scaling_efficiency" -> "0.831",
    "efficiency_estimator" -> js("paired"), "scaling_efficiency_paired" -> "0.831",
    "estimates_diverge" -> "false", "pairs_rejected_below_best" -> "true",
    "decode_cpus" -> "8", "decode_secs" -> "3.46",
    "decode_tokens_per_sec" -> "585217483")

  private val sfDir = "/root/testdata/sf0.1"

  test("compact headline with the full round-3 payload fits the tail capture") {
    val line = BenchEmit.compactLine(results, Nil, sfDir, degraded = false,
      wallSecs = 2117.9, fatal = None, encFields)
    assert(line.length < BenchEmit.MaxLen, s"${line.length} chars:\n$line")
    // with the ~80-char sbt trailer appended, still inside 2,000
    assert(line.length + 100 < 2000)
    val j = JsonMethods.parse(line)
    assert((j \ "metric") == JString("total"))
    assert((j \ "unit") == JString("sec"))
    assert((j \ "degraded") == JBool(false))
    val JObject(qs) = (j \ "queries"): @unchecked
    assert(qs.size == 51)
    assert(qs.exists(_._1 == "q50"))
    assert((j \ "encode" \ "scaling_efficiency") == JDouble(0.831))
    assert((j \ "encode" \ "size_vs_stock") == JDouble(0.7482))
    assert((j \ "encode" \ "decode_tokens_per_sec") == JInt(585217483))
    assert((j \ "encode" \ "efficiency_estimator") == JString("paired"))
  }

  test("round-5-width query map (82 entries) keeps per-query secs in the headline") {
    // the round-5 registry width: 82 queries (q01-q83 minus the q29
    // numbering hole) with realistic name lengths — the headline must
    // keep the per-query map (possibly at reduced precision), never
    // fall to the count-only rung
    val wide = results ++ (53 to 83).map(i => f"q$i%02d_some_operator_name" -> (0.3 + i * 0.11))
    val line = BenchEmit.compactLine(wide, Nil, sfDir, degraded = false,
      wallSecs = 1500.0, fatal = None, encFields)
    assert(line.length < BenchEmit.MaxLen, s"${line.length} chars:\n$line")
    assert(line.length + 100 < 2000)
    val j = JsonMethods.parse(line)
    val JObject(qs) = (j \ "queries"): @unchecked
    assert(qs.size == wide.size, s"per-query map dropped from the headline:\n$line")
    assert((j \ "encode" \ "scaling_efficiency") == JDouble(0.831))
  }

  test("compact headline survives a pathological error burst") {
    val errors = queryNames.take(30).map(n =>
      n -> ("org.apache.spark.SparkException: Job aborted due to stage failure: " * 5))
    val line = BenchEmit.compactLine(results, errors, sfDir, degraded = true,
      wallSecs = 100.0, fatal = Some("x" * 500), encFields)
    assert(line.length < BenchEmit.MaxLen, s"${line.length} chars")
    val j = JsonMethods.parse(line)
    assert((j \ "degraded") == JBool(true))
    // ladder may have collapsed errors to a count, but never the encode
    assert((j \ "encode" \ "scaling_efficiency") == JDouble(0.831))
  }

  test("full line carries every query by full name and every encode field") {
    val line = BenchEmit.fullLine(results, Seq("q07_filter_regex" -> "boom"),
      sfDir, degraded = true, wallSecs = 2117.9, fatal = None, encFields)
    val j = JsonMethods.parse(line)
    val JObject(qs) = (j \ "queries"): @unchecked
    assert(qs.size == 51 && qs.exists(_._1 == "q50_decontaminate"))
    assert((j \ "encode" \ "warmup_secs_low") == JDouble(468.5))
    assert((j \ "errors" \ "q07_filter_regex") == JString("boom"))
  }

  test("negative (failed) query secs are excluded from the total") {
    val line = BenchEmit.compactLine(
      Seq("q01_a" -> 1.5, "q02_b" -> -1.0, "q03_c" -> 2.5), Nil, sfDir,
      degraded = false, wallSecs = 5.0, fatal = None, Seq("status" -> js("partial")))
    val j = JsonMethods.parse(line)
    assert((j \ "value") == JDouble(4.0))
  }

  test("emits valid JSON under a comma-decimal default locale") {
    // the f-interpolator formats with the JVM default locale; a German
    // locale would print 60,300 and corrupt both lines — exactly the
    // lost-result failure this serializer exists to prevent
    val saved = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.GERMANY)
    try {
      assert(BenchEmit.num(60.3, 3) == "60.300")
      val compact = BenchEmit.compactLine(results, Nil, sfDir,
        degraded = false, wallSecs = 1325.4, fatal = None, encFields)
      val full = BenchEmit.fullLine(results, Nil, sfDir,
        degraded = false, wallSecs = 1325.4, fatal = None, encFields)
      assert((JsonMethods.parse(compact) \ "wall_secs") == JDouble(1325.4))
      assert((JsonMethods.parse(full) \ "wall_secs") == JDouble(1325.4))
    } finally java.util.Locale.setDefault(saved)
  }
}
