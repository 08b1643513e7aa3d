package graft

/** Bench report serialization — extracted pure so the one property that
  * has cost three rounds of results is unit-testable: the FINAL stdout
  * line must fit the driver's tail capture.
  *
  * Delivery geometry (measured from BENCH_r03.json): the driver keeps
  * the LAST 2,000 characters of stdout, and sbt prints a trailer line
  * ("[success] Total time: ...", ~80 chars) AFTER anything the bench
  * prints. Round 3's single ~3.9 KB JSON line therefore arrived
  * decapitated — head (`{"metric":...`) cut off — and `parsed` was null
  * for the third consecutive round despite a complete encode object.
  *
  * Contract now:
  *   1. the FULL report (all 51 per-query timings, every encode field)
  *      is printed as an EARLIER stdout line and written to a sidecar
  *      file (BENCH_FULL.json in the working directory);
  *   2. the LAST line is a compact headline guaranteed (< [[MaxLen]],
  *      enforced by a degradation ladder, pinned by BenchEmitSpec) to
  *      survive the tail capture with the sbt trailer behind it:
  *      MaxLen 1500 + trailer ~80 << 2000.
  */
object BenchEmit {

  /** Hard cap for the final stdout line. 1750 + sbt's ~80-char trailer
    * leaves 170 chars of slack inside the driver's 2,000-char tail
    * (observed trailers: the one "[success] Total time: ..." line,
    * ~75 chars — round-4 captures confirm nothing else follows the
    * emit). Raised from 1500 when the query map hit 77 entries: at
    * ~12 chars/entry the 2-decimal map alone is ~930 chars, and the
    * old cap would have pushed the ladder onto the rung that drops
    * per-query timings from the official channel.
    */
  final val MaxLen = 1750

  /** Locale-pinned numeric formatting. The f-interpolator formats with
    * the JVM default locale; a comma-decimal locale (de, fr, ...) would
    * turn every fraction into `60,300` — malformed JSON, i.e. the exact
    * lost-official-result failure this object exists to prevent.
    */
  def num(v: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, "%." + decimals + "f", Double.box(v))

  def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def qmap(entries: Seq[(String, String)]): String =
    entries.map { case (k, v) => s"${jstr(k)}:$v" }.mkString("{", ",", "}")

  /** The complete report — arbitrary length, printed as an early line
    * and persisted to the sidecar. Format identical to rounds 1-3.
    */
  def fullLine(
      results: Seq[(String, Double)],
      errors: Seq[(String, String)],
      sfDir: String,
      degraded: Boolean,
      wallSecs: Double,
      fatal: Option[String],
      encFields: Seq[(String, String)]
  ): String = {
    val qs = qmap(results.map { case (k, v) => k -> num(v, 3) })
    val errs = qmap(errors.map { case (k, v) => k -> jstr(v.take(300)) })
    val total = results.map(_._2).filter(_ >= 0).sum
    val enc = qmap(encFields)
    val fatalJson = fatal.map(jstr).getOrElse("null")
    s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","queries":$qs,""" +
      s""""errors":$errs,"sf":${jstr(sfDir)},"degraded":$degraded,""" +
      s""""wall_secs":${num(wallSecs, 1)},"fatal":$fatalJson,"encode":$enc}"""
  }

  /** Encode fields worth carrying in the headline, in emit order. The
    * long tail (warmup secs, chunk counts, canary brackets, restart
    * notes) lives only in the full report.
    */
  private val EncodeHeadlineKeys = Seq(
    "status", "tokens", "bytes_per_token", "size_vs_stock",
    "secs_low", "secs_high", "tokens_per_sec_low", "tokens_per_sec_high",
    "scaling_efficiency", "efficiency_estimator",
    "scaling_efficiency_paired", "scaling_efficiency_minima",
    "estimates_diverge", "clean_passes", "measured_pairs",
    "pairs_rejected_below_best", "minima_implausible", "fatal_child",
    "decode_secs", "decode_tokens_per_sec")

  /** Short query key: "q50_decontaminate" → "q50". The qNN prefixes are
    * unique by construction; if a collision ever appears the colliding
    * names are kept in full (correctness over brevity).
    */
  private def shortKeys(names: Seq[String]): Map[String, String] = {
    val short = names.map(n => n -> n.takeWhile(_ != '_')).toMap
    val collided = short.groupBy(_._2).collect { case (_, g) if g.size > 1 => g.keys }.flatten.toSet
    names.map(n => n -> (if (collided(n)) n else short(n))).toMap
  }

  /** The final stdout line: headline totals + short-keyed query secs +
    * encode summary. Guaranteed < [[MaxLen]] via a degradation ladder —
    * if the full compact form is somehow too long (e.g. dozens of
    * errors), errors collapse to a count, then queries do. The last
    * rung is a fixed-size line that always fits.
    */
  def compactLine(
      results: Seq[(String, Double)],
      errors: Seq[(String, String)],
      sfDir: String,
      degraded: Boolean,
      wallSecs: Double,
      fatal: Option[String],
      encFields: Seq[(String, String)]
  ): String = {
    val total = results.map(_._2).filter(_ >= 0).sum
    val keyOf = shortKeys(results.map(_._1))
    def qs(decimals: Int) =
      qmap(results.map { case (k, v) => keyOf(k) -> num(v, decimals) })
    val encSeq = {
      val m = encFields.toMap
      EncodeHeadlineKeys.flatMap(k => m.get(k).map(k -> _))
    }
    val enc = qmap(encSeq)
    val fatalJson = fatal.map(f => jstr(f.take(120))).getOrElse("null")
    def head(extra: String) =
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","sf":${jstr(sfDir)},""" +
        s""""degraded":$degraded,"wall_secs":${num(wallSecs, 1)},"fatal":$fatalJson,""" +
        s""""full_report":"BENCH_FULL.json",$extra"encode":$enc}"""
    val errShort = qmap(errors.take(3).map { case (k, v) =>
      keyOf.getOrElse(k, k) -> jstr(v.take(40))
    } ++ (if (errors.size > 3) Seq("_more" -> errors.size.toString) else Nil))
    // precision degrades before coverage: the per-query map survives at
    // 1 decimal (the full 3-decimal timings are in the sidecar) before
    // the last-resort rung that drops it entirely
    val ladder = Seq(
      head(s""""queries":${qs(2)},"errors":$errShort,"""),
      head(s""""queries":${qs(2)},"error_count":${errors.size},"""),
      head(s""""queries":${qs(1)},"error_count":${errors.size},"""),
      head(s""""query_count":${results.size},"error_count":${errors.size},"""))
    ladder.find(_.length < MaxLen).getOrElse(
      // unreachable unless encode fields themselves explode; keep the
      // invariant anyway by dropping them too
      s"""{"metric":"total","value":${num(total, 3)},"unit":"sec","sf":${jstr(sfDir)},""" +
        s""""degraded":$degraded,"wall_secs":${num(wallSecs, 1)},"fatal":null,""" +
        s""""full_report":"BENCH_FULL.json","query_count":${results.size}}""")
  }
}
