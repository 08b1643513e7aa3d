package graft.text

/** Pure text-analysis kernels for training-data pipelines: BPE-style
  * pre-tokenization counting, winnowing document fingerprints (rolling
  * hash), and an n-gram language-ID heuristic. All integer/regex-only
  * and deterministic; used from typed Dataset maps (SURVEY.md §4.3 —
  * whole-value kernels, no per-row Catalyst overhead beyond the map).
  */
object Analyzer {

  /** GPT-2-style pre-tokenizer shape, restricted to constructs that
    * behave identically in java.util.regex and DuckDB's RE2 (no
    * lookarounds): runs of letters, single digits... kept simple so the
    * same pattern string is the DuckDB oracle.
    */
  final val BpeIshPattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]+"

  private val bpeRe = java.util.regex.Pattern.compile(BpeIshPattern)

  /** Number of BPE-ish pre-tokens in the text. */
  def bpeTokenCount(text: String): Int = {
    val m = bpeRe.matcher(text)
    var n = 0
    while (m.find()) n += 1
    n
  }

  // ------------------------------------------------------- winnowing

  /** Polynomial rolling hash (Rabin-Karp style) over code units with
    * winnowing (Schleimer/Wilkerson/Aiken, SIGMOD 2003): k-gram hashes,
    * then the minimum in each sliding window of w hashes; the selected
    * minima form the document fingerprint. Deterministic, integer-only.
    */
  def winnow(text: String, k: Int = 8, w: Int = 16): Array[Long] = {
    val n = text.length
    if (n < k) return if (n == 0) Array.empty else Array(hashGram(text, 0, n))
    val grams = new Array[Long](n - k + 1)
    var i = 0
    while (i < grams.length) { grams(i) = hashGram(text, i, k); i += 1 }
    if (grams.length <= w) return Array(grams.min)
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var lastPicked = -1
    i = 0
    while (i + w <= grams.length) {
      // rightmost minimal hash in window [i, i+w)
      var mi = i
      var j = i + 1
      while (j < i + w) { if (grams(j) <= grams(mi)) mi = j; j += 1 }
      if (mi != lastPicked) { out += grams(mi); lastPicked = mi }
      i += 1
    }
    out.toArray
  }

  private def hashGram(s: String, from: Int, len: Int): Long = {
    var h = 1125899906842597L
    var i = from
    while (i < from + len) { h = h * 31 + s.charAt(i); i += 1 }
    // finalize (splitmix-style) so near-equal grams spread
    var x = h + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  // ----------------------------------------------------- n-gram langid

  /** Most-frequent English character bigrams (public knowledge —
    * Norvig's Google-corpus counts). Score = fraction of a text's
    * bigrams found in this set; English text scores ~0.35+, uniform
    * noise ~0.06.
    */
  private val EnglishBigrams: Set[String] = Set(
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
    "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
    "ve", "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea",
    "ra", "ce", " t", " a", " s", " o", " w", "e ", "s ", "t ")

  /** English-ness score in [0,1]: hit-rate of the text's bigrams
    * against the top-English-bigram table.
    */
  def englishScore(text: String): Double = {
    val t = text.toLowerCase
    if (t.length < 2) return 0.0
    var hits = 0
    var i = 0
    while (i < t.length - 1) {
      if (EnglishBigrams.contains(t.substring(i, i + 2))) hits += 1
      i += 1
    }
    hits.toDouble / (t.length - 1)
  }

  /** n-gram language-ID heuristic: "en" above threshold, else "other". */
  def langId(text: String, threshold: Double = 0.22): String =
    if (englishScore(text) >= threshold) "en" else "other"
}
