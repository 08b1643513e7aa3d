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

  // -------------------------------------------------- word shingling
  //
  // Typed-map kernels for the shingle/minhash query family. These were
  // first written as SQL higher-order functions (`transform(sequence(
  // 1, size(words)-k+1), i -> concat_ws(' ', element_at(words,i), ...))`)
  // — measured 33x slower: HOFs evaluate interpreted (no codegen), and
  // CollapseProject inlines the `words` = split(text) column into the
  // lambda body, so the split re-executes once PER ELEMENT PER
  // REFERENCE (O(k * words^2) splits per doc). One pass per doc here;
  // md5 via MessageDigest is bit-identical to Spark's and DuckDB's md5,
  // so oracle-visible values are unchanged.

  /** Word split matching Spark `split(text, ' ')` and DuckDB
    * `string_split(text, ' ')` EXACTLY: limit -1 keeps trailing empty
    * tokens (both engines do); consecutive spaces yield empty words.
    * The oracle SQL depends on this equivalence.
    */
  def words(text: String): Array[String] =
    if (text == null) Array.empty else text.split(" ", -1)

  /** Distinct k-word shingle strings ("w1 w2 ... wk"); empty for docs
    * with fewer than k words (the oracle's end-exclusive range is empty
    * there). Set semantics — element order is not meaningful.
    */
  def wordShingles(text: String, k: Int): Array[String] = {
    val w = words(text)
    if (w.length < k) return Array.empty
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i + k <= w.length) {
      sb.setLength(0)
      var j = i
      while (j < i + k) { if (j > i) sb.append(' '); sb.append(w(j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** Distinct 64-bit shingle fingerprints — the internal-only hash for
    * joins whose OUTPUT is a count, never the hash itself (q50): the
    * polynomial-rolling + splitmix finalize of [[winnow]]'s gram hash
    * over the shingle's chars (spaces included), 8 B/shingle regardless
    * of text length. Callers' oracles compare against exact raw-string
    * shingles, so an oracle pass doubles as a collision check.
    */
  def wordShingleHash64(text: String, k: Int): Array[Long] = {
    val w = words(text)
    if (w.length < k) return Array.empty
    val seen = new java.util.HashSet[Long]()
    var i = 0
    while (i + k <= w.length) {
      var h = 1125899906842597L
      var j = i
      while (j < i + k) {
        if (j > i) h = h * 31 + ' '
        val s = w(j); var c = 0
        while (c < s.length) { h = h * 31 + s.charAt(c); c += 1 }
        j += 1
      }
      seen.add(mix64(h))
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator(); var n = 0
    while (it.hasNext) { out(n) = it.next(); n += 1 }
    out
  }

  /** MinHash band minima over k-word shingles: ONE md5 per shingle,
    * sliced into `bands` disjoint 32-bit windows (the k-bands-from-one-
    * hash construction; bands <= 4 with md5's 16 bytes). Bit-identical
    * to the SQL `array_min(transform(dg, d -> substring(d, 1+8b, 8)))`
    * over `dg = transform(shingles, md5)`: a hex window's lexicographic
    * order equals the unsigned order of its 4 raw bytes, so minima are
    * tracked on the raw windows and hex-encoded once at the end.
    * All-null for docs with < k words (array_min of empty = NULL in
    * Spark and DuckDB alike).
    */
  def minhashBands(text: String, k: Int, bands: Int = 4): Array[String] = {
    require(bands >= 1 && bands <= 4, s"md5 has 16 bytes = at most 4 windows, got $bands")
    val w = words(text)
    if (w.length < k) return new Array[String](bands)
    val md = java.security.MessageDigest.getInstance("MD5")
    val wb = new Array[Array[Byte]](w.length)
    var x = 0
    while (x < w.length) {
      wb(x) = w(x).getBytes(java.nio.charset.StandardCharsets.UTF_8); x += 1
    }
    val mins = Array.fill(bands)(-1L) // unsigned 32-bit window; -1 = unset
    val space = ' '.toByte
    var i = 0
    while (i + k <= w.length) {
      md.reset()
      var j = i
      while (j < i + k) { if (j > i) md.update(space); md.update(wb(j)); j += 1 }
      val d = md.digest()
      var b = 0
      while (b < bands) {
        val o = b * 4
        val v = ((d(o) & 0xffL) << 24) | ((d(o + 1) & 0xffL) << 16) |
          ((d(o + 2) & 0xffL) << 8) | (d(o + 3) & 0xffL)
        if (mins(b) == -1L || v < mins(b)) mins(b) = v
        b += 1
      }
      i += 1
    }
    mins.map(v => f"$v%08x")
  }

  /** 16-bit SimHash (Charikar 2002) over per-WORD md5s — every word
    * occurrence votes +1/-1 per bit (not distinct words), h = the md5's
    * first 16 bits, exactly `conv(substring(md5(w), 1, 4), 16, 10)`.
    * Map-only replacement for the explode + groupBy(doc_id) formulation,
    * which shuffled one row per corpus WORD.
    */
  def simhash16(text: String): Long = {
    val w = words(text)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sums = new Array[Int](16)
    var i = 0
    while (i < w.length) {
      md.reset()
      val d = md.digest(w(i).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = ((d(0) & 0xff) << 8) | (d(1) & 0xff)
      var b = 0
      while (b < 16) {
        if (((h >> b) & 1) == 1) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 16) { if (sums(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  // --------------------------------------------- repetition quality

  /** Per-document repetition counts for Gopher-style quality rules
    * (Rae et al. 2021, "Scaling Language Models: ... Gopher", §A1.1:
    * filter docs whose most frequent 2-gram exceeds a fraction of all
    * 2-grams, or with a high duplicate-word fraction). Counts only —
    * integer-exact, thresholds applied by the caller so the rule stays
    * oracle-checkable without float compares.
    */
  final case class RepetitionStats(
      nWords: Long, nDistinctWords: Long, n2grams: Long, max2gramCount: Long)

  def repetitionStats(text: String): RepetitionStats = {
    val w = words(text)
    val distinct = new java.util.HashSet[String]()
    var i = 0
    while (i < w.length) { distinct.add(w(i)); i += 1 }
    if (w.length < 2)
      return RepetitionStats(w.length.toLong, distinct.size.toLong, 0L, 0L)
    val counts = new java.util.HashMap[String, Int]()
    var max = 0
    i = 0
    while (i + 2 <= w.length) {
      val g = w(i) + " " + w(i + 1)
      val c = counts.merge(g, 1, Integer.sum)
      if (c > max) max = c
      i += 1
    }
    RepetitionStats(w.length.toLong, distinct.size.toLong,
      (w.length - 1).toLong, max.toLong)
  }

  /** splitmix64 finalizer (public-domain constant schedule) — shared by
    * [[winnow]]'s gram hash and [[wordShingleHash64]].
    */
  private def mix64(h: Long): Long = {
    var x = h + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
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
    mix64(h)
  }

  // ----------------------------------------------------- n-gram langid

  /** Most-frequent English character bigrams (public knowledge —
    * Norvig's Google-corpus counts). Score = fraction of a text's
    * bigrams found in this set; English text scores ~0.35+, uniform
    * noise ~0.06. Exposed as an ordered list so q36's DuckDB oracle
    * can be built from the SAME table the kernel scores against.
    */
  val EnglishBigramList: Seq[String] = Seq(
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
    "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
    "ve", "co", "me", "de", "hi", "ri", "ro", "ic", "ne", "ea",
    "ra", "ce", " t", " a", " s", " o", " w", "e ", "s ", "t ")
  private val EnglishBigrams: Set[String] = EnglishBigramList.toSet

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
