package graft.text

import org.scalatest.funsuite.AnyFunSuite

class AnalyzerSpec extends AnyFunSuite {

  test("bpe-ish token count: letters runs, digit runs, punct runs") {
    assert(Analyzer.bpeTokenCount("hello world") == 2)
    assert(Analyzer.bpeTokenCount("a1b2") == 4)
    assert(Analyzer.bpeTokenCount("don't stop!") == 5) // don ' t stop !
    assert(Analyzer.bpeTokenCount("") == 0)
    assert(Analyzer.bpeTokenCount("   ") == 0)
    assert(Analyzer.bpeTokenCount("x") == 1)
    assert(Analyzer.bpeTokenCount("2026-08-16") == 5)
  }

  test("winnow: deterministic, shift-invariant core, detects shared content") {
    val a = "the quick brown fox jumps over the lazy dog and keeps running far"
    assert(Analyzer.winnow(a).sameElements(Analyzer.winnow(a)))
    // near-duplicate (small prefix edit) shares most fingerprints
    val b = "The quick brown fox jumps over the lazy dog and keeps running far"
    val fa = Analyzer.winnow(a).toSet
    val fb = Analyzer.winnow(b).toSet
    val overlap = fa.intersect(fb).size.toDouble / math.max(fa.size, fb.size)
    assert(overlap > 0.6, s"near-dup overlap $overlap")
    // unrelated text shares (almost) none
    val c = "zzqx vwpm kjhg ewrt yuio asdf ghjk zxcv bnml qwer tyui opas dfgh"
    val fc = Analyzer.winnow(c).toSet
    assert(fa.intersect(fc).size <= 1)
    // edge cases
    assert(Analyzer.winnow("").isEmpty)
    assert(Analyzer.winnow("ab").length == 1)
  }

  test("english score separates english from noise") {
    val en = "the cat sat on the mat and then the other cat arrived at the door"
    val noise = "zzqx vwpm kjhg ewrt yuio asdf ghjk zxcv bnml qwer"
    assert(Analyzer.englishScore(en) > 0.3, Analyzer.englishScore(en).toString)
    assert(Analyzer.englishScore(noise) < 0.15, Analyzer.englishScore(noise).toString)
    assert(Analyzer.langId(en) == "en")
    assert(Analyzer.langId(noise) == "other")
    assert(Analyzer.englishScore("") == 0.0)
  }
}
