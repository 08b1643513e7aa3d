package graft.text

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class BloomSpec extends AnyFunSuite {
  import graft.codec.PropCheck.forAll

  private def hexWindow(hex: String, from: Int): Long =
    hex.substring(from, from + 8).foldLeft(0L)((a, c) =>
      a * 16 + "0123456789abcdef".indexOf(c))

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
      .map(b => f"${b & 0xff}%02x").mkString

  test("positions == the oracle's nibble-reduce of md5 hex windows") {
    forAll(Gen.alphaNumStr) { s =>
      val (p1, p2) = Bloom.positions(s)
      val hex = md5hex(s)
      assert(p1 == (hexWindow(hex, 0) % Bloom.Bits).toInt)
      assert(p2 == (hexWindow(hex, 8) % Bloom.Bits).toInt)
      assert(p1 >= 0 && p1 < Bloom.Bits && p2 >= 0 && p2 < Bloom.Bits)
    }
  }

  test("no false negatives: every added element tests positive") {
    forAll(Gen.listOf(Gen.alphaNumStr)) { xs =>
      val w = new Array[Long](Bloom.WordCount)
      xs.foreach(Bloom.add(w, _))
      xs.foreach(x => assert(Bloom.contains(w, x), s"false negative: $x"))
    }
  }

  test("empty filter rejects everything") {
    val w = new Array[Long](Bloom.WordCount)
    assert(!Bloom.contains(w, "anything at all"))
  }

  test("merge is the bitwise union: hits(a|b) superset of hits(a)+hits(b)") {
    forAll(Gen.zip(Gen.listOf(Gen.alphaNumStr), Gen.listOf(Gen.alphaNumStr))) {
      case (as, bs) =>
        val wa = new Array[Long](Bloom.WordCount)
        val wb = new Array[Long](Bloom.WordCount)
        as.foreach(Bloom.add(wa, _))
        bs.foreach(Bloom.add(wb, _))
        val m = Bloom.merge(wa.clone(), wb)
        (as ++ bs).foreach(x => assert(Bloom.contains(m, x)))
    }
  }

  test("false-positive rate stays near the k=2 analytic bound") {
    val w = new Array[Long](Bloom.WordCount)
    val n = 2000
    (0 until n).foreach(i => Bloom.add(w, s"member-$i"))
    val probes = 20000
    val fps = (0 until probes).count(i => Bloom.contains(w, s"probe-$i"))
    // p(bit set) <= 2n/m = 0.061; fp = p^2 ~= 0.0037 -> expect ~75 of
    // 20k; allow generous slack (this is a sanity pin, not a CI die)
    assert(fps < probes * 0.02, s"fp rate ${fps.toDouble / probes}")
  }
}
