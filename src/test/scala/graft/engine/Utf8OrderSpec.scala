package graft.engine

import org.scalatest.funsuite.AnyFunSuite

/** [[Utf8Order]] must agree exactly with Spark's string comparator
  * (UTF-8 unsigned byte order): every doc_id bound the engine computes
  * driver/kernel-side is later compared by Spark column predicates.
  */
class Utf8OrderSpec extends AnyFunSuite {

  private def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes("UTF-8")
    val y = b.getBytes("UTF-8")
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xFF) - (y(i) & 0xFF)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  test("matches UTF-8 byte order on the divergent planes") {
    val supp = new String(Character.toChars(0x10000)) // 4-byte UTF-8, surrogate pair in UTF-16
    val e000 = "\uE000" // 3-byte UTF-8, private-use BMP
    // Java String order disagrees here: surrogate 0xD800 < 0xE000
    assert(supp.compareTo(e000) < 0)
    assert(Utf8Order.compare(supp, e000) > 0)
    assert(utf8Compare(supp, e000) > 0)
  }

  test("sign agrees with UTF-8 byte comparison on random strings") {
    val rnd = new scala.util.Random(4242)
    // alphabet spanning every UTF-8 length class and the surrogate edge
    val alphabet: Array[String] = Array(
      "a", "z", "0", "~",
      "\u00e9", "\u07ff", // 2-byte
      "\u0800", "\ud7ff", // 3-byte below the surrogate range
      "\ue000", "\ue001", "\ufffd", "\uffff", // 3-byte above it
      new String(Character.toChars(0x10000)),
      new String(Character.toChars(0x1F600)),
      new String(Character.toChars(0x10FFFF)))
    def randStr(): String =
      (0 until rnd.nextInt(6)).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    for (_ <- 0 until 20000) {
      val a = randStr(); val b = randStr()
      assert(Integer.signum(Utf8Order.compare(a, b)) == Integer.signum(utf8Compare(a, b)),
        s"mismatch on ${a.map(_.toInt.toHexString)} vs ${b.map(_.toInt.toHexString)}")
    }
  }

  test("total order properties: consistent with equals, antisymmetric") {
    val xs = Seq("", "a", "ab", "\ue000", new String(Character.toChars(0x10000)))
    for (a <- xs; b <- xs) {
      assert((Utf8Order.compare(a, b) == 0) == (a == b))
      assert(Integer.signum(Utf8Order.compare(a, b)) == -Integer.signum(Utf8Order.compare(b, a)))
    }
  }
}
