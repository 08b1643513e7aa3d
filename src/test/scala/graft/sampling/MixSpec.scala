package graft.sampling

import org.scalatest.funsuite.AnyFunSuite

class MixSpec extends AnyFunSuite {

  private def md5hex8(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    d.take(4).map(b => f"${b & 0xff}%02x").mkString
  }

  private val ids = (0 until 20000).map(_.toString)

  test("thresholdHex: exact at power-of-two fractions, clamped at ends") {
    assert(Mix.thresholdHex(0.25) == "40000000")
    assert(Mix.thresholdHex(0.5) == "80000000")
    assert(Mix.thresholdHex(0.75) == "c0000000")
    assert(Mix.thresholdHex(1.0) == "g")   // > every hex string
    assert(Mix.thresholdHex(0.0) == "00000000") // < or = every hex string
    assert(Mix.thresholdHex(1.5) == "g")
    assert(Mix.thresholdHex(-0.1) == "00000000")
    // f just under 1.0 rounds to 2^32: must clamp to accept-all, never
    // format as a 9-char string (which would reject most of key space)
    assert(Mix.thresholdHex(1.0 - 1e-12) == "g")
    assert(Mix.thresholdHex(math.nextDown(1.0)) == "g")
  }

  test("realized fraction tracks the target within 2% absolute") {
    for (f <- Seq(0.1, 0.25, 0.5, 0.9)) {
      val thr = Mix.thresholdHex(f)
      val kept = ids.count(id => md5hex8(id) < thr)
      val realized = kept.toDouble / ids.size
      assert(math.abs(realized - f) < 0.02, s"f=$f realized=$realized")
    }
  }

  test("monotone: raising the fraction only adds documents") {
    val small = ids.filter(id => md5hex8(id) < Mix.thresholdHex(0.2)).toSet
    val large = ids.filter(id => md5hex8(id) < Mix.thresholdHex(0.6)).toSet
    assert(small.subsetOf(large))
  }

  test("split boundaries partition the key space disjointly and exhaustively") {
    val bounds = Seq(0.875, 0.9375)
    val thrs = bounds.map(Mix.thresholdHex)
    def assign(id: String): String = {
      val k = md5hex8(id)
      if (k < thrs(0)) "train" else if (k < thrs(1)) "val" else "test"
    }
    val byLabel = ids.groupBy(assign)
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel.values.map(_.size).sum == ids.size)
    val tr = byLabel("train").size.toDouble / ids.size
    assert(math.abs(tr - 0.875) < 0.02, s"train=$tr")
    // stability: assignment depends only on the id
    assert(ids.map(assign) == ids.map(assign))
  }
}
