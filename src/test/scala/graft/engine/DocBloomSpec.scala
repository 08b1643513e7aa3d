package graft.engine

import org.scalatest.funsuite.AnyFunSuite

class DocBloomSpec extends AnyFunSuite {

  test("no false negatives: every inserted key is reported present") {
    val keys = (0 until 5000).map(i => f"doc-$i%06d-${i * 7919}%x")
    val bloom = DocBloom.build(keys)
    keys.foreach(k => assert(DocBloom.mayContain(bloom, k), s"false negative for $k"))
  }

  test("false positive rate is small at the design point") {
    val keys = (0 until 8000).map(i => s"web/crawl-$i/page-${i * 31}")
    val bloom = DocBloom.build(keys)
    val probes = (0 until 20000).map(i => s"absent-$i-${i * 131}")
    val fp = probes.count(DocBloom.mayContain(bloom, _))
    info(s"FPR: $fp/20000 = ${fp / 20000.0}")
    // design point ~0.8% at 10 bits/key, k=7; allow generous slack
    assert(fp < 20000 * 0.03, s"FPR too high: $fp/20000")
  }

  test("null / short / malformed filters mean may-contain (never prune)") {
    assert(DocBloom.mayContain(null, "x"))
    assert(DocBloom.mayContain(Array.empty[Byte], "x"))
    assert(DocBloom.mayContain(Array[Byte](7), "x"))
    // non-power-of-two bitset length → malformed → never prune
    assert(DocBloom.mayContain(Array[Byte](7, 0, 0, 0), "x"))
  }

  test("empty key set builds a filter that rejects probes") {
    val bloom = DocBloom.build(Nil)
    assert(!DocBloom.mayContain(bloom, "anything"))
  }

  test("filter size tracks key count and stays bounded") {
    val small = DocBloom.build((0 until 10).map(_.toString))
    val mid = DocBloom.build((0 until 8000).map(_.toString))
    assert(small.length <= 1 + 64 / 8 * 4) // a few words
    // 8000 keys * 10 bits → next pow2 = 131072 bits = 16 KiB + header
    assert(mid.length == 1 + (1 << 17) / 8)
  }
}
