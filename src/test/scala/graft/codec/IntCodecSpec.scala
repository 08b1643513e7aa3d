package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Round-trip tables per FIXTURES.md §1; mirrors the reference's
  * enumerated-case style (reference: search/rowrange_test.go:21-288)
  * and its keystone encode/decode suite (schema/encoder_test.go:31-97).
  */
class IntCodecSpec extends AnyFunSuite {

  import PropCheck.forAll

  val cases: Seq[(String, Array[Int])] = Seq(
    "empty" -> Array.emptyIntArray,
    "singleton" -> Array(42),
    "singleton-negative" -> Array(-42),
    "int-extremes" -> Array(Int.MinValue, Int.MaxValue, 0, -1, 1),
    "all-identical" -> Array.fill(5000)(7),
    "long-runs" -> (Array.fill(2500)(7) ++ Array.fill(2500)(-3)),
    "alternating" -> Array.tabulate(1000)(i => i % 2),
    "run-length-1" -> Array.tabulate(1000)(i => i * 17 % 9973),
    "sorted-ascending" -> Array.tabulate(10000)(i => i * 3),
    "arithmetic" -> Array.tabulate(1000)(i => 1000000 + i * 12345),
    "strictly-decreasing" -> Array.tabulate(1000)(i => 100000 - i * 7),
    "small-range-unsorted" -> Array.tabulate(1000)(i => 500 + (i * 7919) % 16),
    "negative-deltas" -> Array(100, 50, 75, 25, 90, -10, -5),
    "dict-16-distinct" -> Array.tabulate(4096)(i => (i * 2654435761L % 16).toInt * 1000),
    "dict-256-distinct" -> Array.tabulate(4096)(i => (i * 2654435761L % 256).toInt - 128),
    "vocab-50k" -> Array.tabulate(8192)(i => (i * 2654435761L % 50257).toInt),
    "full-width" -> Array.tabulate(100)(i => (i * 0x9e3779b9).toInt),
    "max-range" -> Array(Int.MinValue, Int.MaxValue),
    "zipfish" -> Array.tabulate(4096)(i => {
      val r = (i * 48271L % 0x7fffffff).toDouble / 0x7fffffff
      (1.0 / (0.001 + r * r) % 50257).toInt
    })
  )

  for (codec <- IntCodec.all; (name, data) <- cases) {
    test(s"${codec.name} round-trips $name") {
      val enc = codec.encode(data)
      assert(enc(0) == codec.id)
      val dec = IntCodec.decode(enc)
      assert(dec.sameElements(data), s"${codec.name} failed on $name")
    }
  }

  for ((name, data) <- cases) {
    test(s"auto-selector round-trips $name and never beats-losses plain badly") {
      val (c, enc) = Selector.encodeAuto(data)
      assert(IntCodec.decode(enc).sameElements(data), s"auto($c) failed on $name")
      // never more than plain + small slack
      assert(enc.length <= 4 * data.length + 16,
        s"auto chose ${c.name} at ${enc.length}B vs plain ${4 * data.length}B")
    }
  }

  test("bit widths: values < 2^k pack at width k") {
    for (k <- Seq(1, 4, 8, 12, 17, 31)) {
      val max = if (k == 31) Int.MaxValue else (1 << k) - 1
      val data = Array.tabulate(1024)(i => (i.toLong * 2654435761L % (max.toLong + 1)).toInt)
      val enc = IntCodec.For.encode(data)
      val dec = IntCodec.decode(enc)
      assert(dec.sameElements(data))
      // payload ~ n*width/8 (+ header slack)
      val mn = data.min
      val width = BitIO.bitsLong(data.max.toLong - mn.toLong)
      assert(enc.length <= BitIO.packedBytes(1024, width) + 16)
    }
  }

  test("selector picks RLE for long runs; constant arrays encode tiny") {
    // multi-value runs: RLE must beat FoR/bitpack (which pay width*n)
    val runs = Array.fill(50000)(9) ++ Array.fill(50000)(-3) ++ Array.fill(50000)(12)
    assert(Selector.choose(runs, 0, runs.length) == IntCodec.Rle)
    // all-constant: FoR at width 0 ties RLE; either way ~header-sized
    val const = Array.fill(100000)(9)
    val (_, enc) = Selector.encodeAuto(const)
    assert(enc.length < 32)
  }

  test("selector picks delta-family for sorted sequences") {
    val data = Array.tabulate(100000)(i => i * 3 + 7)
    val c = Selector.choose(data, 0, data.length)
    assert(c == IntCodec.ForDelta, s"got $c")
  }

  test("selector picks dict or pack for low-cardinality wide-spread values") {
    val vals = Array(5, 1000000, -2000000000, 77777777)
    val data = Array.tabulate(100000)(i => vals((i * 7919) % 4))
    val (c, enc) = Selector.encodeAuto(data)
    assert(enc.length < 4 * data.length / 8, s"chose ${c.name} at ${enc.length}")
  }

  test("stats: exact on small input") {
    val s = Selector.stats(Array(3, 3, 7, 7, 7, 1), 0, 6)
    assert(s.n == 6 && s.min == 1 && s.max == 7 && s.runs == 3 && s.distinct == 3 && !s.sorted)
  }

  // ---------------------------------------------------------- properties
  val genArray: Gen[Array[Int]] = Gen.oneOf(
    Gen.containerOf[Array, Int](Gen.chooseNum(Int.MinValue, Int.MaxValue)),
    Gen.containerOf[Array, Int](Gen.chooseNum(0, 50257)),
    Gen.containerOf[Array, Int](Gen.chooseNum(-4, 4)),
    Gen.containerOf[Array, Int](Gen.chooseNum(0, 50257)).map(_.sorted)
  )

  for (codec <- IntCodec.all) {
    test(s"property: ${codec.name} decode∘encode == id") {
      forAll(genArray) { a =>
        assert(IntCodec.decode(codec.encode(a)).sameElements(a))
      }
    }
  }

  test("property: auto decode∘encode == id and size <= plain+slack") {
    forAll(genArray) { a =>
      val (_, enc) = Selector.encodeAuto(a)
      assert(IntCodec.decode(enc).sameElements(a))
      assert(enc.length <= 4 * a.length + 16)
    }
  }

  test("property: varint round-trip") {
    forAll(Gen.chooseNum(Int.MinValue, Int.MaxValue)) { v =>
      val out = new ByteSink()
      BitIO.writeUvarint(out, v)
      val r = new BitIO.Reader(out.result(), 0)
      assert(r.readUvarint() == v)
      assert(out.size == BitIO.uvarintSize(v))
    }
    forAll(Gen.chooseNum(0L, Long.MaxValue)) { v =>
      val out = new ByteSink()
      BitIO.writeUvarintLong(out, v)
      val r = new BitIO.Reader(out.result(), 0)
      assert(r.readUvarintLong() == v)
    }
  }

  test("property: zigzag round-trip") {
    forAll(Gen.chooseNum(Int.MinValue, Int.MaxValue)) { v =>
      assert(BitIO.unzigzag(BitIO.zigzag(v)) == v)
    }
  }

  test("property: packBits/unpackBits at every width") {
    for (width <- 0 to 32) {
      val mask = if (width == 32) -1 else (1 << width) - 1
      val data = Array.tabulate(257)(i => (i * 0x9e3779b9) & mask)
      val out = new ByteSink()
      BitIO.packBits(data, 0, data.length, width, out)
      val dst = new Array[Int](data.length)
      BitIO.unpackBits(out.result(), 0, data.length, width, dst, 0)
      assert(dst.sameElements(data), s"width $width")
    }
  }

  // ---- decodeRange: within-chunk point decode ---------------------------

  for (codec <- IntCodec.all; (name, data) <- cases) {
    test(s"${codec.name} decodeRange == full-decode slice on $name") {
      val enc = codec.encode(data)
      val full = IntCodec.decode(enc)
      val n = data.length
      val ranges = Seq(
        (0, 0), (0, math.min(1, n)), (0, n),
        (n / 3, n - n / 3), (n / 2, math.min(7, n - n / 2)),
        (math.max(0, n - 1), n - math.max(0, n - 1)))
      for ((start, len) <- ranges) {
        val got = IntCodec.decodeRange(enc, start, len)
        assert(got.length == len)
        assert(java.util.Arrays.equals(got,
          java.util.Arrays.copyOfRange(full, start, start + len)),
          s"${codec.name} range [$start,+$len) on $name")
      }
    }
  }

  test("decodeRange bounds are checked") {
    val enc = IntCodec.Plain.encode(Array(1, 2, 3))
    intercept[IllegalArgumentException](IntCodec.decodeRange(enc, 2, 2))
    intercept[IllegalArgumentException](IntCodec.decodeRange(enc, -1, 1))
  }

  test("decodeRange reads ONLY the slice's bytes (byte-addressable codecs)") {
    // corrupt every payload byte that does NOT belong to the decoded
    // slice; a correct range decoder never touches them. This is the
    // O(doc)-not-O(chunk) evidence for point lookups: the codec seeks
    // to the doc's offsets instead of materializing the chunk.
    val data = Array.tabulate(1024)(i => 100000 + (i * 7919) % 5000)
    val start = 400
    val len = 37

    // plain: value i occupies bytes [header + 4i, header + 4i + 4)
    val encP = IntCodec.Plain.encode(data)
    val headerP = encP.length - 4 * data.length
    val want = java.util.Arrays.copyOfRange(IntCodec.decode(encP), start, start + len)
    for (i <- data.indices if i < start || i >= start + len; b <- 0 until 4)
      encP(headerP + 4 * i + b) = 0x5a
    assert(java.util.Arrays.equals(IntCodec.decodeRange(encP, start, len), want),
      "plain decodeRange read bytes outside the slice")

    // forsplit: value i's plane-p byte is at planeBase(p) + i
    val encS = IntCodec.ForSplit.encode(data)
    val full = IntCodec.decode(encS)
    val wantS = java.util.Arrays.copyOfRange(full, start, start + len)
    val w = {
      val mn = data.min; val mx = data.max
      (BitIO.bitsLong(mx.toLong - mn.toLong) + 7) / 8
    }
    val planeBase = encS.length - w * data.length
    for (p <- 0 until w; i <- data.indices if i < start || i >= start + len)
      encS(planeBase + p * data.length + i) = 0x5a.toByte
    assert(java.util.Arrays.equals(IntCodec.decodeRange(encS, start, len), wantS),
      "forsplit decodeRange read bytes outside the slice")
  }

  test("fordelta decodeRange never reads past the slice end (early exit)") {
    // sorted-ish data so ForDelta is a sane encoding; deltas for values
    // 1..n-1 are bit-packed after the header. The prefix up to `end`
    // must be decoded (prefix-dependence), but every byte strictly
    // after the slice's last delta bit may be corrupted freely.
    val data = Array.tabulate(2048)(i => i * 5 + (i % 3))
    val enc = IntCodec.ForDelta.encode(data)
    val want = IntCodec.decode(enc)
    val start = 100
    val len = 50
    val end = start + len
    // parse the header to locate the delta payload and its width
    val r = new BitIO.Reader(enc, 0)
    assert((r.readByte() & 0xff) == 3, "expected fordelta container")
    val n = r.readUvarint()
    r.readUvarint() // zigzag(first value)
    val width = r.readByte() & 0xff
    val deltaBase = r.pos
    // bytes holding delta bits [0, (end-1)*width) are live; everything
    // after (including slack up to the buffer end) gets clobbered
    val liveBytes = ((end - 1).toLong * width + 7) / 8
    for (p <- (deltaBase + liveBytes.toInt) until enc.length)
      enc(p) = 0x5a.toByte
    assert(n == data.length)
    assert(java.util.Arrays.equals(IntCodec.decodeRange(enc, start, len),
      java.util.Arrays.copyOfRange(want, start, end)),
      "fordelta decodeRange read bytes past the slice's last delta")
  }
}
