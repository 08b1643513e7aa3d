package graft.codec

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class QuantizeSpec extends AnyFunSuite {
  import PropCheck.forAll

  // finite, non-degenerate floats — quantization is defined on real
  // embedding payloads, not NaN/Inf bit patterns
  private val finiteFloat: Gen[Float] =
    Gen.chooseNum(-1e6f, 1e6f)

  test("bounds and saturation: |q| <= 127 and every non-zero vector saturates") {
    forAll(Gen.nonEmptyListOf(finiteFloat)) { xs =>
      val v = xs.toArray
      val q = Quantize.int8(v)
      assert(q.length == v.length)
      assert(q.forall(x => x >= -127 && x <= 127))
      if (v.exists(_ != 0.0f)) {
        // the max-|x| element divides to exactly +/-127.0
        assert(q.exists(x => math.abs(x) == 127))
        val iMax = v.indices.maxBy(i => math.abs(v(i).toDouble))
        assert(math.abs(q(iMax)) == 127)
        assert(q(iMax).sign == math.signum(v(iMax).toDouble).toInt)
      }
    }
  }

  test("zero and empty vectors quantize to all-zero") {
    assert(Quantize.int8(Array.empty[Float]).isEmpty)
    assert(Quantize.int8(Array(0.0f, -0.0f, 0.0f)).forall(_ == 0))
  }

  test("ties round half AWAY from zero (std::round semantics)") {
    // (0.5 * 127) / 1.0 = 63.5 exactly -> 64; negated -> -64
    assert(Quantize.int8(Array(0.5f, 1.0f)).sameElements(Array(64, 127)))
    assert(Quantize.int8(Array(-0.5f, 1.0f)).sameElements(Array(-64, 127)))
    assert(Quantize.int8(Array(0.5f, -1.0f)).sameElements(Array(64, -127)))
  }

  test("scale invariance: quantization depends only on the vector's shape") {
    forAll(Gen.nonEmptyListOf(finiteFloat)) { xs =>
      val v = xs.toArray
      // scaling by an exact power of two changes no mantissas, so the
      // quantized vector is identical
      val v4 = v.map(x => x * 4.0f)
      if (v.forall(x => math.abs(x) < 1e6f))
        assert(Quantize.int8(v).sameElements(Quantize.int8(v4)))
    }
  }

  test("dequantize reconstruction error is bounded by maxAbs/254 + half-ulp") {
    forAll(Gen.nonEmptyListOf(finiteFloat)) { xs =>
      val v = xs.toArray
      val m = v.iterator.map(x => math.abs(x.toDouble)).foldLeft(0.0)(math.max)
      if (m > 0) {
        val r = Quantize.dequantize(Quantize.int8(v), m)
        v.indices.foreach { i =>
          val err = math.abs(r(i).toDouble - v(i).toDouble)
          // quantization step is m/127; rounding leaves <= step/2,
          // plus one float ulp of slack from the final toFloat
          assert(err <= m / 254.0 + math.ulp(m.toFloat).toDouble,
            s"i=$i v=${v(i)} r=${r(i)} m=$m err=$err")
        }
      }
    }
  }

  test("scaleInt: exact grid snap, zero on zero vectors, order-preserving") {
    assert(Quantize.scaleInt(Array.empty[Float]) == 0L)
    assert(Quantize.scaleInt(Array(0.0f, -0.0f)) == 0L)
    // 0.5 is exact in binary: 0.5 * 2^20 = 524288 exactly
    assert(Quantize.scaleInt(Array(0.5f, -0.25f)) == 524288L)
    assert(Quantize.scaleInt(Array(-0.5f)) == 524288L)
    forAll(Gen.nonEmptyListOf(finiteFloat)) { xs =>
      val v = xs.toArray
      val m = v.iterator.map(x => math.abs(x.toDouble)).foldLeft(0.0)(math.max)
      val s = Quantize.scaleInt(v)
      // snapped scale is within half a grid step of the true scale
      assert(math.abs(s - m * 1048576.0) <= 0.5 + 1e-9)
    }
  }

  test("quantized ints round-trip the int codec selector bit-exactly") {
    forAll(Gen.nonEmptyListOf(finiteFloat)) { xs =>
      val q = Quantize.int8(xs.toArray)
      val (_, enc) = Selector.encodeAuto(q)
      assert(IntCodec.decode(enc).sameElements(q))
    }
  }
}
