package graft.codec

/** Symmetric int8 scalar quantization of float vectors — the standard
  * 4x payload reduction for embedding storage at scale (the scalar-
  * quantizer scheme popularized by FAISS's SQ8; per-vector scale =
  * maxabs/127, values land in [-127, 127]).
  *
  * Determinism contract (what makes q59 oracle-exact): floats widen to
  * double (exact), the scaled value is computed as (x * 127.0) / maxabs
  * in that IEEE op order, and rounding is half-away-from-zero evaluated
  * on the EXACT binary double (BigDecimal(double) + HALF_UP), which is
  * the same function as C++/DuckDB std::round — including the
  * 0.49999999999999994 → 0 case that a floor(x+0.5) shortcut gets
  * wrong. Any engine re-implementing this (SQL, C++, Java) reproduces
  * the quantized ints bit-for-bit.
  *
  * The max-|x| element always divides to exactly ±127.0 (same double
  * numerator and denominator), so every non-zero vector saturates at
  * least once; |q| can never exceed 127 (the quotient is <= 127 up to
  * one ulp, and 127.5 is unreachable), so no clamp is needed.
  */
object Quantize {

  /** Per-vector symmetric int8 quantization. Zero (or empty) vectors
    * quantize to all-zero — there is no scale to preserve.
    */
  def int8(v: Array[Float]): Array[Int] = {
    val d = new Array[Double](v.length)
    var m = 0.0
    var i = 0
    while (i < v.length) {
      d(i) = v(i).toDouble
      val a = math.abs(d(i)); if (a > m) m = a
      i += 1
    }
    val q = new Array[Int](v.length)
    if (m > 0) {
      i = 0
      while (i < v.length) {
        q(i) = new java.math.BigDecimal((d(i) * 127.0) / m)
          .setScale(0, java.math.RoundingMode.HALF_UP)
          .intValueExact()
        i += 1
      }
    }
    q
  }

  /** The vector's maxabs scale snapped to an integer grid (scale *
    * grid, rounded half-away-from-zero on the exact binary double —
    * same determinism contract as [[int8]]). An integer scale makes
    * asymmetric quantized scoring exact: rank documents for a probe by
    * `dot_q * scaleInt(doc)` in pure int64 arithmetic instead of the
    * float `dot_q * maxabs` FAISS computes — bit-reproducible across
    * engines, no float comparator in the top-k. grid = 2^20 keeps
    * |score| <= 127^2 * dim * maxabs * 2^20 — < 2^63 for any realistic
    * embedding (dim 4096, maxabs 1000 is still ~5.7e17).
    */
  def scaleInt(v: Array[Float], grid: Double = 1048576.0): Long = {
    var m = 0.0
    var i = 0
    while (i < v.length) {
      val a = math.abs(v(i).toDouble); if (a > m) m = a
      i += 1
    }
    if (m > 0)
      new java.math.BigDecimal(m * grid)
        .setScale(0, java.math.RoundingMode.HALF_UP)
        .longValueExact()
    else 0L
  }

  /** Dequantize back to floats given the vector's original maxabs
    * scale. Reconstruction error is bounded by scale/2 = maxabs/254
    * per component — the property QuantizeSpec pins.
    */
  def dequantize(q: Array[Int], maxAbs: Double): Array[Float] = {
    val out = new Array[Float](q.length)
    var i = 0
    while (i < q.length) {
      out(i) = ((q(i) * maxAbs) / 127.0).toFloat
      i += 1
    }
    out
  }
}
