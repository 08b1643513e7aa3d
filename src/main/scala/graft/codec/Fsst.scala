package graft.codec

/** FSST — Fast Static Symbol Table string compression.
  *
  * Independent implementation of the published technique (Boncz,
  * Neumann, Leis: "FSST: Fast Random Access String Compression",
  * VLDB 2020): a static table of at most 255 symbols, each 1..8 bytes,
  * trained by a few bounded iterations over a sample; output is a
  * stream of 1-byte codes, with code 255 escaping one literal byte.
  *
  * Fills the role the reference delegates to Parquet's byte-array
  * encodings for its string columns (reference:
  * schema/schema_builder.go:105 RLE_DICTIONARY labels) but targets
  * medium-cardinality strings where a dictionary is too big.
  */
object Fsst {
  final val Escape = 255
  final val MaxSymbols = 255
  final val MaxSymbolLen = 8
  final val TrainIterations = 5
  final val MaxSampleBytes = 1 << 14

  /** A trained symbol table. Symbols are stored densely; `index`
    * buckets them by first byte, longest first, for greedy matching.
    */
  final class SymbolTable(val symbols: Array[Array[Byte]]) {
    private val index: Array[Array[Int]] = {
      val buckets = Array.fill(256)(List.empty[Int])
      var i = 0
      while (i < symbols.length) {
        val b = symbols(i)(0) & 0xff
        buckets(b) = i :: buckets(b)
        i += 1
      }
      buckets.map(_.sortBy(i => -symbols(i).length).toArray)
    }

    /** Longest symbol matching buf[pos..end); -1 if none. */
    def longestMatch(buf: Array[Byte], pos: Int, end: Int): Int = {
      val cands = index(buf(pos) & 0xff)
      var ci = 0
      while (ci < cands.length) {
        val si = cands(ci)
        val s = symbols(si)
        if (pos + s.length <= end) {
          var k = 1
          while (k < s.length && s(k) == buf(pos + k)) k += 1
          if (k == s.length) return si
        }
        ci += 1
      }
      -1
    }

    def compress(buf: Array[Byte], from: Int, len: Int, out: ByteSink): Unit = {
      var i = from
      val end = from + len
      while (i < end) {
        val m = longestMatch(buf, i, end)
        if (m >= 0) {
          out.addByte(m.toByte)
          i += symbols(m).length
        } else {
          out.addByte(Escape.toByte)
          out.addByte(buf(i))
          i += 1
        }
      }
    }

    def decompressedSize(buf: Array[Byte], from: Int, len: Int): Int = {
      var i = from; val end = from + len
      var total = 0
      while (i < end) {
        val c = buf(i) & 0xff
        if (c == Escape) { total += 1; i += 2 }
        else { total += symbols(c).length; i += 1 }
      }
      total
    }

    def decompress(buf: Array[Byte], from: Int, len: Int): Array[Byte] = {
      val out = new Array[Byte](decompressedSize(buf, from, len))
      var i = from; val end = from + len
      var o = 0
      while (i < end) {
        val c = buf(i) & 0xff
        if (c == Escape) { out(o) = buf(i + 1); o += 1; i += 2 }
        else {
          val s = symbols(c)
          System.arraycopy(s, 0, out, o, s.length)
          o += s.length; i += 1
        }
      }
      out
    }
  }

  /** Train a symbol table on (a sample of) the input. Bottom-up: each
    * iteration compresses the sample with the current table, counts the
    * gain of every emitted symbol and of every adjacent-pair
    * concatenation (<= 8 bytes), and keeps the top candidates.
    */
  def train(data: Array[Byte], from: Int, len: Int): SymbolTable = {
    val sampleLen = math.min(len, MaxSampleBytes)
    val sample = java.util.Arrays.copyOfRange(data, from, from + sampleLen)
    var table = new SymbolTable(Array.empty)

    var iter = 0
    while (iter < TrainIterations) {
      // gain(candidate symbol) = (len - 1) * occurrences: bytes saved vs
      // emitting each byte escaped is larger, but relative ranking is the
      // same; (len*count) overweights long rare symbols, so use saved bytes.
      val gains = new java.util.HashMap[String, Long]()
      @inline def bump(bytes: Array[Byte], off: Int, l: Int, by: Long): Unit = {
        if (l <= MaxSymbolLen) {
          val key = new String(bytes, off, l, java.nio.charset.StandardCharsets.ISO_8859_1)
          gains.merge(key, by, (a, b) => a + b)
        }
      }
      var i = 0
      var prevStart = -1
      var prevLen = 0
      while (i < sample.length) {
        val m = table.longestMatch(sample, i, sample.length)
        val curLen = if (m >= 0) table.symbols(m).length else 1
        bump(sample, i, curLen, curLen) // symbol keeps its own weight
        if (prevStart >= 0 && prevLen + curLen <= MaxSymbolLen) {
          bump(sample, prevStart, prevLen + curLen, prevLen + curLen)
        }
        prevStart = i
        prevLen = curLen
        i += curLen
      }
      // keep top MaxSymbols candidates by gain; require gain worth the
      // table-entry overhead and multi-use (count >= 2 equivalent)
      import scala.jdk.CollectionConverters._
      val picked = gains.entrySet().asScala.toSeq
        .filter { e =>
          val l = e.getKey.length
          e.getValue >= 2L * l && (l > 1 || e.getValue >= 4)
        }
        .sortBy(e => (-e.getValue, e.getKey))
        .take(MaxSymbols)
        .map(_.getKey.getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
        .toArray
      table = new SymbolTable(picked)
      iter += 1
    }
    table
  }

  /** One-shot: train on the buffer, emit
    * [nSymbols][len,bytes]* [uvarint compressedLen][codes...].
    */
  def compress(data: Array[Byte], from: Int, len: Int, out: ByteSink): Unit = {
    val table = train(data, from, len)
    out.addByte(table.symbols.length.toByte)
    table.symbols.foreach { s =>
      out.addByte(s.length.toByte)
      out.addBytes(s)
    }
    val body = new ByteSink(len / 2 + 16)
    table.compress(data, from, len, body)
    BitIO.writeUvarint(out, body.size)
    val b = body.result()
    out.addBytes(b)
  }

  def decompress(r: BitIO.Reader): Array[Byte] = {
    val nSym = r.readByte() & 0xff
    val symbols = new Array[Array[Byte]](nSym)
    var i = 0
    while (i < nSym) {
      val l = r.readByte() & 0xff
      symbols(i) = r.readBytes(l)
      i += 1
    }
    val table = new SymbolTable(symbols)
    val clen = r.readUvarint()
    val res = table.decompress(r.buf, r.pos, clen)
    r.pos += clen
    res
  }
}
