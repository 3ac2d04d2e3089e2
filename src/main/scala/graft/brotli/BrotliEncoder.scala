package graft.brotli

import java.io.ByteArrayOutputStream

/** Streaming Brotli encoder (RFC 7932), v1 rung of the quality ladder
  * (SURVEY.md §7.0): data is framed as *uncompressed meta-blocks*, which
  * every conformant Brotli decoder accepts. The stream is spec-valid:
  * WBITS header, then non-last uncompressed meta-blocks, then an
  * ISLAST+ISLASTEMPTY terminator. Compression ratio is ~1.0 at GB/s;
  * higher rungs (prefix-coded meta-blocks) slot in behind the same API.
  *
  * Mirrors the reference's block-granular encode semantics
  * (BroCompressor.java:117-148: stage until a block is full, then emit)
  * without its JNI copies (SURVEY.md §3.1 cost model).
  */
final class BrotliEncoder(quality: Int = 6, lgwin: Int = 22) {
  require(quality >= 0 && quality <= 11, s"quality $quality out of range 0..11")
  require(lgwin >= 10 && lgwin <= 24, s"lgwin $lgwin out of range 10..24")

  /** Input staged per meta-block. Uncompressed meta-blocks allow MLEN up
    * to 2^24; we emit at most 4 MiB blocks (6 nibbles), scaled down for
    * low qualities to mimic the reference's block-size/quality coupling.
    */
  val blockSize: Int = if (quality <= 1) 1 << 16 else 1 << 22

  private val staging = new Array[Byte](blockSize)
  private var staged = 0
  private val bits = new BitWriter
  private var headerWritten = false
  private var streamFinished = false

  private def writeStreamHeader(): Unit = {
    // RFC 7932 §9.1 WBITS encoding; lgwin in 18..24 → '1' + 3 bits of
    // (lgwin - 17); lgwin 17 → '1' + 000 + 000; lgwin 16 → '0'.
    if (lgwin == 16) bits.writeBits(0, 1)
    else if (lgwin == 17) { bits.writeBits(1, 1); bits.writeBits(0, 3); bits.writeBits(0, 3) }
    else if (lgwin >= 18) { bits.writeBits(1, 1); bits.writeBits(lgwin - 17, 3) }
    else { // 10..15 → '1' + 000 + 3 bits of (lgwin - 8)
      bits.writeBits(1, 1); bits.writeBits(0, 3); bits.writeBits(lgwin - 8, 3)
    }
    headerWritten = true
  }

  private def emitUncompressedBlock(data: Array[Byte], off: Int, len: Int,
      sink: ByteArrayOutputStream): Unit = {
    require(len >= 1 && len <= (1 << 24))
    if (!headerWritten) writeStreamHeader()
    bits.writeBits(0, 1) // ISLAST = 0
    val mlenMinus1 = len - 1
    val nibbles = if (mlenMinus1 < (1 << 16)) 4
      else if (mlenMinus1 < (1 << 20)) 5 else 6
    bits.writeBits(nibbles - 4, 2) // MNIBBLES code
    bits.writeBits(mlenMinus1.toLong, nibbles * 4)
    bits.writeBits(1, 1) // ISUNCOMPRESSED
    bits.alignToByte()
    bits.writeBytes(data, off, len)
    bits.drainTo(sink)
  }

  /** Stage input, emitting meta-blocks as the staging buffer fills.
    * Returns compressed bytes produced by this call. */
  def write(data: Array[Byte], off: Int, len: Int,
      sink: ByteArrayOutputStream): Unit = {
    require(!streamFinished, "write after finish")
    var pos = off
    var left = len
    while (left > 0) {
      val take = math.min(blockSize - staged, left)
      System.arraycopy(data, pos, staging, staged, take)
      staged += take; pos += take; left -= take
      if (staged == blockSize) {
        emitUncompressedBlock(staging, 0, staged, sink)
        staged = 0
      }
    }
  }

  /** Flush staged data and terminate the stream (final empty meta-block).
    * An empty stream is itself valid: header + ISLAST+ISLASTEMPTY
    * (reference parity: BroCompressor.java:96-98 empty fast path). */
  def finish(sink: ByteArrayOutputStream): Unit = {
    if (streamFinished) return
    if (!headerWritten) writeStreamHeader()
    if (staged > 0) { emitUncompressedBlock(staging, 0, staged, sink); staged = 0 }
    bits.writeBits(1, 1) // ISLAST
    bits.writeBits(1, 1) // ISLASTEMPTY
    bits.finishTo(sink)
    streamFinished = true
  }

  def finished: Boolean = streamFinished

  /** Full reset for pooled reuse (real, unlike BroDecompressor.java:130). */
  def reset(): Unit = {
    staged = 0
    headerWritten = false
    streamFinished = false
    val drain = new ByteArrayOutputStream()
    bits.finishTo(drain) // discard any partial state
  }
}

/** One-shot helpers (tests / simple callers). */
object Brotli {
  def compress(data: Array[Byte], quality: Int = 6): Array[Byte] = {
    val enc = new BrotliEncoder(quality)
    val out = new ByteArrayOutputStream()
    enc.write(data, 0, data.length, out)
    enc.finish(out)
    out.toByteArray
  }

  def decompress(data: Array[Byte]): Array[Byte] = {
    val dec = new BrotliDecoder()
    dec.addInput(data, 0, data.length)
    dec.endOfInput()
    val out = new ByteArrayOutputStream()
    val buf = new Array[Byte](1 << 16)
    var n = dec.decode(buf, 0, buf.length)
    while (n > 0) { out.write(buf, 0, n); n = dec.decode(buf, 0, buf.length) }
    require(dec.isFinished, "truncated brotli stream")
    out.toByteArray
  }
}
