package graft.codec

import java.io.{IOException, InputStream, OutputStream}
import java.util.zip.CRC32

import org.apache.hadoop.conf.{Configurable, Configuration}
import org.apache.hadoop.fs.Seekable
import org.apache.hadoop.io.compress._

/** Framed SPLITTABLE Brotli codec (`.brf`) — the capability the
  * reference explicitly lacks (BroCodec.java:18 implements no
  * `SplittableCompressionCodec`, making every `.bro` file one Spark task;
  * SURVEY.md §4.2 calls that the single most important data-model fact
  * at 100 TB). A `.brf` file is a sequence of independent frames, each a
  * self-contained Brotli stream of up to `brf.frame-size` input bytes
  * behind a 16-byte self-validating header:
  *
  * {{{
  *   magic "BRF1" (4) | uncompLen (4 BE) | compLen (4 BE) | crc32 of
  *   the previous 12 bytes (4 BE) | compLen payload bytes
  * }}}
  *
  * Byte-aligned frames make split adjustment a header scan instead of
  * bzip2's bit-level marker hunt: a reader assigned `[start, end)` scans
  * forward from `start` for the first valid header (magic + sane lengths
  * + header CRC — false positives need a 32-bit magic collision AND a
  * CRC32 collision, ~2⁻⁶⁴ per byte) and serves whole frames from there.
  *
  * Split ownership follows Hadoop's block-codec contract, verified
  * against `CompressedSplitLineReader.didReadAfterSplit()` (pos >
  * adjustedEnd ⇒ at most one further record) and `LineRecordReader`
  * (skips its first partial line when adjustedStart ≠ 0):
  *
  *  - a frame belongs to the split whose range contains its first byte;
  *  - `getPos()` reports (current frame's start offset + 1), updated
  *    exactly when the frame's first byte is served, so the reader stops
  *    after one extra record once it crosses into the next split's
  *    frames (the bzip2 position-advertisement convention);
  *  - `read()` never returns bytes of two frames in one call — otherwise
  *    a buffered line reader could consume the next split's records
  *    against a stale position and emit duplicates.
  *
  * At 100 TB the point is layout freedom: one large `.brf` file yields
  * `size / maxPartitionBytes` parallel tasks like parquet does, instead
  * of `.bro`'s one-task-per-file rule (BroWriter.writeSized). Ratio cost
  * vs whole-file `.bro` is the lost cross-frame history, bounded by the
  * frame size (default 4 MiB ≈ the lgwin=22 window of the reference).
  */
class BroFramedCodec extends Configurable with SplittableCompressionCodec {
  import BroFramed._

  private var conf: Configuration = _
  private var quality: Int = BrotliCodec.DefaultQuality
  private var frameSize: Int = DefaultFrameSize

  override def setConf(c: Configuration): Unit = {
    conf = c
    quality = c.getInt(BrotliCodec.QualityKey, BrotliCodec.DefaultQuality)
    frameSize = math.max(1 << 12, c.getInt(FrameSizeKey, DefaultFrameSize))
  }
  override def getConf: Configuration = conf

  // Frames are compressed one-shot at emit time; the pooled
  // Compressor/Decompressor objects Hadoop hands around are unused (the
  // types are still required for CodecPool bookkeeping).
  override def createCompressor(): Compressor = new BrotliCompressor(quality)
  override def getCompressorType: Class[_ <: Compressor] = classOf[BrotliCompressor]
  override def createDecompressor(): Decompressor = new BrotliDecompressor()
  override def getDecompressorType: Class[_ <: Decompressor] = classOf[BrotliDecompressor]

  override def createOutputStream(out: OutputStream): CompressionOutputStream =
    new BroFramedOutputStream(out, quality, frameSize)
  override def createOutputStream(out: OutputStream, c: Compressor): CompressionOutputStream =
    createOutputStream(out)

  override def createInputStream(in: InputStream): CompressionInputStream =
    new BroFramedInputStream(in, 0L, Long.MaxValue)
  override def createInputStream(in: InputStream, d: Decompressor): CompressionInputStream =
    createInputStream(in)

  /** The splittable entry point (READ_MODE is accepted but the stream
    * always behaves BYBLOCK — frame-granular positions — which is what
    * `LineRecordReader` requests and what the ownership contract above
    * requires). */
  override def createInputStream(seekableIn: InputStream, d: Decompressor,
      start: Long, end: Long,
      readMode: SplittableCompressionCodec.READ_MODE): SplitCompressionInputStream = {
    val seekable = seekableIn match {
      case s: Seekable => s
      case _ => throw new IOException(
        s"seekableIn must be an instance of ${classOf[Seekable].getName}")
    }
    val adjStart =
      if (start == 0) 0L
      else {
        seekable.seek(start)
        scanForFrame(seekableIn, start)
      }
    if (adjStart < 0) {
      // no frame begins at or after `start`: an empty split (the bytes
      // under it are the tail of a frame owned by a previous split)
      new BroFramedInputStream(seekableIn, end, end)
    } else {
      seekable.seek(adjStart)
      new BroFramedInputStream(seekableIn, adjStart, end)
    }
  }

  override def getDefaultExtension: String = ".brf"
}

object BroFramed {
  val FrameSizeKey = "brf.frame-size"
  val DefaultFrameSize: Int = 4 << 20
  val HeaderLen = 16
  /** Sanity bound on header lengths (validation only). */
  val MaxFrameLen: Int = 1 << 27
  val Magic: Array[Byte] = Array('B'.toByte, 'R'.toByte, 'F'.toByte, '1'.toByte)

  def writeInt(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v >>> 24).toByte
    b(off + 1) = (v >>> 16).toByte
    b(off + 2) = (v >>> 8).toByte
    b(off + 3) = v.toByte
  }
  def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private def headerCrc(h: Array[Byte], off: Int): Int = {
    val c = new CRC32
    c.update(h, off, 12)
    c.getValue.toInt
  }

  /** Compose the 16-byte frame header. */
  def header(uncompLen: Int, compLen: Int): Array[Byte] = {
    val h = new Array[Byte](HeaderLen)
    System.arraycopy(Magic, 0, h, 0, 4)
    writeInt(h, 4, uncompLen)
    writeInt(h, 8, compLen)
    writeInt(h, 12, headerCrc(h, 0))
    h
  }

  /** Validate a candidate header at `off` (magic, length sanity, CRC). */
  def validHeader(h: Array[Byte], off: Int): Boolean =
    h(off) == Magic(0) && h(off + 1) == Magic(1) &&
      h(off + 2) == Magic(2) && h(off + 3) == Magic(3) && {
        val u = readInt(h, off + 4)
        val c = readInt(h, off + 8)
        u >= 0 && u <= MaxFrameLen && c > 0 && c <= MaxFrameLen &&
          readInt(h, off + 12) == headerCrc(h, off)
      }

  /** Scan forward from absolute offset `from` (stream already positioned
    * there) for the first valid frame header; returns its absolute
    * offset, or -1 if none before EOF. The caller re-seeks to the
    * result. Chunked with a HeaderLen-1 carryover so headers spanning
    * chunk boundaries are found. */
  private[codec] def scanForFrame(in: InputStream, from: Long): Long = {
    val Chunk = 1 << 16
    val buf = new Array[Byte](Chunk + HeaderLen - 1)
    var filled = 0
    var bufStart = from // absolute offset of buf(0)
    while (true) {
      val n = in.read(buf, filled, buf.length - filled)
      if (n < 0) {
        // EOF: no unchecked full-header window can remain
        return -1L
      }
      filled += n
      var i = 0
      while (i + HeaderLen <= filled) {
        if (validHeader(buf, i)) return bufStart + i
        i += 1
      }
      // keep the last HeaderLen-1 bytes: a header could span the seam
      val keep = math.min(HeaderLen - 1, filled)
      System.arraycopy(buf, filled - keep, buf, 0, keep)
      bufStart += filled - keep
      filled = keep
    }
    -1L // unreachable
  }
}

/** Write side: buffer `frameSize` input bytes, emit each as one
  * independent Brotli stream behind a self-validating header. */
class BroFramedOutputStream(out: OutputStream, quality: Int, frameSize: Int)
    extends CompressionOutputStream(out) {

  private val buf = new Array[Byte](frameSize)
  private var n = 0
  private var finished = false
  // ONE encoder for the stream's lifetime, reset() per frame: a fresh
  // encoder pays ~25 ms of first-touch page faults on its ~45 MB
  // window/chain arrays, which capped framed encode at ~50 MB/s vs ~250
  // whole-stream (r8 finding); reset() only refills the 2^17-entry hash
  // table, so per-frame fixed cost drops ~500×. Frames stay fully
  // independent streams — reset() is the pooled-reuse contract
  // BrotliSpec verifies.
  private val enc = new graft.brotli.BrotliEncoder(quality)
  private val frameBytes = new java.io.ByteArrayOutputStream()

  override def write(b: Int): Unit = {
    buf(n) = b.toByte
    n += 1
    if (n == frameSize) emit()
  }

  override def write(b: Array[Byte], off0: Int, len0: Int): Unit = {
    var off = off0
    var len = len0
    while (len > 0) {
      val k = math.min(len, frameSize - n)
      System.arraycopy(b, off, buf, n, k)
      n += k; off += k; len -= k
      if (n == frameSize) emit()
    }
  }

  private def emit(): Unit = if (n > 0) {
    frameBytes.reset()
    enc.reset()
    enc.write(buf, 0, n, frameBytes)
    enc.finish(frameBytes)
    out.write(BroFramed.header(n, frameBytes.size()))
    frameBytes.writeTo(out)
    n = 0
  }

  override def finish(): Unit = if (!finished) { emit(); finished = true }
  override def resetState(): Unit = { n = 0; finished = false; enc.reset() }
}

/** Read side for both whole-file and split use: serves whole frames
  * starting at `adjStart` (the codec already seeked/scanned there) with
  * the position-advertisement contract described on [[BroFramedCodec]].
  */
class BroFramedInputStream(in: InputStream, adjStart: Long, endArg: Long)
    extends SplitCompressionInputStream(in, adjStart, endArg) {
  import BroFramed._

  // frame/payload buffers are REUSED across frames (grown on demand,
  // frameLen carries the logical length): a fresh 4 MiB output + ~1 MiB
  // payload allocation per frame was ~40 MB of churn per 32 MiB stream
  private var frame: Array[Byte] = null
  private var frameLen = 0
  private var payloadBuf: Array[Byte] = Array.emptyByteArray
  private var fpos = 0
  /** Compressed offset of the next unread frame header. */
  private var nextFrameOffset: Long = adjStart
  /** Reported position: current frame's start + 1 once serving it. */
  private var reportedPos: Long = adjStart
  private var eof = false
  private val hdr = new Array[Byte](HeaderLen)
  // one decoder reused across frames (reset per frame): keeps the 4 MiB
  // backward-reference window's pages warm and decodes straight into the
  // header-sized output array — Brotli.decompress allocated a fresh
  // decoder + ByteArrayOutputStream per frame, whose first-touch faults
  // and grow-copies were most of the .brf decode tax (r8 finding)
  private val dec = new graft.brotli.BrotliDecoder()

  override def getPos: Long = reportedPos

  override def read(): Int = {
    val one = new Array[Byte](1)
    val n = read(one, 0, 1)
    if (n < 0) -1 else one(0) & 0xff
  }

  override def read(b: Array[Byte], off: Int, len: Int): Int = {
    if (len == 0) return 0
    while (frame == null || fpos >= frameLen) if (!advance()) return -1
    // never cross a frame boundary in one call (see class doc)
    val n = math.min(len, frameLen - fpos)
    System.arraycopy(frame, fpos, b, off, n)
    fpos += n
    n
  }

  /** Load the next frame; false on clean EOF at a frame boundary. */
  private def advance(): Boolean = {
    if (eof) return false
    val first = in.read(hdr, 0, 1)
    if (first < 0) { eof = true; return false }
    readFully(hdr, 1, HeaderLen - 1)
    if (!validHeader(hdr, 0))
      throw new IOException(s"corrupt .brf frame header at offset $nextFrameOffset")
    val uncompLen = readInt(hdr, 4)
    val compLen = readInt(hdr, 8)
    if (payloadBuf.length < compLen) payloadBuf = new Array[Byte](compLen)
    readFully(payloadBuf, 0, compLen)
    dec.reset()
    dec.addInput(payloadBuf, 0, compLen)
    dec.endOfInput()
    if (frame == null || frame.length < uncompLen)
      frame = new Array[Byte](uncompLen)
    val out = frame
    var got = 0
    var k = dec.decode(out, got, uncompLen - got)
    while (k > 0) { got += k; k = dec.decode(out, got, uncompLen - got) }
    if (!dec.isFinished) {
      // uncompLen == 0 (or a short frame): one probe drives the parse to
      // the stream's end so truncation/corruption still surfaces
      val probe = new Array[Byte](1)
      if (dec.decode(probe, 0, 1) != 0 || !dec.isFinished)
        throw new IOException(s"frame at offset $nextFrameOffset decoded to " +
          s"more than the $uncompLen bytes its header declares")
    }
    if (got != uncompLen)
      throw new IOException(s"frame at offset $nextFrameOffset decoded to " +
        s"$got bytes, header says $uncompLen")
    // advertise: this frame's bytes are served against its start offset
    reportedPos = nextFrameOffset + 1
    nextFrameOffset += HeaderLen + compLen
    frameLen = uncompLen
    fpos = 0
    if (uncompLen == 0) advance() else true
  }

  private def readFully(b: Array[Byte], off0: Int, len0: Int): Unit = {
    var off = off0
    var len = len0
    while (len > 0) {
      val n = in.read(b, off, len)
      if (n < 0) throw new IOException("truncated .brf frame")
      off += n; len -= n
    }
  }

  override def resetState(): Unit = {
    // full return to the constructor state: a pooled/reused stream that
    // keeps the old nextFrameOffset/reportedPos would report stale
    // positions to a split reader's pos-vs-end check after reset
    frame = null; frameLen = 0; fpos = 0; eof = false
    nextFrameOffset = adjStart; reportedPos = adjStart
  }
}
