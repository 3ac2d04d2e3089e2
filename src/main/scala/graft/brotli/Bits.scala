package graft.brotli

import java.io.ByteArrayOutputStream

/** LSB-first bit writer over a growable byte sink (RFC 7932 bit order:
  * values are packed starting from the least-significant bit of each
  * byte). */
final class BitWriter {
  private val bytes = new ByteArrayOutputStream(1 << 16)
  private var cur: Int = 0
  private var nbits: Int = 0

  def writeBits(value: Long, n: Int): Unit = {
    var v = value
    var left = n
    while (left > 0) {
      val take = math.min(8 - nbits, left)
      cur |= ((v & ((1L << take) - 1)).toInt << nbits)
      nbits += take
      v >>>= take
      left -= take
      if (nbits == 8) { bytes.write(cur); cur = 0; nbits = 0 }
    }
  }

  /** Prefix-code bits are written MSB-of-code first (RFC 1951 / 7932
    * canonical convention), bit by bit into the LSB-first byte stream. */
  def writeCodeBits(code: Int, len: Int): Unit = {
    var i = len - 1
    while (i >= 0) { writeBits((code >> i) & 1, 1); i -= 1 }
  }

  /** Pad the current byte with zero bits (meta-block raw-data alignment). */
  def alignToByte(): Unit =
    if (nbits > 0) { bytes.write(cur); cur = 0; nbits = 0 }

  /** Raw byte copy; caller must be byte-aligned. */
  def writeBytes(b: Array[Byte], off: Int, len: Int): Unit = {
    require(nbits == 0, "writeBytes requires byte alignment")
    bytes.write(b, off, len)
  }

  def sizeBytes: Int = bytes.size() + (if (nbits > 0) 1 else 0)

  /** Drain completed bytes (keeps any partial byte pending). */
  def drainTo(sink: ByteArrayOutputStream): Unit = {
    bytes.writeTo(sink)
    bytes.reset()
  }

  /** Flush including the final partial byte (end of stream only). */
  def finishTo(sink: ByteArrayOutputStream): Unit = {
    alignToByte()
    drainTo(sink)
  }
}

/** Growable FIFO byte queue with LSB-first bit reads and snapshot/restore,
  * backing the incremental decoder: parse attempts that underflow restore
  * the read position and wait for more input. */
final class ByteQueue(initialCapacity: Int = 1 << 16) {
  private var buf = new Array[Byte](initialCapacity)
  private var head = 0 // next unread byte
  private var tail = 0 // one past last valid byte
  private var bitPos = 0 // bits consumed of buf(head)

  final class Underflow extends RuntimeException("need more input") {
    override def fillInStackTrace(): Throwable = this
  }
  private val underflow = new Underflow

  def append(b: Array[Byte], off: Int, len: Int): Unit = {
    if (tail + len > buf.length) {
      val live = tail - head
      if (live + len <= buf.length && head >= buf.length / 2) {
        System.arraycopy(buf, head, buf, 0, live)
      } else {
        val bigger = new Array[Byte](math.max(buf.length * 2, live + len))
        System.arraycopy(buf, head, bigger, 0, live)
        buf = bigger
      }
      tail = live; head = 0
    }
    System.arraycopy(b, off, buf, tail, len)
    tail += len
  }

  def availableBytes: Int = tail - head - (if (bitPos > 0) 1 else 0)
  def isEmpty: Boolean = head == tail

  def snapshot(): (Int, Int) = (head, bitPos)
  def restore(s: (Int, Int)): Unit = { head = s._1; bitPos = s._2 }

  def readBit(): Int = {
    if (head >= tail) throw underflow
    val bit = (buf(head) >> bitPos) & 1
    bitPos += 1
    if (bitPos == 8) { bitPos = 0; head += 1 }
    bit
  }

  def readBits(n: Int): Int = {
    if (n == 0) return 0
    // fast path: whole read available in the buffer (n <= 25 given
    // bitPos <= 7; Brotli's largest fixed-width read is 24 bits)
    if ((tail - head) * 8 - bitPos >= n && n <= 25) {
      var v = (buf(head) & 0xff) >>> bitPos
      var got = 8 - bitPos
      var idx = head + 1
      while (got < n) { v |= (buf(idx) & 0xff) << got; got += 8; idx += 1 }
      skipBits(n)
      return v & ((1 << n) - 1)
    }
    var v = 0
    var i = 0
    while (i < n) { v |= readBit() << i; i += 1 }
    v
  }

  /** Peek the next 16 stream-order bits (bit i of the result is the
    * (i+1)-th bit to arrive) without consuming; -1 if fewer than 16 bits
    * are buffered. Fast path for table-driven prefix decode. */
  def peekBits16(): Int = {
    val availBits = (tail - head) * 8 - bitPos
    if (availBits < 16) return -1
    var v = (buf(head) & 0xff) >>> bitPos
    var got = 8 - bitPos
    v |= (buf(head + 1) & 0xff) << got
    got += 8
    if (got < 16) v |= (buf(head + 2) & 0xff) << got
    v & 0xffff
  }

  def skipBits(n: Int): Unit = {
    bitPos += n
    head += bitPos >> 3
    bitPos &= 7
  }

  /** Discard remaining bits of the current byte (RFC alignment). */
  def alignToByte(): Unit =
    if (bitPos > 0) { bitPos = 0; head += 1 }

  /** Byte-aligned bulk copy of up to len bytes; returns bytes copied. */
  def readBytes(dst: Array[Byte], off: Int, len: Int): Int = {
    require(bitPos == 0, "readBytes requires byte alignment")
    val n = math.min(len, tail - head)
    System.arraycopy(buf, head, dst, off, n)
    head += n
    n
  }

  /** Byte-aligned skip of up to len bytes; returns bytes skipped. */
  def skipBytes(len: Int): Int = {
    require(bitPos == 0)
    val n = math.min(len, tail - head)
    head += n
    n
  }
}
