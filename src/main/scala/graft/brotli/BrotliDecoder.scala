package graft.brotli

import java.io.IOException

/** Incremental Brotli decoder (RFC 7932) structured as a resumable state
  * machine: compressed bytes arrive in arbitrary chunks via `addInput`,
  * decoded bytes are pulled via `decode` — the pull-based shape Hadoop's
  * `Decompressor` contract needs (reference semantics:
  * BroDecompressor.java:84-122, without the JNI paging of bro.cc:124-225).
  *
  * Header parse attempts snapshot the input queue and roll back on
  * underflow, so a meta-block header split across `addInput` calls is
  * retried when more bytes arrive.
  *
  * Coverage (tracked per SURVEY.md §7.3 risk 2): stream header (all WBITS
  * forms), uncompressed meta-blocks, metadata meta-blocks (skipped),
  * empty-last meta-blocks. Compressed (prefix-coded) meta-blocks —
  * which this engine's encoder never emits — raise a descriptive
  * IOException until the full entropy-decode rung lands.
  */
final class BrotliDecoder {

  private object State extends Enumeration {
    val StreamHeader, BlockHeader, CopyRaw, SkipMetadata, Done = Value
  }

  private val in = new ByteQueue()
  private var state = State.StreamHeader
  private var wbits = 0
  private var remaining = 0 // bytes left in CopyRaw / SkipMetadata
  private var sawEndOfInput = false

  def addInput(b: Array[Byte], off: Int, len: Int): Unit = {
    require(!sawEndOfInput || len == 0, "input after endOfInput")
    in.append(b, off, len)
  }

  /** Signal that the underlying stream hit EOF (reference parity:
    * BroDecompressorStream.java:55-58 → finish()). */
  def endOfInput(): Unit = sawEndOfInput = true

  def isFinished: Boolean = state == State.Done
  def needsInput: Boolean = !isFinished && in.availableBytes == 0 && !sawEndOfInput

  private def parseStreamHeader(): Unit = {
    // RFC 7932 §9.1
    if (in.readBit() == 0) { wbits = 16; return }
    val n = in.readBits(3)
    if (n != 0) { wbits = 17 + n; return }
    val m = in.readBits(3)
    if (m == 1) throw new IOException("invalid brotli WBITS")
    wbits = if (m == 0) 17 else 8 + m
  }

  /** Parse one meta-block header; sets the follow-on state. */
  private def parseBlockHeader(): Unit = {
    val islast = in.readBit()
    if (islast == 1 && in.readBit() == 1) { state = State.Done; return }
    val nibblesCode = in.readBits(2)
    if (nibblesCode == 3) {
      // metadata meta-block (RFC §9.2): only valid when not last
      if (islast == 1) throw new IOException("invalid brotli: metadata in last block")
      if (in.readBit() != 0) throw new IOException("invalid brotli: reserved bit set")
      val skipBytes = in.readBits(2)
      var skipLen = 0
      if (skipBytes > 0) {
        skipLen = in.readBits(skipBytes * 8)
        if (skipBytes > 1 && (skipLen >>> ((skipBytes - 1) * 8)) == 0)
          throw new IOException("invalid brotli: non-minimal MSKIPLEN")
        skipLen += 1
      }
      in.alignToByte()
      remaining = skipLen
      state = State.SkipMetadata
      return
    }
    val nibbles = 4 + nibblesCode
    var mlen = 0L
    var i = 0
    while (i < nibbles) { mlen |= in.readBits(4).toLong << (i * 4); i += 1 }
    val len = (mlen + 1).toInt
    if (islast == 0 && in.readBit() == 1) {
      in.alignToByte()
      remaining = len
      state = State.CopyRaw
    } else {
      throw new IOException(
        "compressed brotli meta-blocks not yet supported by graft's decoder " +
          "(v1 decodes the uncompressed-meta-block subset its encoder emits; " +
          "see SURVEY.md §7.0 quality ladder)")
    }
  }

  /** Decode up to len bytes into dst. Returns bytes produced; 0 means
    * finished, or more input needed (check needsInput/isFinished). */
  def decode(dst: Array[Byte], off: Int, len: Int): Int = {
    var produced = 0
    var progress = true
    while (progress && produced < len && state != State.Done) {
      progress = false
      state match {
        case State.StreamHeader | State.BlockHeader =>
          val snap = in.snapshot()
          try {
            if (state == State.StreamHeader) {
              parseStreamHeader()
              state = State.BlockHeader
            } else parseBlockHeader()
            progress = true
          } catch {
            case _: ByteQueue#Underflow =>
              in.restore(snap)
              if (sawEndOfInput)
                throw new IOException("truncated brotli stream")
          }
        case State.CopyRaw =>
          val n = in.readBytes(dst, off + produced, math.min(remaining, len - produced))
          if (n > 0) { produced += n; remaining -= n; progress = true }
          else if (sawEndOfInput && in.isEmpty)
            throw new IOException("truncated brotli stream")
          if (remaining == 0) { state = State.BlockHeader; progress = true }
        case State.SkipMetadata =>
          val n = in.skipBytes(remaining)
          if (n > 0) { remaining -= n; progress = true }
          if (remaining == 0) { state = State.BlockHeader; progress = true }
        case State.Done => ()
      }
    }
    produced
  }

  /** Real reset for pooled reuse — the reference's no-op reset is a
    * latent CodecPool corruption bug we must not copy
    * (BroDecompressor.java:130-131, SURVEY.md §2.C.7). */
  def reset(): Unit = {
    state = State.StreamHeader
    wbits = 0
    remaining = 0
    sawEndOfInput = false
    // drain any unread input
    val junk = new Array[Byte](4096)
    in.alignToByte()
    while (in.skipBytes(4096) > 0) ()
  }
}
