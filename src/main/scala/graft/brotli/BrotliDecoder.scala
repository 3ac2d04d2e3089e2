package graft.brotli

import java.io.IOException

/** Incremental Brotli decoder (RFC 7932) structured as a resumable state
  * machine: compressed bytes arrive in arbitrary chunks via `addInput`,
  * decoded bytes are pulled via `decode` — the pull-based shape Hadoop's
  * `Decompressor` contract needs (reference semantics:
  * BroDecompressor.java:84-122, without the JNI paging of bro.cc:124-225).
  *
  * Parse attempts snapshot the input queue and roll back on underflow, so
  * a meta-block split across `addInput` calls is retried when more bytes
  * arrive. Entropy-coded meta-blocks are decoded atomically into a
  * pending buffer (bounded by MLEN ≤ 16 MiB; this engine's encoder emits
  * ≤ 1 MiB) and committed to the backward-reference window on success.
  *
  * Coverage (tracked per SURVEY.md §7.3 risk 2):
  *  - stream header (all WBITS forms) ✓
  *  - uncompressed + metadata + empty-last meta-blocks ✓
  *  - entropy-coded meta-blocks: simple + complex prefix codes (incl.
  *    16/17 repeat codes), single block type, NPOSTFIX/NDIRECT, command
  *    loop with insert+copy, distance ring buffer, window copies ✓
  *  - multiple block types (block switching), context maps with ≥2
  *    trees, and static-dictionary references raise descriptive errors —
  *    this engine's encoder never emits them. Ring-buffer distance codes
  *    4..15 follow the RFC listing; cross-validation against an external
  *    brotli is pending environment availability (offline).
  */
final class BrotliDecoder {
  import Tables7932._

  private object State extends Enumeration {
    val StreamHeader, BlockHeader, CopyRaw, SkipMetadata, Done = Value
  }

  private val in = new ByteQueue()
  private var state = State.StreamHeader
  private var wbits = 0
  private var remaining = 0 // bytes left in CopyRaw / SkipMetadata
  private var islastPending = false // current block is ISLAST
  private var sawEndOfInput = false
  // set when a parse attempt rolled back on underflow: the bytes on hand
  // are not enough to progress, so callers must feed more before retrying
  // (otherwise the Hadoop DecompressorStream loop spins re-parsing).
  private var starved = false

  // backward-reference window (circular), allocated once wbits is known
  private var window: Array[Byte] = _
  private var windowMask = 0
  private var totalOut = 0L

  // decoded-but-unserved output of an entropy-coded block
  private var pendingOut: Array[Byte] = _
  private var pendingPos = 0

  def addInput(b: Array[Byte], off: Int, len: Int): Unit = {
    require(!sawEndOfInput || len == 0, "input after endOfInput")
    in.append(b, off, len)
    if (len > 0) starved = false
  }

  /** Signal that the underlying stream hit EOF (reference parity:
    * BroDecompressorStream.java:55-58 → finish()). */
  def endOfInput(): Unit = sawEndOfInput = true

  def isFinished: Boolean = state == State.Done &&
    (pendingOut == null || pendingPos >= pendingOut.length)
  def needsInput: Boolean = !isFinished &&
    (starved || in.availableBytes == 0) && !sawEndOfInput &&
    (pendingOut == null || pendingPos >= pendingOut.length)

  private def appendWindow(b: Array[Byte], off: Int, len: Int): Unit = {
    var srcOff = off
    var left = len
    while (left > 0) {
      val wpos = (totalOut & windowMask).toInt
      val n = math.min(left, window.length - wpos)
      System.arraycopy(b, srcOff, window, wpos, n)
      totalOut += n; srcOff += n; left -= n
    }
  }

  private def parseStreamHeader(): Unit = {
    // RFC 7932 §9.1
    if (in.readBit() == 0) wbits = 16
    else {
      val n = in.readBits(3)
      if (n != 0) wbits = 17 + n
      else {
        val m = in.readBits(3)
        if (m == 1) throw new IOException("invalid brotli WBITS")
        wbits = if (m == 0) 17 else 8 + m
      }
    }
    val size = 1 << wbits
    window = new Array[Byte](size)
    windowMask = size - 1
  }

  /** §9.2 variable-length count (NBLTYPES / NTREES). */
  private def readVarCount(): Int =
    if (in.readBit() == 0) 1
    else {
      val nbits = in.readBits(3)
      (1 << nbits) + 1 + in.readBits(nbits)
    }

  /** §3.4/§3.5 prefix-code parse → decoder. */
  private def readPrefixCode(alphabetSize: Int, alphabetBits: Int): HuffmanDecoder = {
    val form = in.readBits(2)
    if (form == 1) {
      // simple form
      val nsym = in.readBits(2) + 1
      val syms = Array.fill(nsym)(in.readBits(alphabetBits))
      if (syms.exists(_ >= alphabetSize))
        throw new IOException("invalid brotli: simple-code symbol out of range")
      val lengths = new Array[Int](alphabetSize)
      nsym match {
        case 1 => return HuffmanDecoder.single(syms(0))
        case 2 => lengths(syms(0)) = 1; lengths(syms(1)) = 1
        case 3 => lengths(syms(0)) = 1; lengths(syms(1)) = 2; lengths(syms(2)) = 2
        case 4 =>
          if (in.readBit() == 0) syms.foreach(lengths(_) = 2)
          else {
            lengths(syms(0)) = 1; lengths(syms(1)) = 2
            lengths(syms(2)) = 3; lengths(syms(3)) = 3
          }
      }
      HuffmanDecoder(lengths)
    } else {
      // complex form; `form` is HSKIP
      val static = HuffmanDecoder(CodeLengthCodeLengths)
      val clcLen = new Array[Int](18)
      var space32 = 32
      var i = form
      while (i < CodeLengthCodeOrder.length && space32 > 0) {
        val v = static.decode(in)
        clcLen(CodeLengthCodeOrder(i)) = v
        if (v > 0) space32 -= 32 >> v
        i += 1
      }
      val clc = HuffmanDecoder(clcLen)
      val lengths = new Array[Int](alphabetSize)
      var space = 32768
      var sym = 0
      var prevNonZero = 8
      var lastRepeatCode = -1
      var repeatTotal = 0
      while (space > 0 && sym < alphabetSize) {
        val v = clc.decode(in)
        if (v < 16) {
          lengths(sym) = v
          sym += 1
          if (v > 0) { space -= 32768 >> v; prevNonZero = v }
          lastRepeatCode = -1
        } else {
          // §3.5 repeat codes: 16 repeats prevNonZero (2 extra bits),
          // 17 repeats zero (3 extra bits); a chained same-code repeat
          // rescales: new_total = ((old_total - 2) << extra_bits) + 3 + extra.
          val ebits = if (v == 16) 2 else 3
          val extra = in.readBits(ebits)
          val newTotal =
            if (lastRepeatCode == v) ((repeatTotal - 2) << ebits) + 3 + extra
            else 3 + extra
          val delta = newTotal - (if (lastRepeatCode == v) repeatTotal else 0)
          val fillLen = if (v == 16) prevNonZero else 0
          var k = 0
          while (k < delta && sym < alphabetSize) {
            lengths(sym) = fillLen
            if (fillLen > 0) space -= 32768 >> fillLen
            sym += 1; k += 1
          }
          lastRepeatCode = v
          repeatTotal = newTotal
        }
      }
      if (space < 0) throw new IOException("invalid brotli: over-subscribed code")
      HuffmanDecoder(lengths)
    }
  }

  /** Decode one entropy-coded meta-block body of length mlen into a fresh
    * buffer (window not yet committed; in-block back-references read from
    * the local buffer). */
  private def decodeCompressedBlock(mlen: Int): Array[Byte] = {
    val nbltypesL = readVarCount()
    val nbltypesI = readVarCount()
    val nbltypesD = readVarCount()
    if (nbltypesL != 1 || nbltypesI != 1 || nbltypesD != 1)
      throw new IOException("brotli block switching (NBLTYPES > 1) not yet supported by graft's decoder")
    val npostfix = in.readBits(2)
    val ndirect = in.readBits(4) << npostfix
    in.readBits(2) // context mode of the single literal block type (unused with 1 tree)
    val ntreesL = readVarCount()
    if (ntreesL != 1)
      throw new IOException("brotli literal context maps not yet supported by graft's decoder")
    val ntreesD = readVarCount()
    if (ntreesD != 1)
      throw new IOException("brotli distance context maps not yet supported by graft's decoder")
    val litTree = readPrefixCode(LiteralAlphabetSize, 8)
    val cmdTree = readPrefixCode(CommandAlphabetSize, 10)
    val distAlphabet = numDistanceCodes(npostfix, ndirect >> npostfix)
    val distBits = 32 - Integer.numberOfLeadingZeros(distAlphabet - 1)
    val distTree = readPrefixCode(distAlphabet, distBits)

    val outBuf = new Array[Byte](mlen)
    var pos = 0
    // distance ring, most-recent-first from ringIdx: initial [16,15,11,4]
    // with "last" = 16 (RFC §4).
    val ring = InitialDistanceRing.clone()
    var ringIdx = 0
    def ringAt(back: Int): Int = ring((ringIdx + back) & 3) // back=0 → last
    def pushRing(d: Int): Unit = { ringIdx = (ringIdx + 3) & 3; ring(ringIdx) = d }

    val postfixMask = (1 << npostfix) - 1
    while (pos < mlen) {
      val cmd = cmdTree.decode(in)
      val (icode, ccode, impliedDist0) = unpackCommand(cmd)
      val ilen = InsertBase(icode) + in.readBits(InsertExtra(icode))
      val clen = CopyBase(ccode) + in.readBits(CopyExtra(ccode))
      var k = 0
      while (k < ilen) {
        if (pos >= mlen) throw new IOException("invalid brotli: insert overruns MLEN")
        outBuf(pos) = litTree.decode(in).toByte
        pos += 1; k += 1
      }
      if (pos < mlen) {
        var distance = 0
        if (impliedDist0) distance = ringAt(0)
        else {
          val dcode = distTree.decode(in)
          if (dcode == 0) distance = ringAt(0)
          else if (dcode < 4) { distance = ringAt(dcode); pushRing(distance) }
          else if (dcode < 16) {
            // RFC §4 listing: 4..9 modify last by -1,+1,-2,+2,-3,+3;
            // 10..15 the same off second-to-last.
            val base = ringAt(if (dcode < 10) 0 else 1)
            val j = (dcode - 4) % 6
            val delta = Array(-1, 1, -2, 2, -3, 3)(j)
            distance = base + delta
            if (distance <= 0) throw new IOException("invalid brotli distance")
            pushRing(distance)
          } else if (dcode < 16 + (ndirect >> npostfix)) {
            distance = dcode - 15
            pushRing(distance)
          } else {
            val d = dcode - (ndirect >> npostfix) - 16
            val ndistbits = 1 + (d >> (npostfix + 1))
            val hcode = d >> npostfix
            val lcode = d & postfixMask
            val extra = in.readBits(ndistbits)
            val offset = ((2 + (hcode & 1)) << ndistbits) - 4
            distance = ((offset + extra) << npostfix) + lcode + ndirect + 1
            pushRing(distance)
          }
        }
        val maxBackward = math.min(totalOut + pos, (1L << wbits) - 16)
        if (distance > maxBackward)
          throw new IOException(
            "brotli static dictionary references not supported by graft's decoder " +
              "(this engine's encoder never emits them)")
        var c = 0
        while (c < clen && pos < mlen) {
          val src = totalOut + pos - distance
          outBuf(pos) =
            if (src >= totalOut) outBuf((src - totalOut).toInt)
            else window((src & windowMask).toInt)
          pos += 1; c += 1
        }
      }
    }
    outBuf
  }

  /** Parse one meta-block header; sets the follow-on state and, for
    * entropy-coded blocks, decodes the whole body. */
  private def parseBlock(): Unit = {
    val islast = in.readBit() == 1
    if (islast && in.readBit() == 1) { state = State.Done; return }
    val nibblesCode = in.readBits(2)
    if (nibblesCode == 3) {
      if (islast) throw new IOException("invalid brotli: metadata in last block")
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
    islastPending = islast
    if (!islast && in.readBit() == 1) {
      in.alignToByte()
      remaining = len
      state = State.CopyRaw
    } else {
      // entropy-coded block, decoded atomically (underflow rolls the
      // whole block back via the caller's snapshot)
      val out = decodeCompressedBlock(len)
      appendWindow(out, 0, out.length)
      pendingOut = out
      pendingPos = 0
      state = if (islast) State.Done else State.BlockHeader
    }
  }

  /** Decode up to len bytes into dst. Returns bytes produced; 0 means
    * finished, or more input needed (check needsInput/isFinished). */
  def decode(dst: Array[Byte], off: Int, len: Int): Int = {
    var produced = 0
    var progress = true
    while (progress && produced < len) {
      progress = false
      // serve decoded-but-unserved entropy output first
      if (pendingOut != null && pendingPos < pendingOut.length) {
        val n = math.min(len - produced, pendingOut.length - pendingPos)
        System.arraycopy(pendingOut, pendingPos, dst, off + produced, n)
        pendingPos += n
        produced += n
        if (pendingPos >= pendingOut.length) pendingOut = null
        progress = true
      } else if (state == State.Done) {
        return produced
      } else state match {
        case State.StreamHeader | State.BlockHeader =>
          val snap = in.snapshot()
          try {
            if (state == State.StreamHeader) {
              parseStreamHeader()
              state = State.BlockHeader
            } else parseBlock()
            progress = true
          } catch {
            case _: ByteQueue#Underflow =>
              in.restore(snap)
              starved = true
              if (sawEndOfInput) throw new IOException("truncated brotli stream")
          }
        case State.CopyRaw =>
          val n = in.readBytes(dst, off + produced, math.min(remaining, len - produced))
          if (n > 0) {
            appendWindow(dst, off + produced, n)
            produced += n; remaining -= n; progress = true
          } else if (sawEndOfInput && in.isEmpty)
            throw new IOException("truncated brotli stream")
          if (remaining == 0) {
            state = if (islastPending) State.Done else State.BlockHeader
            progress = true
          }
        case State.SkipMetadata =>
          val n = in.skipBytes(remaining)
          if (n > 0) { remaining -= n; progress = true }
          if (remaining == 0) { state = State.BlockHeader; progress = true }
        case _ => ()
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
    islastPending = false
    sawEndOfInput = false
    starved = false
    window = null; windowMask = 0; totalOut = 0
    pendingOut = null; pendingPos = 0
    in.alignToByte()
    while (in.skipBytes(4096) > 0) ()
  }
}
