package graft.brotli

/** Encoder-side index of the RFC 7932 static dictionary (§8) for
  * identity-transform references: per word length, an open-addressed
  * hash table from word content to the smallest word index with those
  * bytes. The zopfli parse (q >= 10) probes it per position and relaxes
  * a DP edge per hit; reference distance construction mirrors the
  * decoder exactly (`BrotliDecoder.scala:399-411`): at absolute stream
  * position P the word (len, idx) under transform T encodes as
  * `min(P, maxWindow) + 1 + (T << sizeBits(len) | idx)`.
  *
  * Built once per JVM (~14k words, a few ms); read-only after that.
  * Reference scope note: the reference codebase wraps libbrotli over
  * JNI and ships no encoder logic — this is derived from the RFC and
  * the repo's own decoder.
  */
private[brotli] object DictIndex {
  import SpecData.{Dictionary, Transforms}

  val MinLen = 4
  val MaxLen = 24

  /** Transform id whose output is the unmodified word (empty prefix and
    * suffix, identity type) — found by probe so no ordering is assumed. */
  val identityId: Int = {
    val probe = Dictionary.word(5, 1)
    (0 until Transforms.count)
      .find(t => java.util.Arrays.equals(Transforms(t, probe), probe))
      .getOrElse(sys.error("static dictionary has no identity transform"))
  }

  /** Affix identity transforms (prefix + unchanged word + suffix), the
    * encoder-matchable set beyond plain identity — 'w ', ' w ', ', w ',
    * 'w. ', ' the w of ', … (47 of the 121). */
  val affixTransforms: Array[(Int, Array[Byte], Array[Byte])] =
    SpecData.Transforms.identityAffixes

  /** Ferment-first affix transforms — the word with its first letter
    * uppercased, optionally affixed ('W', 'W ', ' W ', …). */
  val fermentTransforms: Array[(Int, Array[Byte], Array[Byte])] =
    SpecData.Transforms.fermentFirstAffixes

  /** Word index whose bytes equal buf[p, p+len) EXCEPT the first byte,
    * which matches case-folded (buf holds the uppercase form); `h` must
    * be [[hash]] of the folded range. */
  def lookupFolded(len: Int, h: Long, buf: Array[Byte], p: Int): Int = {
    val mask = capMask(len)
    val hs = slotHash(len)
    val ix = slotIdx(len)
    val data = Dictionary.data
    val base = Dictionary.offsets(len)
    var s = (h.toInt & mask)
    while (ix(s) != 0) {
      if (hs(s) == h) {
        val off = base + (ix(s) - 1) * len
        if (data(off) == (buf(p) ^ 32).toByte &&
            java.util.Arrays.equals(data, off + 1, off + len,
              buf, p + 1, p + len))
          return ix(s) - 1
      }
      s = (s + 1) & mask
    }
    -1
  }

  // per length: pow2 open-addressed parallel arrays; idx slot 0 = empty,
  // stored value = word index + 1
  private val capMask = new Array[Int](MaxLen + 1)
  private val slotHash = new Array[Array[Long]](MaxLen + 1)
  private val slotIdx = new Array[Array[Int]](MaxLen + 1)

  /** FNV-1a 64 over buf[off, off+len). */
  def hash(buf: Array[Byte], off: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < len) {
      h = (h ^ (buf(off + i) & 0xff)) * 0x100000001b3L
      i += 1
    }
    h
  }

  locally {
    var len = MinLen
    while (len <= MaxLen) {
      val n = 1 << Dictionary.sizeBits(len)
      var cap = 4
      while (cap < n * 2) cap <<= 1
      val hs = new Array[Long](cap)
      val ix = new Array[Int](cap)
      val mask = cap - 1
      val data = Dictionary.data
      val base = Dictionary.offsets(len)
      var idx = 0
      while (idx < n) {
        val off = base + idx * len
        val h = hash(data, off, len)
        var s = (h.toInt & mask)
        var placed = false
        while (!placed) {
          if (ix(s) == 0) { hs(s) = h; ix(s) = idx + 1; placed = true }
          else if (hs(s) == h && {
            val o2 = base + (ix(s) - 1) * len
            java.util.Arrays.equals(data, o2, o2 + len, data, off, off + len)
          }) placed = true // duplicate word bytes: keep the smallest index
          else s = (s + 1) & mask
        }
        idx += 1
      }
      capMask(len) = mask
      slotHash(len) = hs
      slotIdx(len) = ix
      len += 1
    }
  }

  /** Word index whose bytes equal buf[p, p+len), or -1. `h` must be
    * [[hash]] of that range. */
  def lookup(len: Int, h: Long, buf: Array[Byte], p: Int): Int = {
    val mask = capMask(len)
    val hs = slotHash(len)
    val ix = slotIdx(len)
    val data = Dictionary.data
    val base = Dictionary.offsets(len)
    var s = (h.toInt & mask)
    while (ix(s) != 0) {
      if (hs(s) == h) {
        val off = base + (ix(s) - 1) * len
        if (java.util.Arrays.equals(data, off, off + len, buf, p, p + len))
          return ix(s) - 1
      }
      s = (s + 1) & mask
    }
    -1
  }
}
