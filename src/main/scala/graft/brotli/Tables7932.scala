package graft.brotli

/** RFC 7932 constant tables shared by encoder and decoder (§5: insert and
  * copy length codes; §5.3 command-code cell LUTs; §3.5 code-length-code
  * machinery). */
object Tables7932 {

  /** Insert length codes: (base, extraBits), code 0..23 (RFC §5.1). */
  val InsertBase: Array[Int] = Array(
    0, 1, 2, 3, 4, 5, 6, 8, 10, 14, 18, 26, 34, 50, 66, 98,
    130, 194, 322, 578, 1090, 2114, 6210, 22594)
  val InsertExtra: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4, 5, 5,
    6, 7, 8, 9, 10, 12, 14, 24)

  /** Copy length codes: (base, extraBits), code 0..23 (RFC §5.1). */
  val CopyBase: Array[Int] = Array(
    2, 3, 4, 5, 6, 7, 8, 9, 10, 12, 14, 18, 22, 30, 38, 54,
    70, 102, 134, 198, 326, 582, 1094, 2118)
  val CopyExtra: Array[Int] = Array(
    0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 2, 2, 3, 3, 4, 4,
    5, 5, 6, 7, 8, 9, 10, 24)

  /** Command-code cell LUTs (RFC §5.3): cells 0..8 for explicit-distance
    * codes (cmd >= 128, cell = (cmd >> 6) - 2); cells 0..1 double as the
    * implicit-distance-0 zone (cmd < 128, cell = cmd >> 6). */
  val InsertRangeLut: Array[Int] = Array(0, 0, 8, 8, 0, 16, 8, 16, 16)
  val CopyRangeLut: Array[Int] = Array(0, 8, 0, 8, 16, 0, 16, 8, 16)

  /** Decompose a command code (RFC §5.3). Returns
    * (insertCode, copyCode, impliedDistanceZero). */
  def unpackCommand(cmd: Int): (Int, Int, Boolean) = {
    val implied = cmd < 128
    val cell = if (implied) cmd >> 6 else (cmd >> 6) - 2
    val icode = InsertRangeLut(cell) + ((cmd >> 3) & 7)
    val ccode = CopyRangeLut(cell) + (cmd & 7)
    (icode, ccode, implied)
  }

  /** Compose a command code for (insertCode, copyCode) with explicit
    * distance (the zone our encoder uses). */
  def packCommandExplicit(icode: Int, ccode: Int): Int = {
    val insHigh = icode >> 3
    val copyHigh = ccode >> 3
    val cell = (0 until 9).find(c =>
      InsertRangeLut(c) == insHigh * 8 && CopyRangeLut(c) == copyHigh * 8)
      .getOrElse(throw new IllegalArgumentException(s"no cell for $icode/$ccode"))
    128 + 64 * cell + ((icode & 7) << 3) + (ccode & 7)
  }

  /** Smallest insert code whose range contains len. */
  def insertCodeFor(len: Int): Int = {
    var c = InsertBase.length - 1
    while (c > 0 && InsertBase(c) > len) c -= 1
    c
  }

  /** Order in which code-length-code lengths are transmitted (§3.5). */
  val CodeLengthCodeOrder: Array[Int] =
    Array(1, 2, 3, 4, 0, 5, 17, 6, 16, 7, 8, 9, 10, 11, 12, 13, 14, 15)

  /** Fixed prefix code for the code-length-code lengths (§3.5):
    * symbol -> (bit pattern MSB-first, length). */
  val CodeLengthCodeLengths: Array[Int] = Array(2, 4, 3, 2, 2, 4)

  /** Distance ring buffer initial state (§4), oldest-first: the initial
    * "last distance" is 4, then 11, 15, 16 (verified against libbrotli —
    * dcode 0→4, 1→11, 2→15, 3→16). The ring persists stream-wide. */
  val InitialDistanceRing: Array[Int] = Array(16, 15, 11, 4)

  /** Short distance codes 4..15 (§4): delta applied to the last
    * (codes 4..9) or second-to-last (codes 10..15) ring distance. */
  val ShortCodeDelta: Array[Int] = Array(-1, 1, -2, 2, -3, 3)

  /** Number of distance codes (§4); ndirect is the SHIFTED value
    * NDIRECT = field << NPOSTFIX. */
  def numDistanceCodes(npostfix: Int, ndirect: Int): Int =
    16 + ndirect + (48 << npostfix)

  /** Block count codes (§6): 26 symbols, base + extra bits. */
  val BlockLengthBase: Array[Int] = Array(
    1, 5, 9, 13, 17, 25, 33, 41, 49, 65, 81, 97, 113, 145, 177, 209,
    241, 305, 369, 497, 753, 1265, 2289, 4337, 8433, 16625)
  val BlockLengthExtra: Array[Int] = Array(
    2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5,
    6, 6, 7, 8, 9, 10, 11, 12, 13, 24)

  val CommandAlphabetSize = 704
  val LiteralAlphabetSize = 256
  val MaxCodeLength = 15
}
