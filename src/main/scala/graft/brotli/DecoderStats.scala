package graft.brotli

/** Opt-in stream-shape counters for the decoder (dev analysis only —
  * enabled by -Dgraft.decode.stats; zero cost otherwise). Used to
  * compare OUR encoder's stream shape with native libbrotli's on the
  * same payload: command count, insert/copy masses, distance classes. */
private[graft] object DecoderStats {
  val enabled: Boolean = java.lang.Boolean.getBoolean("graft.decode.stats")
  var nCmds = 0L
  var litBytes = 0L
  var copyBytes = 0L
  var nRing = 0L // implied or ring-derived distance
  var nExplicit = 0L
  var nDict = 0L
  var sumLogDist = 0.0
  private val prev = new java.util.ArrayDeque[Integer]()

  var distExtraBits = 0L

  def command(ilen: Int, clen: Int): Unit = {
    nCmds += 1; litBytes += ilen; copyBytes += clen
  }

  def params(npostfix: Int, ndirect: Int, nbltypesL: Int, nbltypesI: Int,
      nbltypesD: Int, ntreesL: Int, ntreesD: Int): Unit = if (enabled)
    System.err.println(s"[decstats:params] npostfix=$npostfix ndirect=$ndirect " +
      s"nbltypes L/I/D=$nbltypesL/$nbltypesI/$nbltypesD ntreesL=$ntreesL ntreesD=$ntreesD")

  def distance(implied: Boolean, dist: Int, dict: Boolean): Unit = {
    if (dict) { nDict += 1; return }
    // classify vs a running set of the last 4 distances (ring proxy)
    val hit = implied || prev.contains(Integer.valueOf(dist))
    if (hit) nRing += 1 else nExplicit += 1
    sumLogDist += math.log(math.max(dist, 1)) / math.log(2)
    prev.addFirst(dist)
    if (prev.size > 4) prev.removeLast()
  }

  def report(tag: String): Unit = if (enabled) {
    val nd = nRing + nExplicit
    System.err.println(
      f"[decstats:$tag] cmds=$nCmds%d lit=$litBytes%d copy=$copyBytes%d " +
      f"ringish=$nRing%d explicit=$nExplicit%d dict=$nDict%d " +
      f"avgLog2Dist=${if (nd > 0) sumLogDist / nd else 0}%.2f " +
      f"distExtra=${distExtraBits / 8}%dB")
    nCmds = 0; litBytes = 0; copyBytes = 0
    nRing = 0; nExplicit = 0; nDict = 0; sumLogDist = 0.0
    distExtraBits = 0
    prev.clear()
  }
}
