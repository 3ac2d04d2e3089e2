package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** The 60-bit average-hash (aHash) of a binary media payload as ONE
  * native Catalyst expression: split the byte stream into
  * [[AHash.Bits]] contiguous blocks, set bit b when block b's mean
  * byte value reaches the payload's overall mean. This is the
  * block-mean perceptual-hash family used for image near-dup (aHash
  * over pixel blocks); here it runs over the opaque media BYTES the
  * multimodal ops carry (decode is stubbed in this env — see
  * `ops/Multimodal.scala`), which preserves exactly the property the
  * pipeline needs: byte-level-similar payloads get Hamming-close
  * signatures.
  *
  * The mean comparison is exact integer cross-multiplication
  * (`blockSum · n ≥ totalSum · blockLen`), so the signature is
  * bit-reproducible and the DuckDB oracle can replicate it (m04 is
  * hash-verified, not rows-only). Products stay inside a signed long
  * for payloads below ~256 MiB (255 · n · blockLen < 2⁶³). Output
  * BIGINT, NULL for empty payloads. Same narrow no-shuffle shape as
  * [[SimHashSig]]: nothing is exchanged until the 15-bit band join.
  */
case class AHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ahash_sig expects BINARY, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ahash_sig"

  override def nullSafeEval(input: Any): Any =
    AHash.signature(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sig")
      s"""
         |final java.lang.Long $r = graft.functions.AHash.signature($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** aHash constants + the compiled kernel (static forwarder for
  * generated code). 60 bits — not 64 — so every downstream band mask,
  * XOR, and the oracle's bit-assembly sum stay inside a signed 64-bit
  * long under ANSI overflow checking (the same reasoning as SimHash). */
object AHash {
  val Bits = 60

  /** Boxed so generated code can null-check; null for empty payloads.
    * Block b covers byte indices [b·n/60, (b+1)·n/60) — integer
    * bounds, so blocks tile the payload exactly; a block that rounds
    * to zero length contributes a 0 bit. */
  def signature(bytes: Array[Byte]): java.lang.Long = {
    val n = bytes.length
    if (n == 0) return null
    var total = 0L
    var i = 0
    while (i < n) { total += bytes(i) & 0xff; i += 1 }
    var sig = 0L
    var b = 0
    while (b < Bits) {
      val lo = (b.toLong * n / Bits).toInt
      val hi = ((b + 1).toLong * n / Bits).toInt
      if (hi > lo) {
        var s = 0L
        i = lo
        while (i < hi) { s += bytes(i) & 0xff; i += 1 }
        if (s * n >= total * (hi - lo)) sig |= 1L << b
      }
      b += 1
    }
    sig
  }

  /** Idempotently register the SQL-callable kernel. */
  def register(spark: SparkSession): Unit =
    GraftExtensions.register(spark, "ahash_sig")

  /** BIGINT aHash signature of a binary column. */
  def sigCol(spark: SparkSession, media: Column): Column = {
    register(spark)
    call_function("ahash_sig", media)
  }
}

/** m04's deterministic media-payload synthesis as ONE native codegen
  * expression over doc_id. Semantics are bit-identical to the SQL HOF
  * route (pinned by MediaKernelSpec): byte j of doc d is
  * `32 + h60(d%120 ":" blockIdx) % 90 + (d·7 + j) % 3` with
  * `blockIdx = (j·60) div n`, `n = 600 + (d%7)·60` — 60 intensity
  * blocks keyed by the doc's visual group plus per-byte noise.
  *
  * Why a kernel and not the `transform(sequence(...))` HOF: the HOF
  * evaluates an interpreted lambda — including an md5 — PER BYTE
  * (~900 per row). The block levels depend only on (group, blockIdx):
  * 120 × 60 values total, cached here per-JVM, so steady-state
  * synthesis is a pure primitive loop with zero hashing. This is the
  * library's stub-decode stand-in (no image codec in this env); a real
  * deployment replaces this expression with the actual decode kernel
  * and the rest of the m04 pipeline is unchanged.
  */
case class M04Payload(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"m04_payload expects BIGINT doc_id, got ${other.catalogString}")
  }
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = child.nullable
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "m04_payload"

  override def nullSafeEval(input: Any): Any =
    M04Synth.payload(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.M04Synth.payload($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The compiled m04 payload kernel + its per-group block-level cache
  * (static forwarder for generated code). */
object M04Synth {
  private val Groups = 120
  private val Blocks = 60

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** h60 of a string: top 60 bits of its md5 — identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)` (MinHashKernels.h60). */
  private def h60(s: String): Long = {
    val md = md5.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var k = 0
    while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
    (h << 4) | ((d(7) & 0xffL) >>> 4)
  }

  // Lazily filled 120 × 60 level table: levels depend only on
  // (group, blockIdx), never on the row. Volatile-free double-checked
  // fill is safe — entries are idempotent pure values.
  private val levels = new java.util.concurrent.ConcurrentHashMap[Long, Array[Int]]
  private def groupLevels(group: Long): Array[Int] =
    levels.computeIfAbsent(group, g =>
      Array.tabulate(Blocks)(b => (h60(s"$g:$b") % 90).toInt))

  /** The synthesized payload of doc_id: n = 600 + (doc_id%7)·60 bytes,
    * byte j = 32 + level(blockOf(j)) + (doc_id·7 + j) % 3. */
  def payload(docId: Long): Array[Byte] = {
    val n = (600 + (docId % 7) * 60).toInt
    val lv = groupLevels(docId % Groups)
    val out = new Array[Byte](n)
    val noiseBase = docId * 7
    var j = 0
    while (j < n) {
      out(j) = (32 + lv(j * Blocks / n) + ((noiseBase + j) % 3)).toByte
      j += 1
    }
    out
  }

  /** Idempotently register the SQL-callable kernel. */
  def register(spark: SparkSession): Unit =
    GraftExtensions.register(spark, "m04_payload")

  /** BINARY synthesized payload of a BIGINT doc_id column. */
  def payloadCol(spark: SparkSession, docId: Column): Column = {
    register(spark)
    call_function("m04_payload", docId)
  }
}
