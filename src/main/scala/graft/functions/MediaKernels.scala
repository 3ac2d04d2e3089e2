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
