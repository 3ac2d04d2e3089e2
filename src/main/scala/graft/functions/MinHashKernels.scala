package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The full MinHash signature of a document as ONE native Catalyst
  * expression: whitespace-tokenize, form word 3-gram shingles, hash each
  * with the portable md5-derived h60 (PortableSql), and keep the minimum
  * of each of the [[MinHash.NumHashes]] affine permutations
  * `(a·h + b) mod P`. Output `ARRAY<BIGINT>` of length NumHashes, or
  * NULL for documents with fewer than 3 tokens (no shingles — exactly
  * the rows the old explode+groupBy build dropped).
  *
  * This replaces d03's interpreted shingle HOF chain + explode +
  * 128-column min aggregation. Profiling at sf0.1 put ~7.5s of d03's
  * 8.3s in that chain (the per-token lambda dispatch, not the hashing);
  * the kernel does the same work as a compiled per-row loop, and — the
  * structural win — signature building becomes a narrow map with NO
  * shuffle: at 100 TB nothing is exchanged until the (doc, 128-long)
  * signatures hit the band-key bucket join.
  *
  * Permuted minima are multiplicity-insensitive, so the kernel skips the
  * shingle `array_distinct` the Jaccard ops need — min over the shingle
  * multiset equals min over the set, which keeps it bit-identical to the
  * DuckDB oracle's `list_min` over distinct shingles.
  */
case class MinHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    MinHash.signature(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.MinHash.signature($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Number of positions at which two MinHash signatures agree — the
  * estimated-Jaccard numerator, compiled instead of the interpreted
  * `aggregate(zip_with(...))` per candidate pair. */
case class MinHashAgree(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"minhash_agree expects two ARRAY<BIGINT> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_agree"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** The 60-bit SimHash signature of a document as ONE native Catalyst
  * expression: whitespace-tokenize, hash each token with the portable
  * h60, and take the sign of the per-bit ±1 frequency-weighted vote
  * tally. Output BIGINT, or NULL for documents with no tokens (exactly
  * the rows the explode+groupBy build dropped).
  *
  * This replaces d04's token explode + 60-column conditional-sum
  * aggregation: signature building becomes a narrow map with NO shuffle
  * — at 100 TB nothing is exchanged until the (doc, 60-bit sig) rows
  * hit the 15-bit band-key join. Same structural rewrite as
  * [[MinHashSig]] (d03) and `SrpBuckets` (s02/s04/d05).
  */
case class SimHashSig(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig expects STRING, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any =
    SimHash.signature(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("sig")
      s"""
         |final java.lang.Long $r = graft.functions.SimHash.signature($c);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** SimHash constants + the compiled signature kernel (static forwarder
  * for generated code). Bit votes are token-frequency weighted (every
  * occurrence votes), matching the explode-based formulation and the
  * DuckDB oracle bit-for-bit. */
object SimHash {
  val Bits = 60

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Boxed so generated code can null-check; null for token-less docs. */
  def signature(s: UTF8String): java.lang.Long = {
    val toks = s.toString.split(" ", -1)
    val votes = new Array[Int](Bits)
    val md = md5.get()
    var any = false
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (!t.isEmpty) {
        any = true
        val h = MinHash.h60(t.getBytes(StandardCharsets.UTF_8), md)
        var j = 0
        while (j < Bits) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    if (!any) return null
    var sig = 0L
    var j = 0
    while (j < Bits) {
      if (votes(j) >= 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** Idempotently register the SQL-callable kernel. */
  def register(spark: SparkSession): Unit =
    GraftExtensions.register(spark, "simhash_sig")

  /** BIGINT SimHash signature of a (lowercased) text column. */
  def sigCol(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("simhash_sig", text)
  }
}

/** MinHash constants + the compiled signature kernel. The affine
  * coefficients are drawn from Random(42) in (a, b) pairs — the same
  * stream the pre-round-6 column pipeline used — and are embedded as
  * literals in the DuckDB oracle, so signatures are hash-verified
  * cross-engine. Static forwarders make the kernel callable from
  * generated Java code.
  */
object MinHash {
  val NumHashes = 128
  val Bands = 32
  val RowsPerBand: Int = NumHashes / Bands
  val P = 2038074743L // prime < 2^31: h, a, b < P keeps a·h+b < 2^62 (ANSI-safe)

  /** (a, b) pairs of the affine permutations `(a·h + b) mod P`. */
  val coefs: IndexedSeq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    IndexedSeq.fill(NumHashes)((rnd.nextInt((P - 1).toInt).toLong + 1L,
      rnd.nextInt(P.toInt).toLong))
  }
  private val as: Array[Long] = coefs.map(_._1).toArray
  private val bs: Array[Long] = coefs.map(_._2).toArray

  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** h60 of a string: value of the first 15 hex chars of its md5 — the
    * top 60 bits of the digest, byte-order identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)`. */
  private[functions] def h60(bytes: Array[Byte], md: MessageDigest): Long = {
    md.reset()
    val d = md.digest(bytes)
    var h = 0L
    var k = 0
    while (k < 7) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
    (h << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** The kernel behind [[MinHashSig]]: null for <3 tokens, else the
    * NumHashes-long signature over word-3-gram shingles. Token split
    * matches Spark's `split(text, " ")` + non-empty filter. */
  def signature(s: UTF8String): ArrayData = {
    val toks = s.toString.split(" ", -1)
    var nTok = 0
    var i = 0
    while (i < toks.length) {
      if (!toks(i).isEmpty) { toks(nTok) = toks(i); nTok += 1 }
      i += 1
    }
    if (nTok < 3) return null
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val md = md5.get()
    i = 0
    while (i <= nTok - 3) {
      val shingle = toks(i) + " " + toks(i + 1) + " " + toks(i + 2)
      val h = h60(shingle.getBytes(StandardCharsets.UTF_8), md) % P
      var j = 0
      while (j < NumHashes) {
        val v = (h * as(j) + bs(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(mins)
  }

  /** Idempotently register both SQL-callable kernels on the session. */
  def register(spark: SparkSession): Unit =
    GraftExtensions.register(spark, "minhash_sig", "minhash_agree")

  /** `ARRAY<BIGINT>` MinHash signature of a (lowercased) text column. */
  def sigCol(spark: SparkSession, text: Column): Column = {
    register(spark)
    call_function("minhash_sig", text)
  }

  /** Agreement count of two signature columns. */
  def agreeCol(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("minhash_agree", a, b)
  }
}
