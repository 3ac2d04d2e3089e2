package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity over two `ARRAY<FLOAT>` embedding columns as a native
  * Catalyst expression with whole-stage codegen — the hot kernel of the
  * similarity/dedup operators. A Scala UDF here would box 64 floats per
  * row per side; this compiles to a primitive loop inside the generated
  * stage, so an ANN scan at 100 TB stays in one codegen'd pipeline.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two ARRAY<FLOAT> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  final double $x = (double) $a.getFloat($i);
         |  final double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = ($na == 0.0 || $nb == 0.0)
         |  ? 0.0 : $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Symmetric-int8-quantized dot product of two `ARRAY<FLOAT>` vectors as
  * ONE codegen'd primitive loop: each side is scaled to
  * `q = floor(x·127/absmax + 0.5)` (absmax-zero vectors quantize to all
  * zeros) and the integer dot is returned as LONG. Replaces s04's
  * interpreted `aggregate(zip_with(transform(...)))` chain — per-pair
  * lambda dispatch on the candidate-scoring hot path — with the same
  * arithmetic (bit-equal: IEEE double scale, floor, long product-sum in
  * index order), so the DuckDB oracle is unchanged.
  */
case class Int8Dot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"int8_dot expects two ARRAY<FLOAT> arguments, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "int8_dot"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var sa = 0.0; var sb = 0.0
    var i = 0
    while (i < a.numElements()) {
      val x = math.abs(a.getFloat(i).toDouble); if (x > sa) sa = x; i += 1
    }
    i = 0
    while (i < b.numElements()) {
      val y = math.abs(b.getFloat(i).toDouble); if (y > sb) sb = y; i += 1
    }
    var dot = 0L
    i = 0
    while (i < n) {
      val qa = if (sa == 0.0) 0L
        else math.floor(a.getFloat(i).toDouble * 127.0 / sa + 0.5).toLong
      val qb = if (sb == 0.0) 0L
        else math.floor(b.getFloat(i).toDouble * 127.0 / sb + 0.5).toLong
      dot += qa * qb
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val x = ctx.freshName("x")
      val dot = ctx.freshName("dot")
      val qa = ctx.freshName("qa")
      val qb = ctx.freshName("qb")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $sa = 0.0; double $sb = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  final double $x = java.lang.Math.abs((double) $a.getFloat($i));
         |  if ($x > $sa) $sa = $x;
         |}
         |for (int $i = 0; $i < $b.numElements(); $i++) {
         |  final double $x = java.lang.Math.abs((double) $b.getFloat($i));
         |  if ($x > $sb) $sb = $x;
         |}
         |long $dot = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  final long $qa = ($sa == 0.0) ? 0L
         |    : (long) java.lang.Math.floor((double) $a.getFloat($i) * 127.0 / $sa + 0.5);
         |  final long $qb = ($sb == 0.0) ? 0L
         |    : (long) java.lang.Math.floor((double) $b.getFloat($i) * 127.0 / $sb + 0.5);
         |  $dot += $qa * $qb;
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object VectorOps {
  /** Idempotently register SQL-callable vector functions on the session (a
    * guard, not create-or-replace, so repeated query construction leaves
    * the registry untouched and warning-free). */
  def register(spark: SparkSession): Unit =
    GraftExtensions.register(spark, "cosine_sim", "int8_dot")

  /** Column-API handle (registers on first use). */
  def cosineSim(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("cosine_sim", a, b)
  }

  /** Column-API handle for [[Int8Dot]] (registers on first use). */
  def int8Dot(spark: SparkSession, a: Column, b: Column): Column = {
    register(spark)
    call_function("int8_dot", a, b)
  }
}
