package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** Signed-random-projection LSH bucket keys as a native Catalyst
  * expression with whole-stage codegen — the shared candidate-generation
  * kernel of d05 (embedding near-dup), s02 (ANN LSH) and s04 (int8
  * re-rank). For each of [[SrpLsh.Tables]] hash tables it computes
  * [[SrpLsh.BitsPerTable]] hyperplane sign bits and packs them with the
  * table id into one long: `(t << BitsPerTable) | bucket` — the same
  * equivalence classes as a `(t, bucket)` struct, in a primitive join key.
  *
  * The interpreted predecessor (nested `aggregate(zip_with(...))`
  * higher-order functions) evaluated ~4k lambda closures per row; this
  * compiles to one primitive triple loop inside the generated stage, so
  * at 100 TB the bucket computation stays a narrow, SIMD-able map over
  * the corpus scan. The dot accumulates in ascending index order
  * (left-associated, starting at 0.0) — bit-identical to the old fold
  * and to the oracle's explicit `w1*x1 + w2*x2 + ...` SQL chain, which
  * is what keeps d05/s02/s04 hash-verified.
  *
  * Vectors shorter than [[SrpLsh.Dim]] use only their own elements
  * (missing dims contribute 0 to every dot) — the oracle's
  * `PortableSql.weightedSumSql` COALESCEs out-of-range terms to 0.0 to
  * match, so the bit-identical claim holds for any length, not just
  * exactly-Dim vectors. Elements must be non-null.
  */
case class SrpBuckets(child: Expression,
    bits: Int = SrpLsh.BitsPerTable) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_buckets expects ARRAY<FLOAT>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "srp_buckets"

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), SrpLsh.Dim)
    val planes = SrpLsh.flatPlanesFor(bits)
    val out = new Array[Long](SrpLsh.Tables)
    var t = 0
    while (t < SrpLsh.Tables) {
      var bucket = 0L
      var j = 0
      while (j < bits) {
        val base = (t * bits + j) * SrpLsh.Dim
        var dot = 0.0
        var i = 0
        while (i < n) {
          dot += a.getFloat(i).toDouble * planes(base + i)
          i += 1
        }
        if (dot >= 0.0) bucket |= (1L << j)
        j += 1
      }
      out(t) = (t.toLong << bits) | bucket
      t += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val planes = ctx.addReferenceObj("srpPlanes", SrpLsh.flatPlanesFor(bits), "double[]")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val base = ctx.freshName("base")
      val bucket = ctx.freshName("bucket")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), ${SrpLsh.Dim});
         |final long[] $out = new long[${SrpLsh.Tables}];
         |for (int $t = 0; $t < ${SrpLsh.Tables}; $t++) {
         |  long $bucket = 0L;
         |  for (int $j = 0; $j < $bits; $j++) {
         |    final int $base = ($t * $bits + $j) * ${SrpLsh.Dim};
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $n; $i++) {
         |      $dot += (double) $a.getFloat($i) * $planes[$base + $i];
         |    }
         |    if ($dot >= 0.0) $bucket |= (1L << $j);
         |  }
         |  $out[$t] = ((long) $t << $bits) | $bucket;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Multi-table SRP-LSH constants + hyperplanes, shared by the codegen'd
  * [[SrpBuckets]] kernel and the generated oracle SQL (the planes embed
  * as Double.toString literals, which round-trip exactly). A vector
  * lands in one bucket per table; two vectors are candidates if they
  * collide in ANY table. Recall at cos θ is 1-(1-p^k)^L with p = 1-θ/π —
  * at cos 0.9 (θ≈25.8°), 8 tables × 8 bits gives ~0.94, vs ~0.08 for a
  * single 16-bit table.
  *
  * Scaling note: expected bucket occupancy is N/2^BitsPerTable, so
  * per-query candidate cost grows linearly with the corpus at fixed
  * bits (the r8 sf1 datapoint: s02 ran ~5× for 10× data). BitsPerTable
  * is THE dial — grow it with log₂(N) to hold occupancy (and recall,
  * via matching Tables growth) constant. The dial is exercised:
  * `s10_ann_lsh_scaled` runs the [[ScaledBits]] configuration,
  * hash-verified against its own `srpKeysSql(bits)` plane expansion;
  * the default stays fixed so the shipped d05/s02/s04/s05 oracles keep
  * their exact plane literals.
  */
object SrpLsh {
  val Tables = 8
  val BitsPerTable = 8
  /** The at-scale index configuration (s10): +3 bucket bits = 8× lower
    * expected occupancy — the dial a bigger corpus turns. */
  val ScaledBits = 11
  val Dim = 64

  /** Seed-7 gaussian hyperplanes for a given bits-per-table config.
    * bits <= [[BitsPerTable]] reproduces the original plane sequence
    * exactly (the shipped d05/s02/s04/s05 oracles embed those
    * literals); bits above it REFINE the stock config — table t's first
    * BitsPerTable planes are the stock planes verbatim and only the
    * extra bits come from a continuation of the same seed-7 stream. A
    * scaled-bits collision therefore IMPLIES the stock collision in the
    * same table, so every scaled candidate set is a subset of the stock
    * one — the s11-vs-s05 recall bound is structural, not an accident
    * of the current corpus. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[Int, IndexedSeq[Array[Double]]]()
  def planesFor(bits: Int): IndexedSeq[Array[Double]] =
    planeCache.computeIfAbsent(bits, { b =>
      val rnd = new scala.util.Random(7)
      val nBase = math.min(b, BitsPerTable)
      val base =
        IndexedSeq.fill(Tables * nBase)(Array.fill(Dim)(rnd.nextGaussian()))
      if (b <= BitsPerTable) base
      else {
        val nExtra = b - BitsPerTable
        val extra =
          IndexedSeq.fill(Tables * nExtra)(Array.fill(Dim)(rnd.nextGaussian()))
        IndexedSeq.tabulate(Tables * b) { i =>
          val t = i / b
          val j = i % b
          if (j < BitsPerTable) base(t * BitsPerTable + j)
          else extra(t * nExtra + (j - BitsPerTable))
        }
      }
    })
  private[functions] def flatPlanesFor(bits: Int): Array[Double] =
    planesFor(bits).flatten.toArray

  val planes: IndexedSeq[Array[Double]] = planesFor(BitsPerTable)

  /** Idempotently register the SQL-callable kernel on the session (a
    * guard, not create-or-replace, so repeated query construction leaves
    * the registry untouched and warning-free). */
  def register(spark: SparkSession): Unit =
    GraftExtensions.register(spark, "srp_buckets")

  /** `ARRAY<BIGINT>` of packed `(table << BitsPerTable) | bucket` keys
    * for an `ARRAY<FLOAT>` embedding column (registers on first use). */
  def buckets(spark: SparkSession, emb: Column): Column = {
    register(spark)
    call_function("srp_buckets", emb)
  }

  /** The [[ScaledBits]] configuration (s10's at-scale index). */
  def bucketsScaled(spark: SparkSession, emb: Column): Column = {
    GraftExtensions.register(spark, "srp_buckets_scaled")
    call_function("srp_buckets_scaled", emb)
  }
}
