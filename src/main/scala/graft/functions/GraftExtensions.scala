package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** `spark.sql.extensions` entry point: injects every graft kernel as a
  * session-scoped SQL function, so a pure-SQL user gets the whole
  * custom-expression surface without touching the Scala API:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.functions.GraftExtensions ...
  *   spark.sql("SELECT doc_id, simhash_sig(lower(text)) FROM docs")
  * }}}
  *
  * The same builders back the `createOrReplaceTempFunction` paths the
  * Scala column helpers use (VectorOps/SrpLsh/MinHash/SimHash/
  * TextKernels `register`), so both routes resolve to identical
  * codegen'd expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
        builder))
    }
    // whole-operator extensions: the native top-k-per-key planner rule
    // (graft.plans.TopKPerKey) plus the optimizer rewrite that turns
    // SQL's `row_number() <= k` window filters into it; programmatic
    // sessions get the same pair via GraftPlans.install
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKWindowRewrite)
  }
}

object GraftExtensions {

  private def intLit(fn: String, arg: String, e: Expression): Int = e match {
    case f if f.foldable &&
        f.dataType == org.apache.spark.sql.types.IntegerType =>
      f.eval(InternalRow.empty).asInstanceOf[Int]
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be a constant INT literal, got ${other.sql}")
  }

  /** Idempotently install kernels (all by default, or the named subset)
    * into the session's function registry. The SINGLE source of truth
    * for name → builder: the `spark.sql.extensions` route above and the
    * Scala column helpers (`VectorOps`/`SrpLsh`/`MinHash`/`SimHash`/
    * `TextKernels.register`) both resolve through [[functions]], so the
    * two routes can never drift apart. The existence guard (rather than
    * create-or-replace) keeps repeated query construction registry-
    * mutation-free and warning-free. */
  def register(spark: org.apache.spark.sql.SparkSession, names: String*): Unit = {
    val reg = spark.sessionState.functionRegistry
    val wanted =
      if (names.isEmpty) functions
      else functions.filter(f => names.contains(f._1))
    wanted.foreach { case (name, _, builder) =>
      if (!reg.functionExists(FunctionIdentifier(name)))
        reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** (name, usage, builder) for every SQL-callable kernel. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("cosine_sim",
      "_FUNC_(a, b) - exact cosine similarity of two float vectors",
      e => CosineSimilarity(e(0), e(1))),
    ("int8_dot",
      "_FUNC_(a, b) - symmetric-int8-quantized integer dot product",
      e => Int8Dot(e(0), e(1))),
    ("srp_buckets",
      "_FUNC_(v) - packed signed-random-projection LSH bucket keys",
      e => SrpBuckets(e.head)),
    ("srp_buckets_scaled",
      "_FUNC_(v) - SRP-LSH bucket keys at the at-scale (ScaledBits) config",
      e => SrpBuckets(e.head, SrpLsh.ScaledBits)),
    ("minhash_sig",
      "_FUNC_(text) - 128-permutation MinHash signature over word 3-gram shingles",
      e => MinHashSig(e.head)),
    ("minhash_agree",
      "_FUNC_(sig_a, sig_b) - positions at which two MinHash signatures agree",
      e => MinHashAgree(e(0), e(1))),
    ("simhash_sig",
      "_FUNC_(text) - 60-bit SimHash signature from token-frequency bit votes",
      e => SimHashSig(e.head)),
    ("ahash_sig",
      "_FUNC_(media) - 60-bit block-mean average-hash of a binary payload",
      e => AHashSig(e.head)),
    ("m04_payload",
      "_FUNC_(doc_id) - deterministic synthesized media payload (stub decode)",
      e => M04Payload(e.head)),
    ("repetition_stats",
      "_FUNC_(text) - (n_2grams, dup_2gram_frac, top_2gram_frac) repetition stats",
      e => RepetitionStats(e.head)),
    ("shingle_set",
      "_FUNC_(text) - distinct word 3-gram shingles in first-appearance order",
      e => ShingleSet(e.head)),
    ("winnow_fp",
      "_FUNC_(text) - winnowing fingerprint summary (n_kgrams, n_fp, fp_min, fp_xor)",
      e => WinnowFp(e.head)),
    ("winnow_fp_sample",
      "_FUNC_(text, mod, minKeep) - mod-sampled winnowing fingerprint set",
      e => WinnowFpSample(e.head,
        intLit("winnow_fp_sample", "mod", e(1)),
        intLit("winnow_fp_sample", "minKeep", e(2)))),
    ("substr_window_keys",
      "_FUNC_(text, n) - rolling n-token window keys (exact-substring dedup)",
      e => SubstrWindowKeys(e.head,
        intLit("substr_window_keys", "n", e(1)))))
}
