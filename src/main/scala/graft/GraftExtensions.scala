package graft

import graft.functions.{AesCtrCrypt, CosineSim, NfcNormalize, SimHash60, SimHash96, ValidateRecord}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-facing registration of graft's native expressions, so `spark.sql`
  * users get the same operators as the Column API:
  *
  *   spark.sql("SELECT aes_ctr(data, key, iv) ...")
  *   spark.sql("SELECT validate_record(payload, row_key).record ...")
  *   spark.sql("SELECT simhash60(tokens) ...")
  *
  * Two entry points: `withExtensions` for session construction
  * (`.config("spark.sql.extensions", "graft.GraftExtensions")` works too),
  * and `register` for an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.definitions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
    // tier-(c) whole-operator extension: grouped top-k logical node,
    // pruning rule and two-phase physical strategy (graft.plans.GroupedTopK)
    ext.injectOptimizerRule(_ => graft.plans.GroupedTopKPruning)
    ext.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
  }
}

object GraftExtensions {
  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "", "", "", "", "4.0.0", "", "built-in")

  val definitions: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("aes_ctr", info("aes_ctr", "aes_ctr(data, key, iv) - AES/CTR/NoPadding (symmetric)"),
      (args: Seq[Expression]) => AesCtrCrypt(args(0), args(1), args(2))),
    ("validate_record", info("validate_record", "validate_record(payload, row_key_id) - struct(record, manifest_id, original_id)"),
      (args: Seq[Expression]) => ValidateRecord(args(0), args(1))),
    ("simhash60", info("simhash60", "simhash60(tokens) - 60-bit SimHash fingerprint of a token array"),
      (args: Seq[Expression]) => SimHash60(args(0))),
    ("simhash96", info("simhash96", "simhash96(tokens) - 96-bit SimHash fingerprint as struct(hi, lo) 48-bit halves"),
      (args: Seq[Expression]) => SimHash96(args(0))),
    ("cosine_sim", info("cosine_sim", "cosine_sim(a, b) - cosine similarity of two float arrays (fused single-pass)"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))),
    ("nfc_normalize", info("nfc_normalize", "nfc_normalize(str) - Unicode NFC normalization"),
      (args: Seq[Expression]) => NfcNormalize(args(0))),
    ("misra_gries", info("misra_gries",
      "misra_gries(item, k) - Misra-Gries frequent-items sketch: array<struct<tok, est>> of <= k candidates"),
      (args: Seq[Expression]) => graft.functions.MisraGries(args(0), intLit(args(1), "misra_gries"))),
    ("top_k_by_score", info("top_k_by_score",
      "top_k_by_score(score, id, k) - bounded-heap grouped top-k: array<struct<score, id>> in rank order"),
      (args: Seq[Expression]) => graft.functions.TopKByScore(args(0), args(1), intLit(args(2), "top_k_by_score"))))

  /** Sketch/heap widths are plan-shaping parameters, not data: require a
    * literal (the aggregate's buffer is sized at planning time). */
  private def intLit(e: Expression, fn: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: k must be an integer literal, got $other")
  }

  /** Register on an already-built session. */
  def register(spark: SparkSession): Unit =
    definitions.foreach { case (name, i, builder) =>
      spark.sessionState.functionRegistry.registerFunction(FunctionIdentifier(name), i, builder)
    }
}
