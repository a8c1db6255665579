package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №145 embedding_drift's 38-digit arithmetic (the r10 ab_test overflow
  * discipline applied to the audit's worst site): the drift ratio
  * multiplies per-half component SUMS by the other half's VECTOR COUNT —
  * |sum| ≤ n·10⁴, so the product grows as n²·10⁴ and exits BIGINT range
  * once n exceeds ~3·10⁷ vectors with saturated components (a 100 TB
  * vector store holds 10¹⁰-10¹¹). The spec proves on constructible
  * magnitudes that the BIGINT form WRAPS (produces a wrong, possibly
  * negative ratio) while the shipped DECIMAL(38,0) expression matches
  * exact BigInt arithmetic. */
class DriftOverflowSpec extends SparkSpec {
  import spark.implicits._

  // the provoked ANSI overflow IS a task failure (retried, fails again)
  override protected def expectsTaskFailures: Boolean = true

  // n = 2^31 vectors per half with near-saturated mean component sums:
  // sum ≈ n·10⁴ ≈ 2.1·10¹³, product sum·n ≈ 4.6·10²² ≫ 2⁶³
  private val n = 2147483648L
  private val sumA = n * 9999L
  private val sumB = n * 9998L

  private def frame = Seq((1, n, n, sumA, sumB))
    .toDF("dim", "n_a", "n_b", "sum_a", "sum_b")

  test("BIGINT cross-multiplication provably overflows at store-scale magnitudes") {
    // Spark 4 runs ANSI mode: the overflow is not a silent wrap but a
    // runtime ARITHMETIC_OVERFLOW — i.e. the BIGINT form KILLS the job
    // the first time a 100 TB store saturates the product. Either way
    // the BIGINT form cannot produce the true ~50 ppm answer; the
    // DECIMAL(38,0) expression is the fix, not a nicety.
    val e = intercept[Exception] {
      frame.select(
        expr("""abs(sum_a * n_b - sum_b * n_a) * 1000000
                DIV greatest(abs(sum_a) * n_b + abs(sum_b) * n_a, 1)""").as("shift_ppm"))
        .head().getLong(0)
    }
    assert(e.getMessage.contains("ARITHMETIC_OVERFLOW") || e.getMessage.contains("overflow"),
      s"expected long-overflow failure at sum·n ≈ 4.6e22, got: ${e.getMessage}")
  }

  test("shipped DECIMAL(38,0) expression ≡ exact BigInt arithmetic at the same magnitudes") {
    val got = frame.select(expr(VectorQueries.driftShiftPpmExpr).as("shift_ppm"))
      .head().getLong(0)
    val exact = (BigInt(sumA) * n - BigInt(sumB) * n).abs * 1000000 /
      ((BigInt(sumA).abs * n + BigInt(sumB).abs * n).max(BigInt(1)))
    assert(BigInt(got) == exact, s"DECIMAL form diverged: got $got want $exact")
    // and on the live corpus the DECIMAL path returns the same 64 rows
    // the oracle hash-checks (schema unchanged: shift_ppm stays BIGINT)
    val live = VectorQueries.embeddingDrift(spark, sf)
    assert(live.schema("shift_ppm").dataType == org.apache.spark.sql.types.LongType)
    assert(live.count() == 64)
  }
}
