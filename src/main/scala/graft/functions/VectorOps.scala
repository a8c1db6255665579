package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector similarity column helpers over `array<float>` embeddings.
  *
  * Cross-engine determinism: elements are cast to DOUBLE before multiply,
  * and the sum is a SEQUENTIAL left fold in array order (`aggregate` HOF) —
  * IEEE-754 gives bit-identical results in any engine that does the same,
  * and the DuckDB oracle mirrors this with list_transform + list_sum.
  * Scores are rounded to 6dp before any threshold/rank so FP noise can
  * never flip a comparison.
  */
object VectorOps {

  /** Sequential-fold dot product (codegen'd higher-order functions). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity rounded to 6dp — native fused-loop expression
    * (see [[graft.functions.CosineSim]]); bit-identical to the HOF
    * formulation `round(dot(a,b)/(norm(a)*norm(b)), 6)` and the oracle. */
  def cosine6(a: Column, b: Column): Column =
    round(graft.functions.CosineSim.cosineSim(a, b), 6)

  /** Sign-bit bucket over the first `bits` dimensions — a deterministic
    * axis-aligned LSH for cosine (both engines compute it identically).
    */
  def signBucket(a: Column, bits: Int): Column =
    (0 until bits).map(i => when(element_at(a, i + 1) > 0f, 1 << i).otherwise(0))
      .reduce((x, y) => x + y)
}
