package graft.queries

import graft.SparkSpec

/** The dedup_embedding scale contract: the production bucket width (≥16
  * bits → 2^16 buckets, within-bucket verify O(n²/2¹⁶)) finds the IDENTICAL
  * near-dup pair set as the proof-size width the driver oracle checks. The
  * injected copies perturb dim 60 only, so any bucket over dims 1..bits<60
  * preserves the pair's shared bucket — recall does not depend on the
  * width, only the candidate-set (cost) does.
  */
class DedupScaleSpec extends SparkSpec {

  test("16- and 24-bit bucketing find the identical pair set as the proof width") {
    val proof = VectorQueries.dedupEmbedding(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(proof.nonEmpty)
    // every injected copy pairs with its original, nothing else at τ=0.99
    assert(proof.forall { case (a, b, _) => b == a + 1000000 && a % 20 == 0 })
    for (bits <- Seq(16, 24)) {
      val scaled = VectorQueries.dedupEmbeddingWith(spark, sf, bits)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(scaled == proof, s"pair set diverged at $bits bits")
    }
  }
}
