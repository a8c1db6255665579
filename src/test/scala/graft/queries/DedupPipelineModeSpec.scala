package graft.queries

/** №179 dedup_pipeline_mp: the pair-finding mode contract (the
  * line_dedup auto/shuffle precedent). The two modes differ only in
  * candidate GENERATION — PPJoin prefix filtering vs №173's banded
  * multiprobe — and both verify candidates with the same exact τ=3/5
  * test, so on a corpus where multiprobe recall is 1.0 (measured by
  * №173 on the gate corpora) the pipelines must be ROW-IDENTICAL.
  * Equality here is measured, not assumed: the driver oracle for the
  * mp row independently rebuilds the multiprobe chain, so a recall
  * regression surfaces in BOTH places. */
class DedupPipelineModeSpec extends graft.SparkSpec {

  test("ppjoin and minhash_mp pipelines are row-identical on the gate corpus; default mode is ppjoin") {
    val pp = CurationQueries.dedupPipelineWith(spark, sf, "ppjoin").collect().toSeq
    val mp = CurationQueries.dedupPipelineWith(spark, sf, "minhash_mp").collect().toSeq
    assert(pp.nonEmpty)
    assert(pp == mp,
      s"modes diverged: ppjoin ${pp.length} rows, minhash_mp ${mp.length} rows; " +
        s"first diff: ${pp.zip(mp).find { case (a, b) => a != b }}")
    // the default mode is the conf default
    val dflt = CurationQueries.dedupPipeline(spark, sf).collect().toSeq
    assert(dflt == pp, "default pipeline is not the ppjoin mode")
    // and an unknown mode fails loudly, never silently falls back
    intercept[IllegalArgumentException] {
      CurationQueries.dedupPipelineWith(spark, sf, "bogus").collect()
    }
  }
}
