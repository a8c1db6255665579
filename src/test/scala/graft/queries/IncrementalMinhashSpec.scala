package graft.queries

import graft.SparkSpec

/** №187 dedup_incremental_minhash: the persisted-index probing contracts —
  * lookup bills ordered exactly (2 / 2+T / 2+bands·r keys per batch doc),
  * recall monotone in the probe spend, candidates monotone too (a budget
  * can only remove probe keys), and the index is genuinely shared (same
  * row count in every mode). */
class IncrementalMinhashSpec extends SparkSpec {

  test("lookup bills exact, recall and candidates monotone across probe modes") {
    val rows = HashDedup.dedupIncrementalMinhash(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("base_only", "mp_budget", "mp_full"))
    def lookups(m: String) = rows(m).getLong(2)
    def cand(m: String) = rows(m).getLong(3)
    def hit(m: String) = rows(m).getLong(5)
    val nDocs = lookups("base_only") / HashDedup.MpBands // 2 base keys per batch doc
    assert(nDocs > 0 && lookups("base_only") == HashDedup.MpBands * nDocs)
    // bills: base 2/doc, budget 2+T/doc, full 2+bands·r/doc — exact,
    // because every batch doc has a full signature (≥3 tokens) here
    assert(lookups("mp_budget") == (HashDedup.MpBands + CurationQueries.PipelineMpBudget) * nDocs,
      s"budget bill ${lookups("mp_budget")} != (2+T)*docs")
    assert(lookups("mp_full") == (HashDedup.MpBands + HashDedup.MpBands * HashDedup.MpR) * nDocs,
      s"full bill ${lookups("mp_full")} != (2+bands*r)*docs")
    // monotone: more probes can only add candidates and recall
    assert(cand("base_only") <= cand("mp_budget") && cand("mp_budget") <= cand("mp_full"))
    assert(hit("base_only") <= hit("mp_budget") && hit("mp_budget") <= hit("mp_full"))
    // the index is one shared build
    assert(rows.values.map(_.getLong(1)).toSet.size == 1, "modes saw different indexes")
    // and the banded base alone already carries most of the recall (the
    // row's deployment point: probes buy the TAIL at a multiplied bill)
    val nTrue = rows("base_only").getLong(4)
    assert(hit("base_only") * 10 >= nTrue * 9,
      s"base banded recall collapsed (${hit("base_only")}/$nTrue) — re-narrate №187")
  }
}
