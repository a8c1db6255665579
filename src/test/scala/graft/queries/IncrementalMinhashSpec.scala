package graft.queries

import graft.SparkSpec

/** №187 dedup_incremental_minhash: the persisted-index probing contracts —
  * lookup bills ordered exactly (2 / 2+T / 2+bands·r / 2+bands·r+2·C(r,2)
  * keys per batch doc), recall monotone in the probe spend, candidates
  * monotone too (a budget can only remove probe keys), the two tie-break
  * rankings (r14: gap, index-density) permutations of the SAME probe
  * rows, and the probe-augmented index exactly (1+bands·r)/2 × the plain
  * one. */
class IncrementalMinhashSpec extends SparkSpec {

  test("lookup bills exact, recall and candidates monotone across probe modes") {
    val rows = HashDedup.dedupIncrementalMinhash(spark, sf).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == Set("base_only", "index_side", "mp_budget", "mp_budget_gap",
      "mp_budget_ix", "mp_full", "mp_radius2"))
    def lookups(m: String) = rows(m).getLong(2)
    def ctab(m: String) = rows(m).getLong(3)
    def cand(m: String) = rows(m).getLong(4)
    def hit(m: String) = rows(m).getLong(6)
    val nDocs = lookups("base_only") / HashDedup.MpBands // 2 base keys per batch doc
    assert(nDocs > 0 && lookups("base_only") == HashDedup.MpBands * nDocs)
    // bills: base 2/doc, budget 2+T/doc, full 2+bands·r/doc, radius2
    // full + bands·C(r,2)/doc — exact, because every batch doc has a
    // full signature (≥3 tokens) here; index_side pays the BASE bill
    val full = HashDedup.MpBands + HashDedup.MpBands * HashDedup.MpR
    val r2 = HashDedup.MpBands * (HashDedup.MpR * (HashDedup.MpR - 1) / 2)
    assert(lookups("mp_budget") == (HashDedup.MpBands + CurationQueries.PipelineMpBudget) * nDocs,
      s"budget bill ${lookups("mp_budget")} != (2+T)*docs")
    assert(lookups("mp_budget_gap") == lookups("mp_budget"))
    assert(lookups("mp_budget_ix") == lookups("mp_budget"))
    assert(lookups("mp_full") == full * nDocs, s"full bill ${lookups("mp_full")} != (2+bands*r)*docs")
    assert(lookups("mp_radius2") == (full + r2) * nDocs,
      s"radius2 bill ${lookups("mp_radius2")} != (2+bands*r+bands*C(r,2))*docs")
    assert(lookups("index_side") == lookups("base_only"), "index_side must pay the base bill")
    // the density tie-break's count-table pre-pass is metered, never free:
    // bands·r keys per doc against the bucket-count table, zero elsewhere
    assert(ctab("mp_budget_ix") == HashDedup.MpBands * HashDedup.MpR * nDocs)
    assert(rows.keySet.filterNot(_ == "mp_budget_ix").forall(m => ctab(m) == 0L))
    // monotone: more probes can only add candidates and recall; both
    // tie-breaks spend the same T rows, so they sit within [budget-floor,
    // full] by construction (they pick T of the same 12 probe rows)
    assert(cand("base_only") <= cand("mp_budget") && cand("mp_budget") <= cand("mp_full"))
    assert(cand("mp_budget_gap") <= cand("mp_full") && cand("mp_budget_ix") <= cand("mp_full"))
    assert(cand("mp_full") <= cand("mp_radius2"))
    assert(cand("base_only") <= cand("index_side"))
    assert(hit("base_only") <= hit("mp_budget") && hit("mp_budget") <= hit("mp_full"))
    assert(hit("mp_full") <= hit("mp_radius2"))
    assert(hit("base_only") <= hit("index_side"))
    // base-key-only modes share the plain index; index_side's is the
    // probe-augmented build: exactly (base + bands·r per base doc) rows
    val plainIdx = rows("base_only").getLong(1)
    assert(rows.values.filter(_.getString(0) != "index_side").map(_.getLong(1)).toSet == Set(plainIdx),
      "plain-index modes saw different indexes")
    val baseDocs = plainIdx / HashDedup.MpBands
    assert(rows("index_side").getLong(1) == plainIdx + baseDocs * HashDedup.MpBands * HashDedup.MpR,
      "probe-augmented index is not base + bands*r rows per base doc")
    // and the banded base alone already carries most of the recall (the
    // row's deployment point: probes buy the TAIL at a multiplied bill)
    val nTrue = rows("base_only").getLong(5)
    assert(hit("base_only") * 10 >= nTrue * 9,
      s"base banded recall collapsed (${hit("base_only")}/$nTrue) — re-narrate №187")
  }
}
