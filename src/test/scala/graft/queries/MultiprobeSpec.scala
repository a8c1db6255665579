package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row

/** №173 dedup_minhash_multiprobe: the query-directed probing contracts.
  * The oracle pins values; this pins the LEVER's shape — recall strictly
  * rises with the index unchanged, the probe bill is bounded by
  * bands·r keys per doc, and probing adds no junk (precision floor). */
class MultiprobeSpec extends SparkSpec {

  test("multi-probe lifts recall at zero index growth; probe bill bounded; no junk candidates") {
    val rows: Map[String, Row] = HashDedup.dedupMinhashMultiprobe(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val base = rows("base"); val mp = rows("multiprobe")
    def idx(r: Row) = r.getLong(1); def probes(r: Row) = r.getLong(2)
    def cand(r: Row) = r.getLong(3); def truth(r: Row) = r.getLong(4)
    def hit(r: Row) = r.getLong(5)
    // the index is untouched: same rows, and base probes nothing
    assert(idx(base) == idx(mp), "multiprobe grew the index")
    assert(probes(base) == 0L && probes(mp) > 0L)
    // probe bill bound: ≤ bands·r perturbed keys per doc, and the doc
    // count IS n_index_rows / bands
    assert(probes(mp) <= idx(mp) / HashDedup.MpBands * HashDedup.MpBands * HashDedup.MpR,
      s"probe bill ${probes(mp)} exceeds bands*r per doc")
    // the lever: strictly more truth pairs found, none lost
    assert(hit(mp) > hit(base),
      s"multiprobe recovered nothing (${hit(base)} -> ${hit(mp)}) — banding has no headroom; harden MpBands")
    assert(cand(mp) >= cand(base), "multiprobe lost candidates")
    assert(truth(mp) == truth(base))
    // measured floors: probing closes the b=2 gap on this corpus, and
    // the perturbed keys add no junk (precision stays high)
    assert(hit(mp) * 100 >= truth(mp) * 99, s"multiprobe recall below 0.99 (${hit(mp)}/${truth(mp)})")
    assert(hit(mp) * 100 >= cand(mp) * 90, "multiprobe precision fell below 0.9 — perturbed keys emit junk")
  }
}
