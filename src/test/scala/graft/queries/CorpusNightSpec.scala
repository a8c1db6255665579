package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №195 corpus_night: the cross-family contracts — the dedup decision is
  * non-vacuous (dups exist AND survivors exist), no dropped dup's vector
  * ever reaches the store files, a batch survivor genuinely enters served
  * top-k, and the decision is LOAD-BEARING on the retrieval side: appending
  * the dups too (the no-dedup control) changes at least one query's served
  * list. */
class CorpusNightSpec extends SparkSpec {

  private lazy val run = CorpusNight.corpusNightDetail(spark, sf)
  private lazy val rows = run._1.collect()
  private lazy val detail = run._2
  private def cls(id: Long): Long = id % HashDedup.IncCalMod

  test("the night splits genuinely: dups and survivors both non-empty") {
    assert(detail.dups.nonEmpty, "no dups — the dedup leg is vacuous")
    assert(detail.nSurvivors > 0, "no survivors — the append leg is vacuous")
    assert(detail.dups.forall(d => cls(d) == 1L), "a dup outside the batch")
    val s1 = rows.filter(_.getLong(0) == 1L).head
    assert(s1.getLong(3) === detail.dups.size.toLong)
    assert(s1.getLong(2) === rows.filter(_.getLong(0) == 0L).head.getLong(2) + detail.nSurvivors)
  }

  test("no dropped dup's vector ever reaches the store; survivors do") {
    assert(detail.storeDocs(0).forall(d => cls(d) != 1L))
    assert(detail.dups.intersect(detail.storeDocs(1)).isEmpty,
      "a deduped doc's vector reached the store")
    assert(detail.storeDocs(1).exists(d => cls(d) == 1L))
  }

  test("a batch survivor enters served top-k") {
    val served1 = rows.filter(_.getLong(0) == 1L).map(_.getAs[Long]("doc_id"))
    assert(served1.exists(d => cls(d) == 1L),
      "no batch doc in any S1 top-k — the night never surfaces in retrieval")
    assert(!served1.exists(detail.dups.contains), "a dropped dup served")
  }

  test("the dedup decision is load-bearing on retrieval: the no-dedup control differs") {
    import VectorQueries.{EmbedQEvery, K}
    val m = HashDedup.IncCalMod.toLong
    val ve = graft.CacheRegistry.track(
      PipelineQueries.docEmbedVectorsFrom(TextQueries.dupCorpus(spark, sf))
        .select(col("doc_id"), col("emb_arr"), col("norm_sq")).persist())
    val queries = ve.filter(col("doc_id") % EmbedQEvery === 0 && pmod(col("doc_id"), lit(m)) =!= 1L)
      .select(col("doc_id").as("q_id"), col("emb_arr").as("q_emb"), col("norm_sq").as("q_norm"))
    // the control store: base + the WHOLE batch (dups not dropped)
    val control = ve.filter(!(col("doc_id") % EmbedQEvery === 0) || pmod(col("doc_id"), lit(m)) === 1L)
    val scored = control.join(broadcast(queries))
      .select(col("q_id"), col("doc_id"),
        round(
          aggregate(zip_with(col("emb_arr"), col("q_emb"), (x, y) => x * y), lit(0L), (acc, p) => acc + p)
            .cast("double") /
            (sqrt(col("norm_sq").cast("double")) * sqrt(col("q_norm").cast("double"))), 6).as("cos"))
    val controlServed = VectorQueries.topKRanked(scored, "q_id", "cos", "doc_id", K)
      .collect().map(r => (r.getAs[Long]("q_id"), r.getAs[Number]("rank").longValue,
        r.getAs[Long]("doc_id"))).toSet
    val dedupServed = rows.filter(_.getLong(0) == 1L)
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"), r.getAs[Long]("doc_id"))).toSet
    assert(controlServed != dedupServed,
      "dropping the dups changed nothing served — the cross-family interaction is vacuous here")
    // and the difference is exactly dup-driven: control-only rows at some
    // rank are dup docs displacing survivors/base
    val controlOnly = controlServed -- dedupServed
    assert(controlOnly.exists { case (_, _, d) => detail.dups.contains(d) },
      "control diverges but never serves a dup — unexpected")
  }
}
