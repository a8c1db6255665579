package graft

import org.apache.spark.sql.functions._

/** Pins the structure the [[ClusteredAnn]] measurement rests on: the
  * generated corpus is deterministic (pure function of vec_id), has
  * genuine cluster geometry (intra-cluster cosine ≫ inter-cluster), and
  * head-heavy (geometric) cluster sizes — the three properties that make
  * it a fair stand-in for a real embedding corpus where the isotropic
  * driver corpus is not. */
class ClusteredCorpusSpec extends SparkSpec {

  private val N = 300

  private def rm(d: String): Unit = {
    def go(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(go)
      f.delete(); ()
    }
    go(new java.io.File(d))
  }

  private def rows(): Seq[(Long, Seq[Float], Int)] = {
    val d = ClusteredAnn.generate(spark, N)
    spark.read.parquet(s"$d/embeddings.parquet")
      .orderBy(col("vec_id"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2))).toSeq
  }

  test("generator is deterministic: regeneration reproduces every byte") {
    rm(ClusteredAnn.dir(N))
    val first = rows()
    rm(ClusteredAnn.dir(N))
    val second = rows()
    assert(first == second, "regenerated corpus diverged — generator is not a pure function of vec_id")
    assert(first.size == N)
    assert(first.forall(_._2.size == 64))
  }

  test("cluster geometry: intra-cluster cosine well above inter-cluster; sizes head-heavy") {
    val vs = rows()
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { val x = a(i).toDouble; val y = b(i).toDouble; d += x * y; na += x * x; nb += y * y }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byCluster = vs.groupBy(_._3)
    assert(byCluster.size >= 5, s"only ${byCluster.size} clusters at n=$N")
    // head-heavy: cluster 0 is the largest and the top-2 hold > half
    val sizes = byCluster.view.mapValues(_.size).toMap
    val sorted = sizes.toSeq.sortBy(-_._2)
    assert(sizes.maxBy(_._2)._1 == 0, s"cluster 0 not the head: $sizes")
    assert(sorted.take(2).map(_._2).sum * 2 > N, s"sizes not head-heavy: $sizes")
    // separation: mean pairwise cosine within clusters vs across
    val intra = byCluster.values.toSeq.flatMap { g =>
      for (i <- g.indices; j <- (i + 1) until g.size) yield cos(g(i)._2, g(j)._2)
    }
    val inter = for {
      (ca, ga) <- byCluster.toSeq; (cb, gb) <- byCluster.toSeq if ca < cb
      a <- ga.take(5); b <- gb.take(5)
    } yield cos(a._2, b._2)
    val mIntra = intra.sum / intra.size
    val mInter = inter.sum / inter.size
    assert(mIntra > 0.5, f"intra-cluster cosine $mIntra%.3f too low — noise drowns the centers")
    assert(mIntra > mInter + 0.3,
      f"separation too weak: intra $mIntra%.3f vs inter $mInter%.3f — not meaningfully clustered")
  }

  test("№167 census row: head-heavy sizes and own-center affinity ≫ head-center affinity, oracle-shaped") {
    val rows = graft.queries.VectorQueries.clusteredCorpus(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty && rows.map(_._2).sum == graft.queries.VectorQueries.CcN)
    // head-heavy: label 0 is the largest cluster
    assert(rows.maxBy(_._2)._1 == 0, s"cluster 0 not the head: ${rows.toSeq}")
    rows.foreach { case (label, _, ownPpm, headPpm) =>
      // members sit close to their own center…
      assert(ownPpm > 500000, s"label $label own_ppm $ownPpm — noise drowns the center")
      // …and, for every non-head cluster, far closer than to the head's
      if (label != 0) assert(ownPpm > headPpm + 300000,
        s"label $label: own $ownPpm vs head $headPpm — separation not oracle-visible")
      else assert(ownPpm == headPpm, "label 0's own and head centers must coincide")
    }
  }
}
