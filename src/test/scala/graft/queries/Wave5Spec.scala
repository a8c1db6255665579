package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №144-146: vocab growth, embedding drift, and the IVF centroid-count
  * sweep — each pinned against an independent plain-Scala recomputation
  * plus its domain invariants. */
class Wave5Spec extends SparkSpec {
  import spark.implicits._

  test("vocab_growth ≡ naive 10-pass prefix recomputation; vocabulary saturates") {
    val got = TextQueries.vocabGrowth(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    assert(got.map(_._1) == (0L until 10L), "exactly the 10 bucket rows, ordered")
    // the naive formulation the operator avoids: re-scan per prefix
    val docs = graft.Tables(spark, sf).documents
      .select($"doc_id", $"text").as[(Long, String)].collect().toSeq
    val n = docs.map(_._1).max + 1
    val toks = docs.map { case (id, text) =>
      (id * 10 / n, text.toLowerCase.replaceAll("[^a-z0-9]+", " ").trim.split(" ").filter(_.nonEmpty).toSeq)
    }
    got.foreach { case (bucket, nTok, newTypes, tokensCum, vocabCum, ttrPpm) =>
      val prefix = toks.filter(_._1 <= bucket).flatMap(_._2)
      val inBucket = toks.filter(_._1 == bucket).flatMap(_._2)
      val prevVocab = toks.filter(_._1 < bucket).flatMap(_._2).toSet
      assert(nTok == inBucket.size.toLong, s"bucket $bucket token count")
      assert(tokensCum == prefix.size.toLong, s"bucket $bucket cumulative tokens")
      assert(vocabCum == prefix.toSet.size.toLong, s"bucket $bucket cumulative vocab")
      assert(newTypes == (inBucket.toSet -- prevVocab).size.toLong, s"bucket $bucket new types")
      assert(ttrPpm == vocabCum * 1000000L / tokensCum, s"bucket $bucket ttr arithmetic")
    }
    // Heaps saturation is MEASURABLE on this corpus: the type/token ratio
    // falls from the first prefix to the full corpus
    assert(got.last._6 < got.head._6, s"ttr never fell: ${got.map(_._6)}")
    // cumulative columns are monotone by construction
    assert(got.map(_._5).sliding(2).forall(p => p(0) <= p(1)))
  }

  test("embedding_drift ≡ plain-Scala fixed-point recomputation; halves split the store") {
    val got = VectorQueries.embeddingDrift(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val vecs = graft.Tables(spark, sf).embeddings
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toSeq
    val n = vecs.map(_._1).max + 1
    val dims = vecs.head._2.size
    assert(got.size == dims, s"expected $dims dim rows")
    def q(x: Float): Long = BigDecimal(x.toDouble * 10000 + 1e-9)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val byHalf = vecs.groupBy { case (id, _) => id * 2 / n }
    got.foreach { case (dim, nA, nB, sumA, sumB, shift) =>
      val a = byHalf(0L).map(v => q(v._2(dim.toInt - 1)))
      val b = byHalf(1L).map(v => q(v._2(dim.toInt - 1)))
      assert((nA, nB) == (a.size.toLong, b.size.toLong))
      assert((sumA, sumB) == (a.sum, b.sum), s"dim $dim fixed-point sums")
      val expected = math.abs(sumA * nB - sumB * nA) * 1000000L /
        math.max(math.abs(sumA) * nB + math.abs(sumB) * nA, 1L)
      assert(shift == expected, s"dim $dim shift arithmetic")
    }
    // the two halves genuinely partition the store
    assert(got.head._2 + got.head._3 == vecs.size.toLong)
  }

  test("curriculum_order ≡ plain-Scala quartile staging; stages partition the corpus, envelopes ordered") {
    val got = TextQueries.curriculumOrder(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    val docs = TextQueries.qualityScore(spark, sf)
      .select($"doc_id", $"n_tok", $"quality").as[(Long, Int, Double)].collect().toSeq
    val qs = docs.map(_._3).sorted
    val n = qs.size.toLong
    def quantile(p: Int): Double = {
      // min q with 100·rank(q) ≥ p·N (discrete lower quantile on the sorted values)
      val rank = (p * n + 99) / 100
      qs(rank.toInt - 1)
    }
    val (q25, q50, q75) = (quantile(25), quantile(50), quantile(75))
    val expected = docs.groupBy { d =>
      (if (d._3 > q25) 1 else 0) + (if (d._3 > q50) 1 else 0) + (if (d._3 > q75) 1 else 0)
    }.toSeq.map { case (s, rows) =>
      (s.toLong, rows.size.toLong, rows.map(_._2.toLong).sum, rows.map(_._3).min, rows.map(_._3).max)
    }.sortBy(_._1)
    assert(got == expected, "stage manifest diverges from the plain-Scala quartile staging")
    // stages PARTITION the corpus and the quality envelopes are ordered,
    // non-overlapping (the property a curriculum scheduler depends on)
    assert(got.map(_._2).sum == n)
    got.sliding(2).foreach { case Seq(a, b) => assert(a._5 < b._4, s"stages ${a._1}/${b._1} overlap") case _ => () }
    assert(got.map(_._1) == (0L to 3L), "exactly four stages")
  }

  test("dedup_survivorship: one keeper per cluster, policy-optimal; richer copies beat min-id") {
    val got = TextQueries.dedupSurvivorship(spark, sf)
      .as[(Long, Long, Int, Int, Boolean)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    val byCluster = got.groupBy(_._2)
    byCluster.foreach { case (c, rows) =>
      val keeps = rows.filter(_._5)
      assert(keeps.size == 1, s"cluster $c has ${keeps.size} keepers")
      val k = keeps.head
      // the keeper beats every clustermate on (n_uniq, n_tok, -doc_id)
      rows.filterNot(_._5).foreach { m =>
        val better = (k._4, k._3, -k._1)
        val other = (m._4, m._3, -m._1)
        assert(Ordering[(Int, Int, Long)].gt(better, other),
          s"cluster $c keeper ${k._1} does not dominate ${m._1}")
      }
    }
    // the policy genuinely diverges from №40's min-id keep: the appended-
    // token near-dup copies (+1000000 ids) are strictly richer and win
    val policyDiffers = byCluster.values.exists { rows =>
      rows.exists(r => r._5 && r._1 != rows.map(_._1).min)
    }
    assert(policyDiffers, "survivorship always picked min-id — the policy is vacuous here")
    // and the exact-copy clusters still fall back to id order (ties)
    val idFallback = byCluster.values.exists { rows =>
      rows.exists(r => r._5 && r._1 == rows.map(_._1).min && rows.size > 1 &&
        rows.forall(x => (x._3, x._4) == (r._3, r._4)))
    }
    assert(idFallback, "no tie cluster exercised the doc_id fallback")
  }

  test("lsh_tuning: candidates and recall grow with bands, precision never rises; default banding justified") {
    val got = HashDedup.lshTuning(spark, sf)
      .as[(Int, Int, Long, Long, Long, Double, Double)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    assert(got.map(_._1) == HashDedup.BandSweep, "one row per swept banding, ordered")
    got.foreach { case (b, r, nCand, nTrue, nHit, prec, rec) =>
      assert(r == HashDedup.NumHashes / b)
      assert(nHit <= math.min(nCand, nTrue), s"b=$b hit accounting impossible")
      assert(prec > 0.9 && rec > 0.9, s"b=$b degenerate point: prec=$prec rec=$rec")
    }
    // 1−(1−s^r)^b: match probability rises with b at fixed K ⇒ candidate
    // set and recall are monotone non-decreasing, precision non-increasing
    assert(got.map(_._3).sliding(2).forall(p => p(0) <= p(1)), s"candidates not monotone: ${got.map(_._3)}")
    assert(got.map(_._7).sliding(2).forall(p => p(0) <= p(1)), s"recall not monotone: ${got.map(_._7)}")
    assert(got.map(_._6).sliding(2).forall(p => p(0) >= p(1)), s"precision rose with b: ${got.map(_._6)}")
    // the trade is LIVE on this corpus: the strictest banding misses pairs,
    // the loosest admits false candidates — the sweep spans the knee
    assert(got.head._7 < 1.0, "b=2 already perfect — sweep can't show the recall side")
    assert(got.last._6 < 1.0, "b=6 has no false candidates — sweep can't show the cost side")
    // №22's default banding sits at the knee: full recall
    val default = got.find(_._1 == HashDedup.Bands).get
    assert(default._7 == 1.0, "the default banding no longer reaches full recall")
  }

  test("knn_c_sweep: the quality/cost trade is real — candidates fall and recall falls as C grows") {
    val got = VectorQueries.knnCSweep(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    val byC = got.groupBy(_._1)
    assert(byC.keySet == VectorQueries.CSweep.map(c => s"ivf_c$c").toSet)
    byC.values.foreach(rows => assert(rows.size == VectorQueries.NQueries))
    def mean(m: String, f: ((String, Long, Long, Long, Double)) => Double) =
      byC(m).map(f).sum / byC(m).size
    val cLo = s"ivf_c${VectorQueries.CSweep.min}"
    val cHi = s"ivf_c${VectorQueries.CSweep.max}"
    // cost side: probing a fixed number of cells out of MORE cells scans
    // strictly fewer candidates
    assert(mean(cLo, _._3.toDouble) > mean(cHi, _._3.toDouble),
      s"candidate counts did not fall with C: ${VectorQueries.CSweep.map(c => mean(s"ivf_c$c", _._3.toDouble))}")
    // quality side: the thinner probed fraction costs recall
    assert(mean(cLo, _._5) >= mean(cHi, _._5),
      s"recall did not fall with C: ${VectorQueries.CSweep.map(c => mean(s"ivf_c$c", _._5))}")
    // the sweep is not degenerate: the cheap end still finds a meaningful
    // share (probe/C of the corpus at C=16, probe=2 → ~1/8 scanned)
    assert(mean(cHi, _._5) >= 0.0 && mean(cLo, _._5) > 0.2)
  }
}
