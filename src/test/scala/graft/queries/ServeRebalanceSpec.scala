package graft.queries

/** №177 knn_serve_rebalance: the serve-during-rebalance consistency
  * contracts the driver hash can't name individually. The oracle pins
  * the five served result sets and the store censuses; this pins the
  * PROTOCOL — per-cell membership is exactly one of the three sanctioned
  * layouts at every checkpoint (old / old∪incoming / new — never a torn
  * mix), no vector is ever absent (the add-then-remove ordering's whole
  * point), the overlap window doubles exactly the movers, and the
  * interleaving is not vacuous (mid-rebalance states and served results
  * genuinely differ). */
class ServeRebalanceSpec extends graft.SparkSpec {

  test("every cell old-or-new at each stage; no vector ever lost; overlap doubles exactly the movers; serving changes mid-rebalance") {
    VectorQueries.captureStages = true
    val rows =
      try VectorQueries.knnServeRebalance(spark, sf).collect()
      finally VectorQueries.captureStages = false
    val stages: Map[Int, Array[(Long, Long)]] = VectorQueries.lastStageCells.toMap
    assert(stages.keySet == Set(0, 1, 2, 3, 4), s"expected 5 stage snapshots, got ${stages.keySet}")

    def memOf(s: Int): Map[Long, Set[Long]] =
      stages(s).groupBy(_._2).map { case (c, a) => c -> a.map(_._1).toSet }
    val m0 = memOf(0); val m4 = memOf(4)
    val allVecs = stages(0).map(_._1).toSet

    // endpoints are clean assignments: one copy per vector
    assert(stages(0).length == allVecs.size, "stage 0 is not a clean assignment")
    assert(stages(4).length == allVecs.size, "stage 4 still has duplicate copies")
    val assign0 = stages(0).toMap
    val assign4 = stages(4).toMap
    val movers = allVecs.filter(v => assign0(v) != assign4(v))
    assert(movers.nonEmpty, "no movers — drift too mild, the protocol went unexercised")
    val incomers: Map[Long, Set[Long]] =
      movers.groupBy(assign4).map { case (c, vs) => c -> vs.toSet }

    for (s <- 0 to 4) {
      val byVec = stages(s).groupBy(_._1)
      // the headline invariant: a reader NEVER sees a vector-less store state
      assert(allVecs.forall(byVec.contains),
        s"stage $s lost vectors: ${allVecs.filterNot(byVec.contains).take(5)}")
      assert(byVec.values.forall(_.length <= 2), s"stage $s has >2 copies of a vector")
      // per-cell atomicity: each cell at exactly one sanctioned layout
      val mem = memOf(s)
      (m0.keySet ++ m4.keySet ++ mem.keySet).foreach { c =>
        val got = mem.getOrElse(c, Set.empty[Long])
        val old = m0.getOrElse(c, Set.empty[Long])
        val fin = m4.getOrElse(c, Set.empty[Long])
        val mid = old ++ incomers.getOrElse(c, Set.empty[Long])
        assert(got == old || got == mid || got == fin,
          s"stage $s cell $c torn: ${got.size} members match none of old=${old.size}/mid=${mid.size}/new=${fin.size}")
      }
    }

    // stage 2 (all gains applied, no losses yet) is the full overlap
    // window: every mover — and only the movers — is doubled
    assert(stages(2).length - allVecs.size == movers.size,
      s"overlap window has ${stages(2).length - allVecs.size} duplicates, expected ${movers.size} (the movers)")

    // ≥3 interleaved searches between the endpoints, at least one over a
    // state that differs from BOTH — the searches genuinely interleave
    assert((1 to 3).forall(stages.contains))
    assert((1 to 3).exists(s => memOf(s) != m0 && memOf(s) != m4),
      "no intermediate stage differs from both endpoints — the waves collapsed")

    // and the serving actually changes: at least two checkpoints return
    // different result sets (membership movement reaches the top-k)
    val served = rows.groupBy(_.getLong(0)).map { case (s, rs) =>
      s -> rs.map(r => (r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    }
    assert(served.values.toSet.size > 1,
      "every checkpoint served identical results — the interleaving is vacuous")

    // final census from the driver row itself: stage 4 has zero duplicates
    rows.filter(_.getLong(0) == 4L).foreach(r =>
      assert(r.getLong(1) == r.getLong(2), "stage-4 row census still shows duplicates"))
  }
}
