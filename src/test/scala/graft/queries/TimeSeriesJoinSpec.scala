package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic + plan contracts for the time-series joins (SURVEY §2 №75-76).
  * Cross-engine value equality is covered by the DuckDB oracle in Verify;
  * these pin the SEMANTICS (arg-max choice, tie visibility, left-join
  * nulls, binned ≡ naive) and the SCALE SHAPE (no nested-loop join, no
  * join operator at all in the as-of plan). */
class TimeSeriesJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof_join equals the naive per-probe arg-max on the real corpus") {
    val e = graft.Tables(spark, sf).events
      .select($"event_id", $"user_id", $"event_type", $"ts_ms")
    val v = e.filter($"event_type" === "view")
      .select($"user_id".as("vu"), $"ts_ms".as("vts"), $"event_id".as("vid"))
    val p = e.filter($"event_type" === "purchase")
      .select($"user_id", $"ts_ms", $"event_id")
    // naive: inequality join + max(struct) arg-max — the formulation the
    // merge implementation must reproduce exactly
    val naive = p.join(v, $"vu" === $"user_id" && $"vts" <= $"ts_ms", "left")
      .groupBy($"event_id", $"user_id", $"ts_ms")
      .agg(max(when($"vid".isNotNull, struct($"vts", $"vid"))).as("m"))
      .select($"event_id", $"m.vid".as("view_event_id"), $"m.vts".as("view_ms"))
    val merge = Analytics.asofJoin(spark, sf)
      .select($"event_id", $"view_event_id", $"view_ms")
    assert(merge.collect().toSet == naive.collect().toSet)
  }

  test("asof_join tie semantics: same-ms build visible, max event_id wins, no-match is null") {
    val build = Seq(
      (2L, 10L, 1L), (2L, 10L, 2L), // equal-ts views: highest event_id must win
      (1L, 100L, 10L)               // same-ms as user 1's purchase: visible (<=)
    ).toDF("user_id", "ts_ms", "event_id")
    val probe = Seq(
      (1L, 100L, 11L), // same-ms view 10 qualifies
      (1L, 50L, 5L),   // before any view: nulls
      (2L, 20L, 3L)    // two equal-ts views: id 2 wins
    ).toDF("user_id", "ts_ms", "event_id")
    val out = Analytics.asofCore(build, probe)
      .select($"event_id", $"view_event_id", $"view_ms")
      .as[(Long, Option[Long], Option[Long])].collect().toSet
    assert(out == Set(
      (11L, Some(10L), Some(100L)),
      (5L, None, None),
      (3L, Some(2L), Some(10L))))
  }

  test("asof_join plan: ONE hash exchange, no join operator anywhere") {
    // the merge formulation's whole point: union + window = a single
    // shuffle on user_id — no join node (a correlated/inequality plan
    // would show BroadcastNestedLoopJoin or an all-pairs equi-join)
    val plan = ExportQueriesPlanHelper.exec(Analytics.asofJoin(spark, sf))
    assert(plan.collect { case j if j.nodeName.contains("Join") => j }.isEmpty,
      s"as-of planned a join:\n$plan")
    val hashExchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
        if e.outputPartitioning.isInstanceOf[org.apache.spark.sql.catalyst.plans.physical.HashPartitioning] => e
    }
    assert(hashExchanges.size == 1, s"expected exactly one hash exchange:\n$plan")
  }

  test("session_funnel equals a plain-Scala recomputation (strict ordering honored)") {
    import scala.math.Ordering.Implicits._
    val events = graft.Tables(spark, sf).events
      .select($"event_id", $"user_id", $"event_type", $"ts_ms")
      .as[(Long, Long, String, Long)].collect()
    val gap = 1800000L
    val expected = events.groupBy(_._2).toSeq.flatMap { case (uid, evs) =>
      val sorted = evs.sortBy(e => (e._4, e._1))
      // assign 30-min-gap sessions
      var sid = 0L; var prev = Long.MinValue
      val tagged = sorted.map { e =>
        if (prev == Long.MinValue || e._4 - prev > gap) sid += 1
        prev = e._4
        (sid, e)
      }
      tagged.groupBy(_._1).toSeq.map { case (s, rows) =>
        def key(e: (Long, Long, String, Long)) = (e._4, e._1) // lexicographic (ts, event_id)
        val ks = rows.map(_._2).sortBy(key)
        val vk = ks.filter(_._3 == "view").map(key).minOption
        val ck = vk.flatMap(v => ks.filter(e => e._3 == "click" && key(e) > v).map(key).minOption)
        val pk = ck.flatMap(c => ks.filter(e => e._3 == "purchase" && key(e) > c).map(key).minOption)
        val depth = if (pk.isDefined) 3 else if (ck.isDefined) 2 else if (vk.isDefined) 1 else 0
        (uid, s, rows.size.toLong, depth)
      }
    }.sortBy(t => (t._1, t._2))
    val got = Analytics.sessionFunnel(spark, sf)
      .as[(Long, Long, Long, Int)].collect().toSeq
    assert(got == expected)
    graft.CacheRegistry.releaseAll(spark)
  }

  test("retention_cohort: offset-0 cells are the cohort itself; cells stay in-matrix") {
    val rows = Analytics.retentionCohort(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.filter(_._2 == 0L).foreach { r =>
      assert(r._3 == r._4 && r._5 == 1.0, s"offset-0 cell != cohort size: $r")
    }
    rows.foreach { r =>
      assert(r._2 >= 0 && r._3 <= r._4, s"cell outside the matrix: $r")
    }
    graft.CacheRegistry.releaseAll(spark)
  }

  test("events_pipeline columns equal their standalone operators (no composition drift)") {
    val out = Analytics.eventsPipeline(spark, sf)
      .as[(Long, Long, Int, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val sessions = Analytics.sessionize(spark, sf)
      .groupBy($"user_id").count().as[(Long, Long)].collect().toMap
    val depth = Analytics.sessionFunnel(spark, sf)
      .groupBy($"user_id").agg(max($"depth")).as[(Long, Int)].collect().toMap
    val attributed = Analytics.asofJoin(spark, sf)
      .filter($"view_event_id".isNotNull)
      .groupBy($"user_id").count().as[(Long, Long)].collect().toMap
    assert(out.keySet == sessions.keySet)
    out.foreach { case (u, (n, d, _, a)) =>
      assert(n == sessions(u), s"user $u session count drifted")
      assert(d == depth(u), s"user $u funnel depth drifted")
      assert(a == attributed.getOrElse(u, 0L), s"user $u attribution drifted")
    }
    graft.CacheRegistry.releaseAll(spark)
  }

  test("range_join binned equals the naive inequality join") {
    val binned = Analytics.rangeJoinBinned(spark, sf).collect().toSeq
    // naive: the range predicate joined directly (fine here — the campaign
    // side is tiny, so Spark broadcasts the nested loop; the binned form
    // exists for when BOTH sides are corpus-scale)
    val campaigns = spark.range(40).select(
      $"id".as("campaign_id"),
      (lit(1704067200000L) + $"id" * 57600000L).as("start_ms"))
      .withColumn("end_ms", $"start_ms" + lit(21600000L) + ($"campaign_id" % 8) * 10800000L)
    val ev = graft.Tables(spark, sf).events.select($"event_id", $"user_id", $"value", $"ts_ms")
    val naive = campaigns.join(ev, $"ts_ms" >= $"start_ms" && $"ts_ms" <= $"end_ms", "left")
      .groupBy($"campaign_id", $"start_ms", $"end_ms")
      .agg(count($"event_id").as("n_events"),
        countDistinct($"user_id").as("n_users"),
        coalesce(sum(round($"value", 2).cast("decimal(20,2)")).cast("double"), lit(0.0)).as("sum_value"))
      .orderBy($"campaign_id").collect().toSeq
    assert(binned == naive)
  }

  test("range_join plan: equi-join on bin, never a nested loop (broadcast disabled)") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = ExportQueriesPlanHelper.exec(Analytics.rangeJoinBinned(spark, sf))
      val txt = plan.toString
      assert(!txt.contains("NestedLoop"),
        s"range join fell back to a nested loop:\n$txt")
      assert(txt.contains("SortMergeJoin") || txt.contains("ShuffledHashJoin"),
        s"bin equi-join missing:\n$txt")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("event_transitions ≡ plain-Scala recomputation (session-bounded lag, exact ppm)") {
    val rows = Analytics.eventTransitions(spark, sf)
      .as[(String, String, Long, Long)].collect().toSeq
    // closed-form model: 30-min-gap sessions, per-user (ts, event_id) order
    val evs = graft.Tables(spark, sf).events
      .select($"user_id", $"event_id", $"event_type", $"ts_ms")
      .as[(Long, Long, String, Long)].collect().toSeq
    val edges = evs.groupBy(_._1).values.flatMap { userEvs =>
      val ordered = userEvs.sortBy(e => (e._4, e._2))
      val sessIds = ordered.scanLeft((0L, Option.empty[Long])) {
        case ((sid, prevMs), e) =>
          (if (prevMs.forall(p => e._4 - p > 1800000L)) sid + 1 else sid, Some(e._4))
      }.tail.map(_._1)
      ordered.zip(sessIds).sliding(2).collect {
        case Seq((a, sa), (b, sb)) if sa == sb => (a._3, b._3)
      }
    }.toSeq
    val counts = edges.groupBy(identity).view.mapValues(_.size.toLong).toSeq
    val total = counts.map(_._2).sum
    val expected = counts
      .map { case ((f, t), n) => (f, t, n, n * 1000000L / total) }
      .sortBy(e => (e._1, e._2))
    assert(rows == expected, "transition edges must equal the closed-form model")
    assert(rows.map(_._4).sum <= 1000000L && rows.nonEmpty)
  }

  test("scd2_intervals ≡ plain-Scala recomputation; per-user history contiguous, one current") {
    val rows = Analytics.scd2Intervals(spark, sf)
      .as[(Long, String, Long, Long, Boolean)].collect().toSeq
    val evs = graft.Tables(spark, sf).events
      .select("user_id", "event_type", "ts_ms", "event_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    val expected = evs.groupBy(_._1).toSeq.flatMap { case (u, es) =>
      val ordered = es.sortBy(e => (e._3, e._4))
      val changes = ordered.headOption.toSeq ++
        ordered.sliding(2).collect { case Seq(a, b) if a._2 != b._2 => b }
      changes.zipAll(changes.drop(1).map(c => Some(c._3)), null, None).map {
        case (c, next) =>
          val to = next.getOrElse(Analytics.Scd2HighMs)
          (u, c._2, c._3, to, to == Analytics.Scd2HighMs)
      }
    }.sortBy(r => (r._1, r._3))
    assert(rows == expected, "SCD2 intervals must equal the closed-form recomputation")
    rows.groupBy(_._1).foreach { case (u, ivs) =>
      val inOrder = ivs.sortBy(_._3)
      assert(inOrder.count(_._5) == 1, s"user $u must have exactly one current row")
      inOrder.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4 == b._3, s"user $u history not contiguous at ${b._3}")
          assert(a._2 != b._2, s"user $u consecutive intervals share state ${a._2}")
        case _ => ()
      }
    }
  }

  test("gap_fill ≡ plain-Scala recomputation; missing buckets materialize at zero") {
    val rows = Analytics.gapFill(spark, sf)
      .as[(String, Long, Long, Boolean)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    val evs = graft.Tables(spark, sf).events
      .select("event_type", "ts_ms").as[(String, Long)].collect().toSeq
    val counts = evs.map { case (t, ms) => (t, ms / Analytics.GapMs) }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = counts.keys.toSeq.groupBy(_._1).toSeq.flatMap { case (t, bs) =>
      val (b0, b1) = (bs.map(_._2).min, bs.map(_._2).max)
      (b0 to b1).map(b => (t, b, counts.getOrElse((t, b), 0L), !counts.contains((t, b))))
    }.sortBy(r => (r._1, r._2))
    assert(rows == expected, "densified calendar must equal the closed-form model")
    assert(rows.exists(_._4), "the proof corpus must actually have gaps to fill")
    assert(rows.filter(_._4).forall(_._3 == 0L), "filled buckets must be zero-count")
    // the spine is complete: per type, buckets are contiguous
    rows.groupBy(_._1).foreach { case (t, bs) =>
      val sorted = bs.map(_._2).sorted
      assert(sorted == (sorted.head to sorted.last), s"type $t spine has holes")
    }
  }

  test("time_downsample ≡ plain-Scala OHLC recomputation; bars internally consistent") {
    val rows = Analytics.timeDownsample(spark, sf)
      .as[(String, Long, Long, Double, Double, Double, Double, Double)].collect().toSeq
    val evs = graft.Tables(spark, sf).events
      .select("event_type", "ts_ms", "event_id", "value")
      .as[(String, Long, Long, Double)].collect().toSeq
    val expected = evs.groupBy(e => (e._1, e._2 / Analytics.BarMs)).toSeq.map {
      case ((t, b), es) =>
        val ordered = es.sortBy(e => (e._2, e._3))
        val vsum = es.map(e => BigDecimal(e._4).setScale(2, BigDecimal.RoundingMode.HALF_UP)).sum
        (t, b, es.size.toLong, ordered.head._4, es.map(_._4).max, es.map(_._4).min,
          ordered.last._4, vsum.toDouble)
    }.sortBy(r => (r._1, r._2))
    assert(rows == expected, "bars must equal the closed-form recomputation")
    rows.foreach { case (t, b, _, o, h, l, c, _) =>
      assert(l <= o && o <= h && l <= c && c <= h, s"bar ($t,$b) violates OHLC bounds")
    }
  }

  test("incremental_agg: merged partials ≡ direct full aggregation") {
    val merged = Analytics.incrementalAgg(spark, sf).collect().toSeq
    val li = graft.Tables(spark, sf).lineitem
    val full = li.groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("n_rows"),
        sum($"l_quantity".cast("decimal(24,2)")).cast("double").as("sum_qty"),
        sum(round($"l_extendedprice", 2).cast("decimal(24,2)")).cast("double").as("sum_rev"),
        min($"l_shipdate").as("first_ship"), max($"l_shipdate").as("last_ship"))
      .orderBy($"l_returnflag", $"l_linestatus").collect().toSeq
    assert(merged == full, "merge of base+delta partial states must equal the full recompute")
    // the delta slice is non-trivial (the merge actually merged something)
    assert(li.filter($"l_orderkey" % 10 === 0).count() > 0)
    assert(li.filter($"l_orderkey" % 10 =!= 0).count() > 0)
  }

  test("json_metrics ≡ plain-Scala recomputation over parsed props") {
    val rows = Analytics.jsonMetrics(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    val evs = graft.Tables(spark, sf).events
      .select("event_type", "props").as[(String, String)].collect().toSeq
    val kOf = """"k"\s*:\s*(-?\d+)""".r
    val expected = evs.groupBy(_._1).toSeq.map { case (t, es) =>
      val ks = es.flatMap(e => kOf.findFirstMatchIn(e._2).map(_.group(1).toLong))
      (t, es.size.toLong, ks.size.toLong, ks.sum, ks.sum * 1000 / ks.size, ks.min, ks.max)
    }.sortBy(_._1)
    assert(rows == expected, "json metrics must equal the closed-form parse")
    assert(rows.map(_._2).sum == evs.size)
  }

  test("rollup_report: one-pass Expand plan; subtotal lattice internally consistent") {
    val df = Analytics.rollupReport(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"rollup must plan a single Expand, not per-level jobs:\n$plan")
    val rows = df.as[(Int, String, Int, Int, Long, Double)].collect().toSeq
    val leaves = rows.filter(r => r._3 == 0 && r._4 == 0)
    val yearSub = rows.filter(r => r._3 == 0 && r._4 == 1)
    val grand = rows.filter(r => r._3 == 1 && r._4 == 1)
    assert(grand.size == 1 && grand.head._1 == -1 && grand.head._2 == "ALL")
    // counts roll up exactly at every level
    assert(grand.head._5 == leaves.map(_._5).sum)
    yearSub.foreach { ys =>
      assert(ys._5 == leaves.filter(_._1 == ys._1).map(_._5).sum,
        s"year ${ys._1} subtotal count drifts")
    }
    // revenue rolls up within DECIMAL-exact arithmetic (sums are exact,
    // only the final DOUBLE conversion differs per row — compare at 1e-6)
    yearSub.foreach { ys =>
      val leafSum = leaves.filter(_._1 == ys._1).map(_._6).sum
      assert(math.abs(ys._6 - leafSum) < 1e-4, s"year ${ys._1} revenue drifts")
    }
  }

  test("pivot_matrix ≡ per-user event-type counts; explicit column set") {
    val df = Analytics.pivotMatrix(spark, sf)
    assert(df.columns.toSeq == "user_id" +: Analytics.PivotTypes.map(t => s"n_$t"))
    val rows = df.as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val byUser = graft.Tables(spark, sf).events
      .select("user_id", "event_type").as[(Long, String)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.groupBy(_._2).view.mapValues(_.size.toLong).toMap).toMap
    assert(rows.map(_._1).toSet == byUser.keySet)
    rows.foreach { case (u, c, e, p, s, v) =>
      val m = byUser(u)
      val expect = Seq("click", "error", "purchase", "signup", "view").map(m.getOrElse(_, 0L))
      assert(Seq(c, e, p, s, v) == expect, s"user $u pivot row drifts")
    }
  }

  test("skew_profile ≡ plain-Scala recomputation; bounded-heap plan; uniform keys near 1000") {
    val df = Analytics.skewProfile(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GroupedTopKPartial"), s"skew_profile lost the bounded-heap plan:\n$plan")
    val rows = df.select("rank", "user_id", "n_events", "share_ppm", "skew_x1000")
      .as[(Int, Long, Long, Long, Long)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    val counts = graft.Tables(spark, sf).events.select("user_id").as[Long].collect().toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val t = counts.values.sum; val nKeys = counts.size.toLong
    val expected = counts.toSeq.sortBy { case (u, n) => (-n, u) }.take(Analytics.SkewK)
      .zipWithIndex.map { case ((u, n), i) =>
        (i + 1, u, n, n * 1000000L / t, n * nKeys * 1000L / t) }
    assert(rows == expected, "skew profile must equal the closed-form recomputation")
    // synthetic events are near-uniform per user: the top key should sit
    // within a small factor of the mean, and every ratio is >= the last's
    assert(rows.head._5 >= 1000L && rows.head._5 < 10000L, s"top skew ${rows.head._5}")
    assert(rows.sliding(2).forall { case Seq(a, b) => a._5 >= b._5; case _ => true })
  }

  test("compact_plan: first-fit bins in deterministic order, sizes near target") {
    val rows = Analytics.compactPlan(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    // closed-form: running bytes before in source order, then dense ids
    // (an oversized file skips raw quotients; the operator densifies)
    val raw = rows.sortBy(_._1).scanLeft(("", 0L, 0L, 0L, 0L)) {
      case ((_, _, _, _, cum), (s, nd, nb, _)) => (s, nd, nb, cum / Analytics.CompactTarget, cum + nb)
    }.tail
    val dense = raw.map(_._4).distinct.sorted.zipWithIndex.toMap
    val expected = raw.map { case (s, nd, nb, bin, _) => (s, nd, nb, dense(bin).toLong) }
    assert(rows == expected, "bin assignment must equal the densified running-sum model")
    // bins contiguous from 0; each bin's payload stays within target + one file
    val bins = rows.groupBy(_._4)
    assert(bins.keySet == (0L until bins.size.toLong).toSet)
    bins.foreach { case (b, fs) =>
      val bytes = fs.map(_._3).sum
      val maxFile = fs.map(_._3).max
      assert(bytes <= Analytics.CompactTarget + maxFile,
        s"bin $b overshoots: $bytes vs target ${Analytics.CompactTarget}")
    }
  }

  test("zorder_layout ≡ plain-Scala recomputation; interleaving prunes strictly better") {
    val rows = Analytics.zorderLayout(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    graft.CacheRegistry.releaseAll(spark)
    // closed-form model over the same (x, y) grid
    val (x0, x1, y0, y1) = Analytics.ZRect
    val xy = graft.Tables(spark, sf).events.select($"user_id", $"ts_ms")
      .as[(Long, Long)].collect().toSeq
      .map { case (u, ms) => (u % 256, (ms / 60000) % 256) }
    def interleave(x: Long, y: Long): Long =
      (0 until Analytics.ZBits).foldLeft(0L) { (acc, j) =>
        acc + (((x >> j) & 1) << (2 * j)) + (((y >> j) & 1) << (2 * j + 1))
      }
    def model(fileOf: ((Long, Long)) => Long, layout: String): (String, Long, Long, Long, Long, Long) = {
      val byFile = xy.groupBy(fileOf)
      val touched = byFile.filter { case (_, ps) =>
        !(ps.map(_._1).max < x0 || ps.map(_._1).min > x1 ||
          ps.map(_._2).max < y0 || ps.map(_._2).min > y1)
      }
      val matched = xy.count { case (x, y) => x >= x0 && x <= x1 && y >= y0 && y <= y1 }
      (layout, byFile.size.toLong, touched.size.toLong, xy.size.toLong,
        touched.values.map(_.size.toLong).sum, matched.toLong)
    }
    val expected = Seq(
      model({ case (x, _) => x }, "linear"),
      model({ case (x, y) => interleave(x, y) / Analytics.ZCell }, "zorder")).sortBy(_._1)
    assert(rows == expected, "layout stats must equal the closed-form model")
    val Seq(linear, zorder) = rows
    assert(zorder._6 == linear._6, "layout must never change answers (rows_matched)")
    assert(zorder._3 < linear._3 && zorder._5 < linear._5,
      s"z-order must prune strictly better: z=${zorder._3}/${zorder._5} files/rows vs linear=${linear._3}/${linear._5}")
  }

  test("user_history ≡ plain-Scala tail-K recomputation over collected events") {
    import spark.implicits._
    val got = Analytics.userHistory(spark, sf)
      .as[(Long, Long, Long, String, Long)].collect().toSeq
    val ev = graft.Tables(spark, sf).events
      .select($"user_id", $"event_id", $"event_type", $"ts_ms")
      .as[(Long, Long, String, Long)].collect().toSeq
    val expected = ev.groupBy(_._1).toSeq.map { case (u, rows) =>
      // chronological order, deterministic tiebreak (ts_ms, event_id)
      val chron = rows.sortBy(r => (r._4, r._2))
      val tail = chron.takeRight(Analytics.HistK)
      (u, rows.size.toLong, tail.size.toLong,
        tail.map(_._3).mkString(","), chron.last._4)
    }.sortBy(_._1)
    assert(got == expected, "history strings must equal the tail-K recomputation")
    // truncation does real work on this corpus: some user exceeds K events
    assert(expected.exists(_._2 > Analytics.HistK))
    assert(got.forall(_._3 <= Analytics.HistK))
  }

  test("salted_join: salt is an access path (≡ unsalted join), spreads the hot key, and plans the salted shuffle") {
    import spark.implicits._
    val df = Analytics.saltedJoin(spark, sf)
    // plan: a ShuffledHashJoin whose key includes the salt — not a broadcast
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ShuffledHashJoin"), s"salted join lost the shuffle-join shape:\n$plan")
    assert("hashpartitioning\\([^)]*salt".r.findFirstIn(plan).isDefined,
      s"join exchange does not hash the salt:\n$plan")
    val got = df.as[(Long, Long, Long, Long)].collect().toSeq
    // unsalted recomputation: the plain join, same rollup
    val ev = graft.Tables(spark, sf).events
      .select(when($"event_id" % 3 === 0, lit(0L)).otherwise($"user_id").as("skew_user"),
        $"event_type", $"ts_ms")
    val dim = graft.Tables(spark, sf).events
      .groupBy($"user_id").agg(min($"ts_ms").as("first_ms"))
    val expected = ev.join(dim, ev("skew_user") === dim("user_id"))
      .groupBy($"user_id")
      .agg(count(lit(1)).as("n_events"),
        max($"ts_ms" - $"first_ms").as("max_tenure_ms"),
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("n_purchase"))
      .orderBy($"user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == expected, "salted join must equal the unsalted join")
    // the injected key IS hot (~1/3 of the fact side) and the salt spreads
    // it: max (key, salt) bucket is a fraction of the unsalted max bucket
    val buckets = graft.Tables(spark, sf).events
      .select(when($"event_id" % 3 === 0, lit(0L)).otherwise($"user_id").as("k"),
        ($"event_id" % Analytics.SkewSalt).as("salt"))
    val maxKey = buckets.groupBy($"k").count().agg(max($"count")).as[Long].head()
    val maxSalted = buckets.groupBy($"k", $"salt").count().agg(max($"count")).as[Long].head()
    val total = buckets.count()
    assert(maxKey * 4 > total, s"injected key not hot: max=$maxKey of $total")
    assert(maxSalted * 4 <= maxKey,
      s"salt did not spread the hot key: maxSalted=$maxSalted vs maxKey=$maxKey")
  }

  test("burst_detect ≡ plain-Scala trailing-week recomputation; both verdicts live; full baselines only") {
    import spark.implicits._
    val got = Analytics.burstDetect(spark, sf)
      .as[(String, Long, Long, Long, Boolean)].collect().toSeq
    val daily = graft.Tables(spark, sf).events
      .select($"event_type", expr("ts_ms DIV 86400000").as("day"))
      .as[(String, Long)].collect().toSeq
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = daily.keys.toSeq.flatMap { case (t, d) =>
      val base = (1L to 7L).flatMap(k => daily.get((t, d - k)))
      if (base.size == 7) {
        val n = daily((t, d))
        Some((t, d, n, base.sum, n * Analytics.BurstDenom * 7 > Analytics.BurstNumer * base.sum))
      } else None
    }.sortBy(r => (r._1, r._2))
    assert(got == expected, "burst table diverges from the plain-Scala trailing-week recomputation")
    assert(got.exists(_._5) && got.exists(!_._5), "both verdict branches must be live at the spec SF")
    // warm-up discipline: nothing flagged without a full 7-day baseline
    val firstDay = daily.keys.groupBy(_._1).view.mapValues(_.map(_._2).min)
    got.foreach { case (t, d, _, _, _) => assert(d >= firstDay(t) + 7, s"($t, $d) lacks a full baseline") }
  }

  test("attribution_linear ≡ plain-Scala windowed even-split; cents conserve exactly") {
    import spark.implicits._
    val row = Analytics.attributionLinear(spark, sf).collect().head
    graft.CacheRegistry.releaseAll(spark)
    val ev = graft.Tables(spark, sf).events
      .select($"event_id", $"user_id", $"event_type", $"ts_ms",
        expr("CAST(round(value * 100 + 0.000000001) AS BIGINT)").as("cents"))
      .as[(Long, Long, String, Long, Long)].collect().toSeq
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._2)
    val purchases = ev.filter(_._3 == "purchase")
    val credits = scala.collection.mutable.Map.empty[Long, Long] // cid -> cents
    var attributed = 0L; var centsAttr = 0L
    purchases.foreach { case (pid, u, _, pms, cents) =>
      val vis = clicksByUser.getOrElse(u, Seq.empty)
        .filter(c => c._4 <= pms && c._4 > pms - Analytics.AttrWindowMs)
      if (vis.nonEmpty) {
        attributed += 1; centsAttr += cents
        val base = cents / vis.size
        val last = vis.maxBy(c => (c._4, c._1))._1
        vis.foreach { c =>
          val cr = base + (if (c._1 == last) cents % vis.size else 0L)
          if (cr > 0) credits(c._1) = credits.getOrElse(c._1, 0L) + cr
        }
      }
    }
    val expected = ("linear", attributed, purchases.size - attributed, centsAttr,
      credits.values.sum, credits.size.toLong, credits.values.max)
    val got = (row.getString(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4), row.getLong(5), row.getLong(6))
    assert(got == expected, s"$got != $expected")
    // conservation: every attributed cent lands on some click, exactly once
    assert(row.getLong(3) == row.getLong(4), "cents not conserved through the split")
    // the lookback genuinely excludes clicks (vs №132's unbounded history)
    assert(row.getLong(2) > 0, "every purchase attributed — the window does no work here")
  }

  test("session_paths ≡ plain-Scala session-path recomputation; shares exact; head paths dominate") {
    import spark.implicits._
    val got = Analytics.sessionPaths(spark, sf)
      .as[(String, Long, Long)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    val ev = graft.Tables(spark, sf).events
      .select($"user_id", $"event_id", $"event_type", $"ts_ms")
      .as[(Long, Long, String, Long)].collect().toSeq
    // rebuild sessions with the №35 gap rule, then paths
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._4, r._2))
      val sessions = scala.collection.mutable.ArrayBuffer.empty[Vector[String]]
      var prev = Long.MinValue
      sorted.foreach { r =>
        if (prev == Long.MinValue || r._4 - prev > Analytics.SessionGapMs)
          sessions += Vector.empty
        sessions(sessions.size - 1) = sessions.last :+ r._3
        prev = r._4
      }
      sessions.map(_.mkString(">"))
    }
    val total = paths.size.toLong
    val expected = paths.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .map { case (p, c) => (p, c, c * 1000000L / total) }
      .sortBy { case (p, c, _) => (-c, p) }.take(Analytics.PathK)
    assert(got == expected, "top paths diverge from the plain-Scala recomputation")
    assert(got.head._2 > 1L, "no repeated path — the mining is vacuous on this corpus")
  }

  test("ab_test ≡ plain-Scala 2x2 chi-square; significance decision is the exact rational compare") {
    import spark.implicits._
    val row = Analytics.abTest(spark, sf).collect().head
    val (a, b, c, d) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    // recompute the table from raw events
    val np = graft.Tables(spark, sf).events
      .select($"user_id", ($"event_type" === "purchase").cast("long").as("p"))
      .as[(Long, Long)].collect().toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val nu = np.size.toLong; val tp = np.values.sum
    def cell(arm: Long, conv: Boolean) =
      np.count { case (u, n) => u % 2 == arm && (n * nu > tp) == conv }.toLong
    assert((a, b, c, d) == (cell(0, true), cell(0, false), cell(1, true), cell(1, false)))
    assert(a + b + c + d == nu)
    // chi-square and the exact significance decision
    val n = a + b + c + d
    val num = n * (a * d - b * c) * (a * d - b * c)
    val den = (a + b) * (c + d) * (a + c) * (b + d)
    val chi2 = BigDecimal(num.toDouble / den.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(row.getDouble(6) == chi2)
    assert(row.getBoolean(7) == (num * 1000 > 3841 * den),
      "significance must be the exact integer cross-compare, not a float threshold")
    // the outcome split does real work: both converted and non-converted exist
    assert(a + c > 0 && b + d > 0)
  }

  test("ab_test: DECIMAL(38) cross-compare is exact past the BIGINT ~55k-user cliff") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("abtest_big").toString
    try {
      // 60k users: arm 0 (even ids) has 25000 purchasers, arm 1 (odd ids)
      // has 100 — a lopsided table whose (ad−bc)²·N·1000 provably wraps
      // BIGINT. Non-purchasers get a click so every user exists in the
      // per-user frame; ts is the LONG-nanos physical layout.
      val nUsers = 60000L
      val rows = (0L until nUsers).map { u =>
        val purchaser = (u % 2 == 0 && u / 2 < 25000) || (u % 2 == 1 && u / 2 < 100)
        (u, if (purchaser) "purchase" else "click", u * 1000000L)
      }
      rows.toDF("user_id", "event_type", "ts")
        .write.mode("overwrite").parquet(tmp + "/events.parquet")
      val row = Analytics.abTest(spark, tmp).collect().head
      val (a, b, c, d) = (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
      // conv = np·nu > tp: 1·60000 > 25100 for every purchaser, 0 for the rest
      assert((a, b, c, d) == (25000L, 5000L, 100L, 29900L), s"unexpected cells ($a,$b,$c,$d)")
      val n = BigInt(a + b + c + d)
      val cross = BigInt(a) * BigInt(d) - BigInt(b) * BigInt(c)
      val num = n * cross * cross
      assert(num * 1000 > BigInt(Long.MaxValue),
        "corpus does not cross the BIGINT cliff — the overflow test is vacuous")
      val den = BigInt(a + b) * BigInt(c + d) * BigInt(a + c) * BigInt(b + d)
      assert(row.getBoolean(7) == (num * 1000 > BigInt(3841) * den),
        "significance decision diverges from the exact BigInt cross-compare past the cliff")
      val chi2 = BigDecimal(num.toDouble / den.toDouble)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(row.getDouble(6) == chi2, s"chi2 ${row.getDouble(6)} != BigInt-derived $chi2")
      assert(row.getBoolean(7), "this lopsided table must read significant")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tmp))
    }
  }

  test("attribution ≡ plain-Scala first/last-touch recomputation; models genuinely differ") {
    import spark.implicits._
    val got = Analytics.attribution(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    graft.CacheRegistry.releaseAll(spark)
    val ev = graft.Tables(spark, sf).events
      .select($"event_id", $"user_id", $"event_type", $"ts_ms",
        expr("CAST(round(value * 100 + 0.000000001) AS BIGINT)").as("cents"))
      .as[(Long, Long, String, Long, Long)].collect().toSeq
    val clicksByUser = ev.filter(_._3 == "click").groupBy(_._2)
    val per = ev.filter(_._3 == "purchase").map { case (pid, u, _, pts, cents) =>
      val vis = clicksByUser.getOrElse(u, Seq.empty).filter(_._4 <= pts)
      val firstC = if (vis.isEmpty) None else Some(vis.minBy(c => (c._4, c._1))._1)
      val lastC = if (vis.isEmpty) None else Some(vis.maxBy(c => (c._4, c._1))._1)
      (pid, cents, firstC, lastC)
    }
    def roll(model: String, pick: ((Long, Long, Option[Long], Option[Long])) => Option[Long]) = (
      model,
      per.count(p => pick(p).isDefined).toLong,
      per.count(p => pick(p).isEmpty).toLong,
      per.filter(p => pick(p).isDefined).map(_._2).sum,
      per.flatMap(pick).distinct.size.toLong)
    val expected = Seq(roll("first_touch", _._3), roll("last_touch", _._4)).sortBy(_._1)
    assert(got == expected, "attribution rollups must equal the plain-Scala recomputation")
    // the two models disagree on this corpus (multi-click users exist),
    // and some purchases are attributed
    assert(per.exists(p => p._3 != p._4), "first == last everywhere — models indistinguishable")
    assert(got.forall(_._2 > 0))
  }
}
