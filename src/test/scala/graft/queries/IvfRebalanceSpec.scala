package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row

/** №172 knn_ivf_rebalance: the drift-triggered re-cluster's contracts.
  * The oracle pins the VALUES; this pins the DIRECTIONS the operator's
  * story rides on — trigger fires, occupancy and tightness improve, the
  * scan bill collapses, per-candidate efficiency rises, and the
  * stale index's accidental equal-probe recall win (the hot-cell
  * artifact the scaladoc narrates) stays the direction it is. */
class IvfRebalanceSpec extends SparkSpec {

  private def byKey(rows: Array[Row]): Map[(String, Long), Row] =
    rows.map(r => (r.getString(0), r.getLong(1)) -> r).toMap

  test("trigger fires; rebalance fixes occupancy, tightness and scan cost; the equal-probe recall trap is real") {
    val out = VectorQueries.knnIvfRebalance(spark, sf).collect()
    assert(out.length == 2 * VectorQueries.RebalProbes.length)
    val m = byKey(out)
    def f(phase: String, probe: Int, col: String): Long = {
      val r = m((phase, probe.toLong))
      col match {
        case "tv_ppm" => r.getLong(2)
        case "max_cell_n" => r.getLong(5)
        case "max_over_mean_ppm" => r.getLong(6)
        case "mean_ccos_ppm" => r.getLong(7)
        case "n_cand" => r.getLong(8)
        case "n_hits" => r.getLong(9)
      }
    }
    val p0 = VectorQueries.RebalProbes.head
    val pw = VectorQueries.RebalProbes.last
    // the monitor genuinely fires: drift reads far above the threshold
    out.foreach { r =>
      assert(r.getLong(2) > VectorQueries.RebalTvThresholdPpm, "tv_ppm at/below threshold")
      assert(r.getBoolean(3), "triggered flag not set")
    }
    // occupancy: the hot cell collapses, the max/mean ratio with it
    assert(f("t1_rebalanced", p0, "max_cell_n") < f("t0_stale", p0, "max_cell_n") / 2,
      "rebalance did not collapse the hot cell")
    assert(f("t1_rebalanced", p0, "max_over_mean_ppm") < f("t0_stale", p0, "max_over_mean_ppm"),
      "max-over-mean occupancy did not improve")
    // tightness: vectors sit closer to their own centroid after re-train
    assert(f("t1_rebalanced", p0, "mean_ccos_ppm") > f("t0_stale", p0, "mean_ccos_ppm"),
      "assignment tightness did not improve")
    // scan bill: at every probe the rebalanced index scores fewer candidates,
    // and per-candidate efficiency (hits per scored row) strictly rises
    VectorQueries.RebalProbes.foreach { p =>
      assert(f("t1_rebalanced", p, "n_cand") < f("t0_stale", p, "n_cand"),
        s"probe $p: candidate volume did not drop")
      assert(f("t1_rebalanced", p, "n_hits") * f("t0_stale", p, "n_cand") >
        f("t0_stale", p, "n_hits") * f("t1_rebalanced", p, "n_cand"),
        s"probe $p: hits-per-candidate efficiency did not rise")
    }
    // the honest trap: at the narrow probe the STALE index wins on raw hits
    // (its hot cell is accidental exhaustive search) — pinned so the
    // scaladoc's narrative stays true to the data
    assert(f("t0_stale", p0, "n_hits") > f("t1_rebalanced", p0, "n_hits"),
      "equal-probe accidental-recall direction flipped — re-narrate the scaladoc")
    // and the wide-probe rebalanced point beats the stale FLOOR on cost
    // while staying within K·NQueries sight of its hits
    assert(f("t1_rebalanced", pw, "n_cand") < f("t0_stale", p0, "n_cand"),
      "rebalanced wide-probe scan bill not below the stale narrow-probe floor")
    assert(f("t1_rebalanced", pw, "n_hits") * 10 >= f("t0_stale", p0, "n_hits") * 8,
      "rebalanced wide-probe recall fell below 80% of the stale narrow-probe hits")
  }
}
