package graft

/** The driver contract's flagship smoke, pinned locally too: `entry`
  * must produce rows on sf0.001 (it is №10 export_records — the full
  * scan → envelope → decrypt → validate → sanitise pipeline). */
class EntrySpec extends SparkSpec {
  test("SparkEntry.entry yields rows on the smoke corpus") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
