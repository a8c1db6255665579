package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Bloom-filter membership pre-pass, built on Spark's OWN bloom machinery
  * — the `BloomFilterAggregate` / `BloomFilterMightContain` expression
  * pair the optimizer's runtime join filtering (`InjectRuntimeFilter`)
  * plans internally. Neither is registered in the public function
  * registry, so [[ColumnBridge]] lifts them into Columns; the probe side
  * is full codegen (no UDF on the scan path).
  *
  * Scale shape (the `dedup_incremental` daily-run case): aggregate the
  * SMALL side's keys into a sketch whose size is bounded by `numBits`
  * regardless of corpus scale, hold it on the driver like the k-means
  * sample (a by-design bounded collect), and pre-filter the 100 TB side's
  * SCAN with it — the big side is still read once, but it is never
  * SHUFFLED: only the ~|small| + false-positive rows that survive the
  * probe enter the join exchange. No false negatives, so an anti-join
  * against the pre-filtered side is EXACTLY the anti-join against the
  * full side (equality spec-pinned in QuerySpecs).
  */
object BloomMembership {

  /** Aggregate `c`'s values (hashed xxhash64, the pair's contract) into a
    * serialized bloom filter. One pass, mergeable partials map-side. */
  def buildBloom(df: DataFrame, c: Column, expectedItems: Long, numBits: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      ColumnBridge.toExpr(xxhash64(c)),
      Literal(expectedItems), Literal(numBits))
    df.select(ColumnBridge.toCol(agg.toAggregateExpression()).as("bf"))
      .collect()(0).getAs[Array[Byte]]("bf")
  }

  /** Membership probe column: true if `c` MIGHT be in the sketch (false
    * positives possible, false negatives impossible). */
  def mightContain(bloom: Array[Byte], c: Column): Column =
    ColumnBridge.toCol(BloomFilterMightContain(
      ColumnBridge.toExpr(lit(bloom)),
      ColumnBridge.toExpr(xxhash64(c))))
}
