package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch (public: Flajolet et al. 2007; the
  * stochastic-averaging register form) as a native aggregate with map-side
  * PARTIAL aggregation — the mergeable-cardinality twin of [[MisraGries]]:
  * each scan partition contributes a FIXED 2^p-register buffer to the
  * shuffle, where exact `countDistinct` plans an Expand and shuffles one
  * row per distinct value per partition (at 100 TB, distinct users/
  * shingles/urls are billions — the dominant shuffle of any corpus-stats
  * pass). Standard error ≈ 1.04/√m (m = 2^p registers; p=8 → ~6.5%),
  * MEASURED against exact countDistinct in the №142 driver row rather
  * than asserted.
  *
  * Merge is register-wise MAX — associative, commutative, IDEMPOTENT — so
  * ANY merge tree (any partitioning, any union nesting, repeated merges of
  * the same partial) yields byte-identical registers: a strictly stronger
  * guarantee than MisraGries' bounded merge drift, and spec-pinned on
  * adversarial trees.
  *
  * Cross-engine determinism (§5): the hash is the first 15 hex nibbles of
  * md5(value) — a 60-bit integer both engines can derive exactly — split
  * top-p register index / remaining (60−p)-bit suffix, rank = leading
  * zeros + 1 capped at [[HyperLogLog.RankCap]] (keeps the №142 estimate
  * sum Σ2^(cap−rank) an exact BIGINT and an exactly-representable double;
  * the cap costs nothing below ~2^32 true cardinality). The register
  * arrays — and therefore the estimate — are bit-identical between Spark
  * and the DuckDB oracle's pure-SQL recomputation.
  */
case class HyperLogLog(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  require(p >= 4 && p <= 16, s"p=$p out of [4,16]")
  private val m = 1 << p
  private val w = 60 - p // suffix bits of the 60-bit md5-derived hash

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hyper_log_log requires a STRING child, got ${other.catalogString}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hyper_log_log"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](m)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val (reg, rank) = HyperLogLog.regRank(v.asInstanceOf[UTF8String].getBytes, p)
      if (rank > buf(reg)) buf(reg) = rank
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Int]): Array[Byte] = {
    // ranks ≤ RankCap < 128: one byte per register
    val out = new Array[Byte](m)
    var i = 0
    while (i < m) { out(i) = buf(i).toByte; i += 1 }
    out
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val buf = new Array[Int](m)
    var i = 0
    while (i < m) { buf(i) = bytes(i).toInt; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HyperLogLog =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HyperLogLog =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object HyperLogLog {

  /** Rank cap: registers saturate here so Σ2^(RankCap−rank) stays an exact
    * BIGINT/double in the estimate arithmetic (№142). Below ~2^32 true
    * cardinality a rank this high is a ~2^-32 event per register. */
  val RankCap = 32

  private val md5TL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** (register, capped rank) of one value: 60-bit hash from the first 15
    * hex nibbles of md5 (= the first 8 digest bytes, big-endian, >>> 4),
    * top p bits register, rank = (60−p)-bit suffix's leading zeros + 1. */
  def regRank(bytes: Array[Byte], p: Int): (Int, Int) = {
    val md = md5TL.get()
    md.reset()
    val d = md.digest(bytes)
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (d(i) & 0xffL); i += 1 }
    val h = top >>> 4 // first 15 nibbles: 60 bits, non-negative
    val w = 60 - p
    val reg = (h >>> w).toInt
    val rest = h & ((1L << w) - 1)
    val rank = if (rest == 0L) w + 1 else w - (64 - java.lang.Long.numberOfLeadingZeros(rest)) + 1
    (reg, math.min(rank, RankCap))
  }

  /** Column API: the 2^p register array (rank per register). */
  def sketch(item: Column, p: Int): Column =
    ColumnBridge.toCol(HyperLogLog(
      ColumnBridge.toExpr(item), p).toAggregateExpression())
}
