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

/** Count-Min sketch (public: Cormode & Muthukrishnan 2005) as a native
  * aggregate — the FREQUENCY-POINT-QUERY member of the sketch family
  * ([[MisraGries]] finds the heavy set, [[HyperLogLog]] counts the
  * distinct set, Count-Min answers "how often does THIS item occur" for
  * any item): a fixed depth×width counter grid per partition to the
  * shuffle, where the exact answer needs the full per-item groupBy.
  * Guarantee: est(x) ≥ count(x) ALWAYS (never under — each of the depth
  * rows only ever adds colliding items), and est − count ≤ εN with
  * probability 1−δ at width = e/ε, depth = ln(1/δ); the №147 driver row
  * MEASURES the overcount against exact counts instead of asserting it.
  *
  * Merge is elementwise SUM — associative and commutative, so any merge
  * tree yields IDENTICAL counters (spec-pinned; unlike max-merge it is
  * NOT idempotent — re-merging the same partial double-counts, the
  * documented Count-Min property shared with every linear sketch).
  *
  * Cross-engine determinism (§5): row d's hash for item x is the first
  * 15 hex nibbles of md5("d|x") mod width — a 60-bit non-negative
  * integer both engines derive exactly, so counters, estimates, and
  * measured overcounts are integer-EXACT under the DuckDB oracle. */
case class CountMin(
    child: Expression,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(depth >= 1 && depth <= 16 && width >= 2 && width <= 65536,
    s"count_min($depth, $width) out of range")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"count_min requires a STRING child, got ${other.catalogString}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "count_min"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      var d = 0
      while (d < depth) {
        buf(d * width + CountMin.slot(d, s, width)) += 1L
        d += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(depth * width)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object CountMin {

  private val md5TL: ThreadLocal[java.security.MessageDigest] =
    ThreadLocal.withInitial(() => java.security.MessageDigest.getInstance("MD5"))

  /** Row-d slot of item x: first 15 md5 nibbles of "d|x" (60-bit
    * non-negative) mod width — the [[HyperLogLog.regRank]] hash recipe,
    * row-salted. */
  def slot(d: Int, x: String, width: Int): Int = {
    val md = md5TL.get()
    md.reset()
    val dig = md.digest(s"$d|$x".getBytes("UTF-8"))
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (dig(i) & 0xffL); i += 1 }
    ((top >>> 4) % width).toInt
  }

  /** Column API: the flattened depth×width counter grid
    * (index = d·width + slot). */
  def sketch(item: Column, depth: Int, width: Int): Column =
    ColumnBridge.toCol(CountMin(
      ColumnBridge.toExpr(item), depth, width).toAggregateExpression())
}
