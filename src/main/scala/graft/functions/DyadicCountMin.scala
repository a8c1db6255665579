package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Dyadic Count-Min sketch (public: Cormode & Muthukrishnan 2005 §4.2,
  * "range queries / quantiles") — the QUANTILE member of the sketch
  * family ([[MisraGries]]: the heavy set, [[HyperLogLog]]: the distinct
  * count, [[CountMin]]: point frequencies, this: "what value sits at
  * rank q·N" for any q): one [[CountMin]]-style counter grid PER DYADIC
  * LEVEL l ∈ [0, levels), where level l counts the interval id
  * `value >> l`. The rank of any prefix [0, v] then reads as the sum of
  * ≤ `levels` point queries — the canonical dyadic decomposition of
  * [0, v+1) takes one interval per set bit of v+1, at index
  * `((v+1) >> l) − 1` — and the q-quantile is the smallest present
  * value whose estimated rank reaches ⌈q·N⌉.
  *
  * Chosen over KLL/t-digest deliberately: their compactor/centroid
  * buffers are merge-ORDER-dependent, so a distributed run's sketch
  * content is not reproducible by any engine-independent oracle — only
  * bound-checkable. The dyadic grid is a LINEAR sketch (merge =
  * elementwise sum, associative + commutative: any merge tree yields
  * identical counters, spec-pinned), and every slot is md5-derived
  * ([[CountMin.slot]] with the level baked into the item), so the
  * estimated quantiles AND their measured error vs the exact answer are
  * integer-EXACT under the DuckDB oracle — the №142/№147 discipline
  * applied to the one member of the family those papers' authors built
  * for rank queries.
  *
  * Guarantees carried to the driver row: every dyadic point query only
  * ever over-counts (colliding intervals add), so est_rank(v) ≥
  * true_rank(v) for every v, hence the estimated quantile is ≤ the
  * exact quantile — ONE-SIDED in the value domain (spec-pinned).
  * Expected rank error ≈ Σ_set-bits N/width, shrunk by the min over
  * depth rows; the driver row MEASURES it per group instead of
  * asserting the ε-δ bound.
  *
  * Values clamp to [0, 2^levels): the clamp keeps the total mass N
  * exact (rank targets stay correct); the top clamp value's rank is
  * answered as N directly (the whole-domain interval is level `levels`,
  * which the grid deliberately does not store). Sizing at 100 TB:
  * `levels` tracks the value domain (17 covers 128k-token contexts),
  * width the inverse rank error — state is levels·depth·width longs
  * regardless of N, one grid per group per partition to the shuffle. */
case class DyadicCountMin(
    child: Expression,
    levels: Int,
    depth: Int,
    width: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(levels >= 1 && levels <= 20 && depth >= 1 && depth <= 16 &&
    width >= 2 && width <= 65536,
    s"dyadic_count_min($levels, $depth, $width) out of range")

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"dyadic_count_min requires an integral child, got ${other.catalogString}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "dyadic_count_min"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](levels * depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val raw = v match {
        case l: java.lang.Long => l.longValue()
        case i: java.lang.Integer => i.longValue()
      }
      val max = (1L << levels) - 1
      val x = if (raw < 0) 0L else if (raw > max) max else raw
      var l = 0
      while (l < levels) {
        val idx = x >> l
        var d = 0
        while (d < depth) {
          buf((l * depth + d) * width + CountMin.slot(d, s"$l:$idx", width)) += 1L
          d += 1
        }
        l += 1
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
    // version tag first, same contract as [[MisraGries.serialize]]:
    // grid buffers outlive runs inside durable streaming-state
    // checkpoints (№164 windows them), so a future layout change must
    // fail cleanly on old bytes instead of decoding garbage counters.
    val bb = java.nio.ByteBuffer.allocate(1 + buf.length * 8)
    bb.put(DyadicCountMin.FormatVersion)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val ver = bb.get()
    require(ver == DyadicCountMin.FormatVersion,
      s"DyadicCountMin buffer format $ver != ${DyadicCountMin.FormatVersion}: " +
        "state written by an incompatible version; clear the checkpoint")
    require(bytes.length == 1 + levels * depth * width * 8,
      s"DyadicCountMin buffer length ${bytes.length} != geometry " +
        s"($levels, $depth, $width): state written under different dials")
    Array.fill(levels * depth * width)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): DyadicCountMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DyadicCountMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object DyadicCountMin {
  /** Serialized-buffer format version (see [[DyadicCountMin.serialize]]). */
  val FormatVersion: Byte = 1

  /** Column API: the flattened levels×depth×width counter grid
    * (index = (l·depth + d)·width + slot). */
  def sketch(value: Column, levels: Int, depth: Int, width: Int): Column =
    ColumnBridge.toCol(DyadicCountMin(
      ColumnBridge.toExpr(value), levels, depth, width).toAggregateExpression())
}
