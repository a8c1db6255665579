package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.util.PriorityQueue

/** Grouped top-k as a native aggregate: a bounded heap per group with
  * map-side PARTIAL aggregation — each input partition contributes at most
  * k rows to the shuffle, vs. a window row_number() which shuffles and
  * sorts EVERY candidate row per group. For kNN at corpus scale that's the
  * difference between shuffling k·partitions rows and shuffling the whole
  * scored corpus.
  *
  * Order: score DESC, id ASC (deterministic under 6dp-rounded score ties).
  * Result: array<struct<score double, id bigint>> sorted in rank order.
  *
  * `distinct = true` keeps the k best DISTINCT (score, id) entries — an
  * exact duplicate of a held entry is skipped (O(k) containment scan,
  * fine for the small-k second-min use). The multiprobe signature's
  * second-min needs this: the DuckDB oracle's `min(h) WHERE h > m` is
  * the second DISTINCT hash, so a within-doc 48-bit collision must not
  * make the heap emit s = m (gap 0, probe key == base key).
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    distinct: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[PriorityQueue[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKByScore.entryType, containsNull = false)
  override def prettyName: String = "top_k_by_score"

  // heap head = current WEAKEST entry (lowest score, then largest id).
  // Explicit comparator — an Ordering.by(-id) negation would overflow at
  // Long.MinValue.
  private def heapOrdering: Ordering[(Double, Long)] = new Ordering[(Double, Long)] {
    override def compare(x: (Double, Long), y: (Double, Long)): Int = {
      val c = java.lang.Double.compare(x._1, y._1)
      if (c != 0) c else java.lang.Long.compare(y._2, x._2)
    }
  }

  override def createAggregationBuffer(): PriorityQueue[(Double, Long)] =
    new PriorityQueue[(Double, Long)](k + 1, heapOrdering)

  override def update(buf: PriorityQueue[(Double, Long)], input: InternalRow): PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) offer(buf, (s.asInstanceOf[Double], i.asInstanceOf[Long]))
    buf
  }

  private def offer(buf: PriorityQueue[(Double, Long)], e: (Double, Long)): Unit = {
    if (distinct && buf.contains(e)) return
    if (buf.size < k) buf.offer(e)
    else if (heapOrdering.compare(e, buf.peek()) > 0) { buf.poll(); buf.offer(e) }
  }

  override def merge(a: PriorityQueue[(Double, Long)], b: PriorityQueue[(Double, Long)]): PriorityQueue[(Double, Long)] = {
    val it = b.iterator()
    while (it.hasNext) offer(a, it.next())
    a
  }

  override def eval(buf: PriorityQueue[(Double, Long)]): Any = {
    val arr = new Array[(Double, Long)](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    // rank order: score desc, id asc
    val sorted = arr.sortBy { case (s, id) => (-s, id) }
    new GenericArrayData(sorted.map { case (s, id) =>
      InternalRow(s, id): Any
    })
  }

  override def serialize(buf: PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) { val (s, i) = it.next(); out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.offer((in.readDouble(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  val entryType: StructType = StructType(Seq(
    StructField("score", DoubleType, nullable = false),
    StructField("id", LongType, nullable = false)))

  /** Column API: array of the k best (score, id) pairs, rank-ordered. */
  def topK(score: Column, id: Column, k: Int): Column =
    ColumnBridge.toCol(TopKByScore(
      ColumnBridge.toExpr(score), ColumnBridge.toExpr(id), k).toAggregateExpression())

  /** As [[topK]] but keeps the k best DISTINCT (score, id) entries. */
  def topKDistinct(score: Column, id: Column, k: Int): Column =
    ColumnBridge.toCol(TopKByScore(
      ColumnBridge.toExpr(score), ColumnBridge.toExpr(id), k,
      distinct = true).toAggregateExpression())
}
