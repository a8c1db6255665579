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

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import scala.collection.mutable

/** Misra-Gries frequent-items sketch (public: Misra & Gries 1982; the
  * mergeable-summaries form of Agarwal et al., PODS 2012) as a native
  * aggregate with map-side PARTIAL aggregation: each scan partition
  * contributes at most k (token, estimate) entries to the shuffle — the
  * full-vocabulary `groupBy(token)` it replaces shuffles one partial per
  * DISTINCT token per partition, which at 100 TB (n-gram vocabularies in
  * the billions) is the dominant shuffle. The price is approximation with
  * a PROVABLE bound: for every item, `count − N/(k+1) ≤ estimate ≤ count`
  * (absent ⇒ estimate 0), so the sketch is a guaranteed SUPERSET of every
  * item with count > N/(k+1) — an exact bounded second pass turns the
  * candidate set into exact answers (graft.queries.TextQueries
  * №123 heavy_hitters).
  *
  * update: classic MG — hit increments; miss inserts while < k counters
  * remain; a miss at capacity decrements ALL counters (dropping zeros).
  * merge: counter maps sum by key, then if over k entries the (k+1)-th
  * largest estimate is subtracted from all (entries ≤ 0 drop) — the
  * Agarwal merge rule, which keeps the buffer ≤ k and the global bound
  * intact under ANY merge tree (the aggregate's output is merge-order-
  * dependent only WITHIN the bound; №123's exact re-count makes the final
  * answer deterministic).
  */
case class MisraGries(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  override def children: Seq[Expression] = Seq(child)

  // Reject non-string children at analysis time (ClassCastException on an
  // executor is the alternative failure mode for e.g. misra_gries(bigint, k)).
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"misra_gries requires a STRING child, got ${other.catalogString}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(MisraGries.entryType, containsNull = false)
  override def prettyName: String = "misra_gries"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1L)
        case None if buf.size < k => buf.update(key, 1L)
        case None =>
          // decrement-all: one arrival cancels one unit of k tracked items
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1L)
          buf.foreach { case (t, c) => if (c <= 0L) dead += t }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      // Agarwal merge rule: subtract the (k+1)-th largest estimate
      val cut = a.values.toArray.sortBy(-_).apply(k)
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (t, c) => if (c <= 0L) dead += t }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    // estimate DESC, token ASC: a deterministic array order for any given
    // buffer content (content itself is merge-order-dependent, see above)
    val sorted = buf.toArray.sortBy { case (t, c) => (-c, t) }
    new GenericArrayData(sorted.map { case (t, c) =>
      InternalRow(UTF8String.fromString(t), c): Any
    })
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    // version tag first: buffers can outlive a run inside durable
    // streaming-state checkpoints, so a future format change must fail
    // cleanly on old bytes instead of decoding garbage.
    out.writeByte(MisraGries.FormatVersion)
    out.writeInt(buf.size)
    // int length + raw UTF-8 bytes, NOT writeUTF: writeUTF throws
    // UTFDataFormatException past 65535 encoded bytes, and one pathological
    // token would kill the whole aggregation at shuffle time.
    buf.foreach { case (t, c) =>
      val b = t.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val ver = in.readByte()
    require(ver == MisraGries.FormatVersion,
      s"MisraGries buffer format $ver != ${MisraGries.FormatVersion}: " +
        "state written by an incompatible version; clear the checkpoint")
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf.update(new String(b, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGries =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGries =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object MisraGries {
  /** Serialized-buffer format version (see [[MisraGries.serialize]]). */
  val FormatVersion: Byte = 2

  val entryType: StructType = StructType(Seq(
    StructField("tok", StringType, nullable = false),
    StructField("est", LongType, nullable = false)))

  /** Column API: the ≤ k (tok, est) sketch entries, estimate-ordered. */
  def sketch(item: Column, k: Int): Column =
    ColumnBridge.toCol(MisraGries(
      ColumnBridge.toExpr(item), k).toAggregateExpression())
}
