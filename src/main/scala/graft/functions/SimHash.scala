package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

import java.security.MessageDigest

/** 60-bit SimHash fingerprint of a token array as ONE native expression.
  *
  * Semantically identical to the relational formulation the DuckDB oracle
  * uses (per-token h = first 15 md5 hex chars as a long; fingerprint bit b
  * = sign of Σ±1 over token occurrences), but computed in a single pass
  * per row — replacing an explode + 60× bit-join + two shuffles with a
  * narrow projection. At 100 TB that's the difference between a scan-bound
  * job and a 60×-row shuffle.
  *
  * Codegen: static call, stays inside the whole-stage span.
  */
case class SimHash60(tokens: Expression) extends UnaryExpression {
  override def child: Expression = tokens
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    SimHash60.fingerprint(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash60.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(tokens = newChild)
}

object SimHash60 {
  val Bits = 60

  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))
  private val hexChars = "0123456789abcdef".toCharArray

  /** First 15 hex chars of md5(token) as a 60-bit long — matches
    * `conv(substring(md5(tok),1,15),16,10)` and the oracle's nibble parse. */
  def tokenHash(token: String): Long = {
    val md = digestTL.get()
    md.reset()
    val d = md.digest(token.getBytes("UTF-8"))
    // 15 hex chars = 7.5 bytes: bytes 0..6 fully + high nibble of byte 7
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    (h << 4) | ((d(7) & 0xf0L) >> 4)
  }

  def fingerprint(tokens: ArrayData): Long = {
    val counts = new Array[Int](Bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = tokenHash(tokens.getUTF8String(i).toString)
        var b = 0
        while (b < Bits) {
          if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < Bits) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  def simhash60(tokens: Column): Column =
    ColumnBridge.toCol(SimHash60(ColumnBridge.toExpr(tokens)))
}

/** 96-bit SimHash as struct(hi, lo) — two 48-bit halves, the SCALE-path
  * fingerprint for LSH dedup.
  *
  * Why 96 and not 60: LSH banding for hamming ≤ 3 needs 4 bands
  * (pigeonhole), and the band key width bounds candidate-pair growth. 60-bit
  * fingerprints give 15-bit bands → 32,768 possible keys per band, so bucket
  * sizes — and the within-bucket all-pairs verify — grow O(n²/2¹⁵): a
  * quadratic cliff somewhere around 10⁸ documents. 96-bit fingerprints give
  * 24-bit bands → 16.7M keys, pushing the same cliff out 512×, while the
  * fingerprint stays two codegen-friendly longs (no decimal/binary
  * arithmetic anywhere downstream).
  *
  * Token hash = first 24 hex chars of md5 (hi = chars 1-12, lo = 13-24),
  * bit b of the 96-bit value = b<48 ? bit b of lo : bit b-48 of hi — the
  * DuckDB oracle re-derives this relationally (nibble parse + 96-way bit
  * join) as an independent formulation.
  */
case class SimHash96(tokens: Expression) extends UnaryExpression {
  override def child: Expression = tokens
  override def dataType: DataType = SimHash96.schema
  override def prettyName: String = "simhash96"

  override protected def nullSafeEval(input: Any): Any =
    SimHash96.fingerprint(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash96.fingerprint($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(tokens = newChild)
}

object SimHash96 {
  val Bits = 96
  val Half = 48

  val schema: StructType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false)))

  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** (hi, lo) 48-bit halves of the first 24 hex chars of md5(token):
    * hi = chars 1-12 (md5 bytes 0-5), lo = chars 13-24 (bytes 6-11). */
  def tokenHash(token: String): (Long, Long) = {
    val md = digestTL.get()
    md.reset()
    val d = md.digest(token.getBytes("UTF-8"))
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < 6) { hi = (hi << 8) | (d(i) & 0xffL); i += 1 }
    while (i < 12) { lo = (lo << 8) | (d(i) & 0xffL); i += 1 }
    (hi, lo)
  }

  def fingerprint(tokens: ArrayData): InternalRow = {
    val counts = new Array[Int](Bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val (hi, lo) = tokenHash(tokens.getUTF8String(i).toString)
        var b = 0
        while (b < Half) {
          if (((lo >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          if (((hi >> b) & 1L) == 1L) counts(Half + b) += 1 else counts(Half + b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fpHi = 0L; var fpLo = 0L
    var b = 0
    while (b < Half) {
      if (counts(b) > 0) fpLo |= (1L << b)
      if (counts(Half + b) > 0) fpHi |= (1L << b)
      b += 1
    }
    new GenericInternalRow(Array[Any](fpHi, fpLo))
  }

  def simhash96(tokens: Column): Column =
    ColumnBridge.toCol(SimHash96(ColumnBridge.toExpr(tokens)))
}

/** [[SimHash96]] plus the raw per-bit SUMS — the query-directed probing
  * statistic for №182's Hamming-ball multiprobe: bit b of the fingerprint
  * is sign(sums[b]), so |sums[b]| is the MARGIN by which the corpus of
  * tokens voted that bit — a near-duplicate's edit flips the low-margin
  * bits first (unlike minhash's exchangeable hash space, the margin
  * carries real metric structure — №174 vs №181). Same single pass as
  * SimHash96; the sums array (96 ints) is the only addition.
  * Struct ordering: (hi, lo, sums) with sums[b] the signed vote for bit b
  * (b < 48 → lo half, else hi), matching the oracle's `bits` CTE.
  */
case class SimHash96Sums(tokens: Expression) extends UnaryExpression {
  override def child: Expression = tokens
  override def dataType: DataType = SimHash96Sums.schema
  override def prettyName: String = "simhash96_sums"

  override protected def nullSafeEval(input: Any): Any =
    SimHash96Sums.fingerprintWithSums(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash96Sums.fingerprintWithSums($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(tokens = newChild)
}

object SimHash96Sums {
  import org.apache.spark.sql.types.{ArrayType, IntegerType}
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  val schema: StructType = StructType(Seq(
    StructField("hi", LongType, nullable = false),
    StructField("lo", LongType, nullable = false),
    StructField("sums", ArrayType(IntegerType, containsNull = false), nullable = false)))

  def fingerprintWithSums(tokens: ArrayData): InternalRow = {
    val counts = new Array[Int](SimHash96.Bits)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val (hi, lo) = SimHash96.tokenHash(tokens.getUTF8String(i).toString)
        var b = 0
        while (b < SimHash96.Half) {
          if (((lo >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          if (((hi >> b) & 1L) == 1L) counts(SimHash96.Half + b) += 1 else counts(SimHash96.Half + b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var fpHi = 0L; var fpLo = 0L
    var b = 0
    while (b < SimHash96.Half) {
      if (counts(b) > 0) fpLo |= (1L << b)
      if (counts(SimHash96.Half + b) > 0) fpHi |= (1L << b)
      b += 1
    }
    new GenericInternalRow(Array[Any](fpHi, fpLo,
      new GenericArrayData(counts.map(c => c: Any))))
  }

  def simhash96Sums(tokens: Column): Column =
    ColumnBridge.toCol(SimHash96Sums(ColumnBridge.toExpr(tokens)))
}
