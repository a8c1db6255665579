package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Cosine similarity over two `array<float>` embeddings as ONE native
  * expression — replaces the zip_with + aggregate HOF pair (three sequential
  * fold passes with per-element lambda invocation) with a single fused loop
  * computing all three accumulators. Numerically IDENTICAL to the HOF form
  * and the DuckDB oracle: elements are widened to double before multiply
  * and each accumulator is a sequential left fold in array order, so the
  * IEEE-754 result is bit-equal (addition order unchanged — the three
  * accumulators are independent).
  *
  * Null semantics match zip_with/aggregate: mismatched lengths or a null
  * element yield NULL. Codegen emits a static call — stays inside the
  * whole-stage span.
  */
case class CosineSim(a: Expression, b: Expression) extends BinaryExpression {
  override def left: Expression = a
  override def right: Expression = b
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  /** Pinned element type: eval reads via getFloat, so an array<double>
    * input would REINTERPRET each 8-byte slot as a float — silent garbage.
    * Reject anything but array<float> at analysis time (SQL callers cast:
    * `CAST(arr AS ARRAY<FLOAT>)`). */
  override def checkInputDataTypes(): TypeCheckResult = (a.dataType, b.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"cosine_sim requires array<float> inputs, got ${a.dataType.sql} / ${b.dataType.sql}")
  }

  override protected def nullSafeEval(x: Any, y: Any): Any =
    CosineSim.cosine(x.asInstanceOf[ArrayData], y.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      // ev.value is a primitive double — route through a boxed local for
      // the null check (a direct `double == null` does not compile and
      // would silently disable whole-stage codegen for the entire stage)
      val tmp = ctx.freshName("cos")
      s"""java.lang.Double $tmp = graft.functions.CosineSim.cosine($x, $y);
         |${ev.isNull} = ($tmp == null);
         |${ev.value} = ${ev.isNull} ? -1.0 : $tmp.doubleValue();""".stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(a = newLeft, b = newRight)
}

object CosineSim {
  /** Boxed Double so codegen's null check works; null on length mismatch or
    * null elements (the HOF pair's semantics). */
  def cosine(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    java.lang.Double.valueOf(dot / (Math.sqrt(na) * Math.sqrt(nb)))
  }

  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.toCol(CosineSim(ColumnBridge.toExpr(a), ColumnBridge.toExpr(b)))
}
