package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** commons-text escapeCsv semantics as a native expression: quote the value
  * iff it contains a comma, quote, CR or LF, doubling embedded quotes
  * (reference: app/domain/DomainClasses.kt:95-103 manifest lines).
  * One char scan instead of the 3-regex column formulation — the manifest
  * generator applies this to 8 fields per record.
  */
case class CsvEscape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "csv_escape"

  override protected def nullSafeEval(input: Any): Any =
    CsvEscape.escape(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CsvEscape.escape($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CsvEscape {
  def escape(v: UTF8String): UTF8String = {
    val s = v.toString
    var needs = false
    var quotes = 0
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '"') { needs = true; quotes += 1 }
      else if (c == ',' || c == '\r' || c == '\n') needs = true
      i += 1
    }
    if (!needs) v
    else {
      val sb = new java.lang.StringBuilder(s.length + quotes + 2)
      sb.append('"')
      i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == '"') sb.append("\"\"") else sb.append(c)
        i += 1
      }
      sb.append('"')
      UTF8String.fromString(sb.toString)
    }
  }

  def csvEscape(c: Column): Column =
    ColumnBridge.toCol(CsvEscape(ColumnBridge.toExpr(c)))
}
