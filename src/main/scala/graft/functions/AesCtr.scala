package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType}

import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}

/** AES/CTR/NoPadding as a native Catalyst expression.
  *
  * Re-expresses the reference's cipher service
  * (reference: app/services/impl/AESCipherService.kt:40-46 — AES/CTR via
  * BouncyCastle on single records) as a codegen-friendly Spark expression:
  * CTR is symmetric, so one expression serves both encrypt and decrypt.
  *
  * Stays inside whole-stage codegen — doGenCode emits a static call, no
  * CodegenFallback. Cipher instances are cached per thread (Cipher.getInstance
  * per row would dominate the cost at 100 TB).
  */
case class AesCtrCrypt(data: Expression, key: Expression, iv: Expression)
    extends TernaryExpression {

  override def first: Expression = data
  override def second: Expression = key
  override def third: Expression = iv
  override def dataType: DataType = BinaryType
  override def prettyName: String = "aes_ctr"

  override protected def nullSafeEval(d: Any, k: Any, v: Any): Any =
    AesCtrCrypt.crypt(d.asInstanceOf[Array[Byte]], k.asInstanceOf[Array[Byte]], v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, k, v) =>
      s"${ev.value} = graft.functions.AesCtrCrypt.crypt($d, $k, $v);")

  override protected def withNewChildrenInternal(newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(data = newFirst, key = newSecond, iv = newThird)
}

object AesCtrCrypt {
  private val cipherTL: ThreadLocal[Cipher] = ThreadLocal.withInitial { () =>
    Cipher.getInstance("AES/CTR/NoPadding")
  }

  /** CTR keystream XOR — identical for encrypt and decrypt. */
  def crypt(data: Array[Byte], key: Array[Byte], iv: Array[Byte]): Array[Byte] = {
    val cipher = cipherTL.get()
    cipher.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
    cipher.doFinal(data)
  }

  /** Column API. */
  def aesCtr(data: Column, key: Column, iv: Column): Column =
    ColumnBridge.toCol(AesCtrCrypt(
      ColumnBridge.toExpr(data),
      ColumnBridge.toExpr(key),
      ColumnBridge.toExpr(iv)))
}
