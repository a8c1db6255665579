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
case class AesCtrCrypt(data: Expression, key: Expression, iv: Expression,
                       lenient: Boolean = false)
    extends TernaryExpression {

  override def first: Expression = data
  override def second: Expression = key
  override def third: Expression = iv
  override def dataType: DataType = BinaryType
  override def prettyName: String = "aes_ctr"
  /** lenient = decrypt side of a dirty corpus: invalid key material (wrong
    * length, bad base64 upstream) yields NULL — the record is rejected
    * downstream, not the job (reference: DecryptionFailureException is in
    * the job's skip policy). Strict mode (encrypt side) still throws: a
    * failure there is a bug, not dirty data. */
  override def nullable: Boolean = lenient || super.nullable

  override protected def nullSafeEval(d: Any, k: Any, v: Any): Any =
    if (lenient)
      AesCtrCrypt.cryptOrNull(d.asInstanceOf[Array[Byte]], k.asInstanceOf[Array[Byte]], v.asInstanceOf[Array[Byte]])
    else
      AesCtrCrypt.crypt(d.asInstanceOf[Array[Byte]], k.asInstanceOf[Array[Byte]], v.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (lenient)
      nullSafeCodeGen(ctx, ev, (d, k, v) =>
        s"""${ev.value} = graft.functions.AesCtrCrypt.cryptOrNull($d, $k, $v);
           |${ev.isNull} = (${ev.value} == null);""".stripMargin)
    else
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

  /** null instead of throw — the decrypt-side skip policy. */
  def cryptOrNull(data: Array[Byte], key: Array[Byte], iv: Array[Byte]): Array[Byte] =
    try crypt(data, key, iv)
    catch { case scala.util.control.NonFatal(_) => null }

  /** Column API. */
  def aesCtr(data: Column, key: Column, iv: Column): Column =
    ColumnBridge.toCol(AesCtrCrypt(
      ColumnBridge.toExpr(data),
      ColumnBridge.toExpr(key),
      ColumnBridge.toExpr(iv)))

  /** Column API, lenient (decrypt side): cipher failure → NULL row value. */
  def aesCtrLenient(data: Column, key: Column, iv: Column): Column =
    ColumnBridge.toCol(AesCtrCrypt(
      ColumnBridge.toExpr(data),
      ColumnBridge.toExpr(key),
      ColumnBridge.toExpr(iv), lenient = true))
}
