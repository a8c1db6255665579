package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import javax.crypto.Cipher
import javax.crypto.spec.{IvParameterSpec, SecretKeySpec}
import java.util.Base64

class AesCtrSpec extends SparkSpec {

  private val key = Array.tabulate[Byte](16)(i => (i * 7 + 3).toByte)
  private val iv = Array.tabulate[Byte](16)(i => (i * 13 + 1).toByte)

  test("CTR roundtrip: decrypt(encrypt(x)) == x") {
    val data = "hello graft — ünïcode ✓".getBytes("UTF-8")
    val ct = AesCtrCrypt.crypt(data, key, iv)
    assert(!ct.sameElements(data))
    assert(AesCtrCrypt.crypt(ct, key, iv).sameElements(data))
  }

  test("matches JCE AES/CTR/NoPadding reference output") {
    val data = "0123456789abcdefFEDCBA9876543210~".getBytes("UTF-8")
    val ref = {
      val c = Cipher.getInstance("AES/CTR/NoPadding")
      c.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, "AES"), new IvParameterSpec(iv))
      c.doFinal(data)
    }
    assert(AesCtrCrypt.crypt(data, key, iv).sameElements(ref))
  }

  test("column form encrypts inside a plan and roundtrips") {
    import spark.implicits._
    val df = Seq(("r1", "payload-one"), ("r2", "payload-two")).toDF("id", "clear")
      .withColumn("k", unhex(md5(col("id"))))
      .withColumn("v", unhex(md5(concat(col("id"), lit("iv")))))
      .withColumn("ct", AesCtrCrypt.aesCtr(encode(col("clear"), "UTF-8"), col("k"), col("v")))
      .withColumn("back", decode(AesCtrCrypt.aesCtr(col("ct"), col("k"), col("v")), "UTF-8"))
    val rows = df.select("clear", "back").collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("null inputs propagate null") {
    import spark.implicits._
    val df = Seq(("a", null: String)).toDF("id", "clear")
      .withColumn("ct", AesCtrCrypt.aesCtr(encode(col("clear"), "UTF-8"), lit(key), lit(iv)))
    assert(df.select("ct").head.isNullAt(0))
  }

  test("lenient mode NULLs on bad key material; strict mode throws") {
    import spark.implicits._
    // 5-byte key: Cipher.init throws InvalidKeyException
    val df = Seq("data").toDF("clear")
      .withColumn("badkey", lit(Array[Byte](1, 2, 3, 4, 5)))
      .withColumn("dec", AesCtrCrypt.aesCtrLenient(encode(col("clear"), "UTF-8"), col("badkey"), lit(iv)))
    assert(df.select("dec").head.isNullAt(0)) // record rejected, task alive
    val strict = Seq("data").toDF("clear")
      .withColumn("badkey", lit(Array[Byte](1, 2, 3, 4, 5)))
      .withColumn("dec", AesCtrCrypt.aesCtr(encode(col("clear"), "UTF-8"), col("badkey"), lit(iv)))
    intercept[Exception] { strict.select("dec").collect() } // encrypt side = a bug, not dirty data
  }
}
