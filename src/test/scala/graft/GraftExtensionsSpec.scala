package graft

import graft.functions.SimHash60
import org.apache.spark.unsafe.types.UTF8String

class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions work end-to-end through spark.sql") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  decode(aes_ctr(aes_ctr(encode('secret', 'UTF-8'), unhex(md5('k')), unhex(md5('v'))),
        |                 unhex(md5('k')), unhex(md5('v'))), 'UTF-8') AS roundtrip,
        |  validate_record('{"_id":"a","x":"1"}', '{"id":"9"}') AS v,
        |  simhash60(array('alpha', 'beta', 'alpha')) AS fp
        |""".stripMargin).head
    assert(row.getString(0) == "secret")
    val v = row.getStruct(1)
    assert(v.getString(0) == """{"x":"1","_lastModifiedDateTime":{"$date":"1980-01-01T00:00:00.000Z"},"_id":{"$oid":"a"}}""")
    assert(v.getString(1) == """{"$oid":"a"}""")
    assert(row.getLong(2) != 0L)
  }

  test("simhash60 expression equals the relational bit formulation") {
    // independent scala recomputation
    def relational(tokens: Seq[String]): Long = {
      val hs = tokens.map(SimHash60.tokenHash)
      (0 until 60).foldLeft(0L) { (fp, b) =>
        val s = hs.map(h => if (((h >> b) & 1L) == 1L) 1 else -1).sum
        if (s > 0) fp | (1L << b) else fp
      }
    }
    val toks = Seq("key", "agg", "row", "scan", "slow", "fast", "key", "key")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaExpr = Seq(toks).toDF("t").select(SimHash60.simhash60(col("t"))).as[Long].head
    assert(viaExpr == relational(toks))
  }
}
