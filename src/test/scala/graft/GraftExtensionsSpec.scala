package graft

import graft.functions.{SimHash60, SimHash96}
import org.apache.spark.unsafe.types.UTF8String

class GraftExtensionsSpec extends SparkSpec {

  test("registered SQL functions work end-to-end through spark.sql") {
    GraftExtensions.register(spark)
    val row = spark.sql(
      """SELECT
        |  decode(aes_ctr(aes_ctr(encode('secret', 'UTF-8'), unhex(md5('k')), unhex(md5('v'))),
        |                 unhex(md5('k')), unhex(md5('v'))), 'UTF-8') AS roundtrip,
        |  validate_record('{"_id":"a","x":"1"}', '{"id":"9"}') AS v,
        |  simhash60(array('alpha', 'beta', 'alpha')) AS fp,
        |  round(cosine_sim(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                   array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))), 6) AS cos
        |""".stripMargin).head
    assert(row.getString(0) == "secret")
    val v = row.getStruct(1)
    assert(v.getString(0) == """{"x":"1","_lastModifiedDateTime":{"$date":"1980-01-01T00:00:00.000Z"},"_id":{"$oid":"a"}}""")
    assert(v.getString(1) == """{"$oid":"a"}""")
    assert(row.getLong(2) != 0L)
    assert(row.getDouble(3) == 1.0)
  }

  test("aggregate SQL functions: misra_gries and top_k_by_score run through spark.sql") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq("a", "a", "a", "b", "b", "c").toDF("tok").createOrReplaceTempView("ext_toks")
    val sk = spark.sql(
      "SELECT e.tok, e.est FROM (SELECT explode(misra_gries(tok, 2)) AS e FROM ext_toks)")
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // k=2 sketch over 3a 2b 1c: 'c' evicts one unit of a and b
    assert(sk == Map("a" -> 2L, "b" -> 1L), s"unexpected sketch: $sk")
    Seq((1L, 0.5), (2L, 0.9), (3L, 0.7)).toDF("id", "s").createOrReplaceTempView("ext_scores")
    val top = spark.sql(
      "SELECT e.id FROM (SELECT explode(top_k_by_score(s, id, 2)) AS e FROM ext_scores)")
      .collect().map(_.getLong(0)).toSeq
    assert(top == Seq(2L, 3L), s"unexpected top-k order: $top")
    // k must be a literal — the buffer is sized at planning time
    val ex = intercept[Exception] {
      spark.sql("SELECT misra_gries(tok, CAST(length(tok) AS INT)) FROM ext_toks").collect()
    }
    assert(ex.getMessage.contains("integer literal"), ex.getMessage)
  }

  test("cosine_sim rejects non-float arrays at analysis time (no silent reinterpretation)") {
    GraftExtensions.register(spark)
    val ex = intercept[Exception] {
      spark.sql("SELECT cosine_sim(array(1.0, 2.0), array(1.0, 2.0))").collect()
    }
    assert(ex.getMessage.contains("array<float>"), ex.getMessage)
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

  test("simhash96 expression equals the relational bit formulation (hex-parse hashes)") {
    // independent recomputation: token hash from the md5 HEX STRING (the
    // oracle's nibble parse), not the expression's byte arithmetic
    def hexHalves(tok: String): (Long, Long) = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (java.lang.Long.parseLong(hex.substring(0, 12), 16),
        java.lang.Long.parseLong(hex.substring(12, 24), 16))
    }
    def relational(tokens: Seq[String]): (Long, Long) = {
      val hs = tokens.map(hexHalves)
      val fpLo = (0 until 48).foldLeft(0L) { (fp, b) =>
        val s = hs.map { case (_, lo) => if (((lo >> b) & 1L) == 1L) 1 else -1 }.sum
        if (s > 0) fp | (1L << b) else fp
      }
      val fpHi = (0 until 48).foldLeft(0L) { (fp, b) =>
        val s = hs.map { case (hi, _) => if (((hi >> b) & 1L) == 1L) 1 else -1 }.sum
        if (s > 0) fp | (1L << b) else fp
      }
      (fpHi, fpLo)
    }
    val toks = Seq("key", "agg", "row", "scan", "slow", "fast", "key", "key")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val viaExpr = Seq(toks).toDF("t")
      .select(SimHash96.simhash96(col("t")).as("f"))
      .select(col("f.hi"), col("f.lo")).as[(Long, Long)].head
    assert(viaExpr == relational(toks))
  }
}
