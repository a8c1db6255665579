package graft.functions

import graft.SparkSpec
import graft.queries.TextQueries
import org.apache.spark.sql.functions._

/** №142/№143: the HyperLogLog contracts — register-level merge invariance
  * on adversarial trees (stronger than an error bound: byte equality),
  * measured accuracy vs exact countDistinct, plain-Scala estimate
  * recomputation, serde, analysis-time typing, and the stream ≡ batch
  * register pin. */
class HyperLogLogSpec extends SparkSpec {
  import spark.implicits._

  private def shingles = graft.Tables(spark, sf).documents
    .select($"source", TextQueries.words($"text").as("ws"))
    .select($"source", explode(expr(
      "CASE WHEN size(ws) >= 3 THEN transform(sequence(0, size(ws)-3), " +
        "i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2])) ELSE array() END")).as("sh"))

  private def regsOf(df: org.apache.spark.sql.DataFrame): Map[String, Seq[Int]] =
    df.groupBy($"source").agg(HyperLogLog.sketch($"sh", TextQueries.HllP).as("regs"))
      .as[(String, Seq[Int])].collect().toMap

  test("merge is invariant under ADVERSARIAL merge trees: any partitioning, any nesting, duplicated partials") {
    val base = shingles.persist()
    try {
      val one = regsOf(base.coalesce(1))      // sequential fold
      val wide = regsOf(base.repartition(13)) // 13-way parallel merge
      // idempotence: the SAME data unioned with itself three times — a
      // merge tree that re-merges identical partials — changes NOTHING
      val tripled = regsOf(base.unionAll(base).unionAll(base))
      assert(one == wide, "register arrays fork across partitionings")
      assert(one == tripled, "register max-merge is not idempotent")
      assert(one.values.forall(_.size == (1 << TextQueries.HllP)))
    } finally { base.unpersist(); () }
  }

  test("measured accuracy on the live corpus: every source within 3σ; the sketch is not exact (it earns its keep)") {
    val rows = TextQueries.distinctSketch(spark, sf)
      .as[(String, Long, Int, Long, Long, Long)].collect().toSeq
    assert(rows.nonEmpty)
    // σ = 1.04/√m ≈ 6.5% at p=8 → 3σ = 195000 ppm; the fixed corpus is
    // deterministic so this is a pin, not a flaky probabilistic bound
    rows.foreach { case (src, nExact, _, _, est, errPpm) =>
      assert(errPpm < 195000L, s"$src: est=$est exact=$nExact err=${errPpm}ppm exceeds 3σ")
      assert(errPpm == math.abs(est - nExact) * 1000000L / nExact, s"$src err_ppm arithmetic drifted")
    }
    assert(rows.exists(_._6 > 0L), "every estimate exact — the corpus can't be exercising the sketch")
    assert(rows.exists(_._6 < 50000L), "no source within 5% — estimator is mis-derived")
  }

  test("estimate ≡ plain-Scala HLL recomputation from first principles (hash, registers, α)") {
    val got = TextQueries.distinctSketch(spark, sf)
      .as[(String, Long, Int, Long, Long, Long)].collect().toSeq
    val raw = shingles.as[(String, String)].collect().toSeq
    val expected = raw.groupBy(_._1).map { case (src, rows) =>
      val regs = new Array[Int](256)
      rows.map(_._2).distinct.foreach { s =>
        // independent recomputation: md5 → first 15 nibbles → reg/rank
        val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        val hex = d.take(8).map(b => f"${b & 0xff}%02x").mkString.take(15)
        val h = java.lang.Long.parseLong(hex, 16)
        val reg = (h >>> 52).toInt
        val rest = h & ((1L << 52) - 1)
        val rank = math.min(if (rest == 0L) 53 else 52 - (64 - java.lang.Long.numberOfLeadingZeros(rest)) + 1, 32)
        if (rank > regs(reg)) regs(reg) = rank
      }
      val sSum = regs.map(r => 1L << (32 - r)).sum
      val est = math.round(TextQueries.HllAlphaPpm.toDouble * 65536 * 4294967296L / 1000000 / sSum + 1e-9)
      src -> (sSum, est)
    }
    got.foreach { case (src, _, _, sSum, est, _) =>
      assert((sSum, est) == expected(src), s"$src: engine (s=$sSum, est=$est) != scala ${expected(src)}")
    }
  }

  test("serde round-trips; non-string child rejected at analysis time") {
    val hll = HyperLogLog(org.apache.spark.sql.catalyst.expressions.Literal("a"), 8)
    val buf = hll.createAggregationBuffer()
    buf(0) = 31; buf(255) = 7; buf(100) = 32
    assert(hll.deserialize(hll.serialize(buf)).toSeq == buf.toSeq)
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.range(10).agg(HyperLogLog.sketch(col("id"), 8).as("sk")).collect()
    }
    assert(err.getMessage.toLowerCase.contains("string"))
  }

  test("stream ≡ batch: streamed registers are byte-identical and the replay crossed micro-batches") {
    val streamRows = graft.streaming.StreamDistinct.streamDistinct(spark, sf)
      .as[(String, Long, Int, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(graft.streaming.StreamDistinct.lastBatches >= 3,
      s"only ${graft.streaming.StreamDistinct.lastBatches} data micro-batches — state never crossed a batch")
    val batchRows = TextQueries.distinctSketch(spark, sf)
      .as[(String, Long, Int, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(streamRows == batchRows,
      "stream output diverges from batch — the idempotent merge should make them identical")
  }
}
