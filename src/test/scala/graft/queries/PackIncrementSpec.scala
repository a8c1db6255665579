package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №219 pack_increment: tail-append incremental packing — base accounting
  * immobile except ≤1 boundary sequence per bin, arrivals genuinely land,
  * and the repack dial measures the write amplification not taken. */
class PackIncrementSpec extends SparkSpec {

  private lazy val rows = PipelineQueries.packIncrement(spark, sf).collect()

  // the pure-base pack: what the already-written shards hold pre-arrival
  private lazy val basePack = {
    import spark.implicits._
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"bin")
      .orderBy(md5($"doc_id".cast("string")), $"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    graft.Tables(spark, sf).documents
      .filter(!(pmod($"doc_id", lit(PipelineQueries.IncArrMod)) === PipelineQueries.IncArrRes))
      .select($"doc_id", pmod($"doc_id", lit(PipelineQueries.PackBins)).as("bin"),
        size(TextQueries.words($"text")).cast("long").as("n_tok"))
      .withColumn("start_off", sum($"n_tok").over(w) - $"n_tok")
      .withColumn("seq_id", expr(s"start_off DIV ${PipelineQueries.SeqLen}"))
      .groupBy($"bin", $"seq_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
  }

  test("immobile sequences match the pre-arrival pack exactly") {
    val immobile = rows.filter(_.getAs[String]("phase") == "immobile")
    assert(immobile.nonEmpty)
    immobile.foreach { r =>
      val key = (r.getAs[Long]("bin"), r.getAs[Long]("seq_id"))
      assert(basePack.get(key).contains(
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"))),
        s"immobile sequence $key drifted from the pre-arrival pack — " +
          "the already-written shard lines for it would need a rewrite")
    }
  }

  test("at most one extended sequence per bin, and it strictly grows") {
    val extended = rows.filter(_.getAs[String]("phase") == "extended")
    assert(extended.nonEmpty, "no boundary sequence extended — arrivals never landed on a tail")
    val perBin = extended.groupBy(_.getAs[Long]("bin"))
    perBin.foreach { case (bin, es) =>
      assert(es.length === 1, s"bin $bin extended ${es.length} sequences — tail-append touches exactly one")
    }
    extended.foreach { r =>
      val key = (r.getAs[Long]("bin"), r.getAs[Long]("seq_id"))
      val (bd, bt) = basePack(key)
      assert(r.getAs[Long]("n_docs") > bd && r.getAs[Long]("n_tokens") > bt,
        s"extended sequence $key did not grow past its base accounting")
    }
  }

  test("new sequences start past every base sequence of their bin") {
    val maxBaseSeq = basePack.keys.groupBy(_._1).map { case (b, ks) => b -> ks.map(_._2).max }
    rows.filter(_.getAs[String]("phase") == "new").foreach { r =>
      val bin = r.getAs[Long]("bin")
      assert(r.getAs[Long]("seq_id") > maxBaseSeq.getOrElse(bin, -1L),
        s"a 'new' sequence sits inside bin $bin's base range — history moved")
    }
  }

  test("the repack dial: moving history costs an order of magnitude more") {
    val r = rows.head
    val ext = r.getAs[Long]("n_extended")
    val moved = r.getAs[Long]("n_repack_moved")
    assert(r.getAs[Long]("n_immobile") === rows.count(_.getAs[String]("phase") == "immobile").toLong)
    assert(ext === rows.count(_.getAs[String]("phase") == "extended").toLong)
    assert(r.getAs[Long]("n_new") === rows.count(_.getAs[String]("phase") == "new").toLong)
    assert(moved > 5 * ext,
      s"full repack moved only $moved vs $ext extended — the dial measures nothing here")
  }
}
