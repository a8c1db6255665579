package graft.sources

import graft.SparkSpec
import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** №218 shard_forget: a right-to-be-forgotten manifest applied to
  * already-packed training shards — bounded rewrite (untouched files not
  * reopened), span-covering contamination (not start-only), stable
  * surviving positions, the drop-vs-repack collateral bill, and the
  * emptied-shard file drop. */
class ShardForgetSpec extends SparkSpec {

  private lazy val run = ShardForget.shardForgetWithDetail(spark, sf)
  private lazy val rows = run._1.collect()
  private lazy val detail = run._2

  test("bounded repair: untouched shard files are never reopened") {
    assert(detail.touched.nonEmpty, "the drill is vacuous — no shard touched")
    assert(detail.touched.size < ShardForget.Shards,
      "every shard touched — the bounded-repair pin has nothing to hold")
    val untouchedNames = detail.before.keySet.filterNot(n =>
      detail.touched.exists(s => n == TrainShardSink.shardFile(s, ShardForget.Shards)))
    assert(untouchedNames.nonEmpty)
    untouchedNames.foreach { n =>
      assert(detail.after(n) === detail.before(n),
        s"untouched shard $n changed (size, mtime) — it was reopened")
    }
    detail.touched.foreach { s =>
      val n = TrainShardSink.shardFile(s, ShardForget.Shards)
      assert(!detail.after.get(n).contains(detail.before(n)),
        s"touched shard $n kept its (size, mtime) — the rewrite never happened")
    }
  }

  test("contamination is span-covering, not start-only") {
    // a doomed sequence the manifest doc does NOT start in: the doc's
    // tokens span into it from the previous sequence
    val L = PipelineQueries.SeqLen
    import spark.implicits._
    val startKeys = graft.Tables(spark, sf).documents
      .select($"doc_id", pmod($"doc_id", lit(PipelineQueries.PackBins)).as("bin"),
        size(graft.queries.TextQueries.words($"text")).cast("long").as("n_tok"))
      .withColumn("start_off", sum($"n_tok").over(
        org.apache.spark.sql.expressions.Window.partitionBy($"bin")
          .orderBy(md5($"doc_id".cast("string")), $"doc_id")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)) - $"n_tok")
      .filter(pmod($"doc_id", lit(ShardForget.ForgetMod)) === ShardForget.ForgetRes)
      .select($"bin", expr(s"start_off DIV $L").as("seq_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val spanOnly = detail.doomed -- startKeys
    assert(spanOnly.nonEmpty,
      "no doomed sequence is contaminated by spanning alone — a start-only " +
        "(span-blind) rule would pass; the drill corner is vacuous")
  }

  test("survivors keep original positions; no doomed line serves") {
    // gaps in pos where lines dropped — positions were NOT renumbered
    val byShard = rows.groupBy(_.getAs[Int]("shard"))
    val touchedWithGap = detail.touched.filter { s =>
      byShard.get(s).exists { rs =>
        val ps = rs.map(_.getAs[Long]("pos")).sorted
        ps.nonEmpty && ps.last > ps.length
      }
    }
    assert(touchedWithGap.nonEmpty,
      "no touched shard shows a position gap — dropped lines were renumbered away")
    // no read-back line carries a manifest doc or a doomed (bin, seq) key
    rows.foreach { r =>
      val key = (r.getAs[Long]("bin"), r.getAs[Long]("seq_id"))
      assert(!detail.doomed.contains(key), s"doomed sequence $key still serves")
      val docs = r.getAs[String]("docs").split(",").map(_.toLong)
      assert(!docs.exists(d => d % ShardForget.ForgetMod == ShardForget.ForgetRes),
        s"a manifest doc still serves in sequence $key")
    }
  }

  test("the bill: collateral = dropped mass minus manifest mass") {
    val r = rows.head
    assert(r.getAs[Long]("n_files_rewritten") === detail.touched.size.toLong)
    assert(r.getAs[Long]("n_seqs_dropped") > 0L)
    assert(r.getAs[Long]("n_collateral_tokens") > 0L,
      "zero collateral — drop and repack cost the same here, the dial measures nothing")
    assert(r.getAs[Long]("n_collateral_tokens") < r.getAs[Long]("n_tokens_dropped"),
      "collateral must exclude the manifest docs' own tokens")
    // seqs dropped matches the doomed keys that actually had lines
    assert(r.getAs[Long]("n_seqs_dropped") === detail.doomed.size.toLong)
  }

  test("a fully-contaminated shard's file is dropped, not left stale") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_sfgt_empty_").toString
    val lines = Seq(
      (0, 1L, "0|1|0|0|10|1,2"),
      (1, 1L, "1|1|1|0|10|3,4"),
      (1, 2L, "1|2|1|1|10|5,6"))
      .toDF("shard", "pos", "line")
    TrainShardSink.write(lines, root, 4)
    def names() = {
      val d = java.nio.file.Paths.get(root, "shards")
      val s = java.nio.file.Files.list(d)
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
        .map(_.getFileName.toString).filterNot(_.startsWith(".")).toSet
      finally s.close()
    }
    assert(names() === Set(TrainShardSink.shardFile(0, 4), TrainShardSink.shardFile(1, 4)))
    // shard 0 loses its only line; shard 1 keeps one of two
    ShardForget.rewriteTouched(
      Seq((1, 2L, "1|2|1|1|10|5,6")).toDF("shard", "pos", "line"),
      root, Set(0, 1), nShards = 4)
    assert(names() === Set(TrainShardSink.shardFile(1, 4)),
      "the emptied shard's file must disappear — a stale file resurrects every dropped line")
    val back = TrainShardSink.readBack(spark, root).collect()
    assert(back.length === 1 && back.head.getAs[Long]("pos") === 2L)
    graft.Fs.rmTree(java.nio.file.Paths.get(root))
  }
}
