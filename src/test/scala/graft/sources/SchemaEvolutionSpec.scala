package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** №118 schema_evolution — merged-schema semantics + pushdown over the
  * two-generation layout. */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  test("schema_evolution: merged read surfaces the union schema with NULLs for old files") {
    val root = SchemaEvolution.writeGenerations(spark, sf)
    try {
      val merged = spark.read.option("mergeSchema", "true")
        .parquet(root.resolve("gen1").toString, root.resolve("gen2").toString)
      assert(merged.columns.toSet == Set("doc_id", "lang", "n_chars", "quality_score"))
      // generation-1 rows (even ids): the added column is NULL — absence,
      // never a silent zero default
      val evens = merged.filter($"doc_id" % 2 === 0)
      assert(evens.count() > 0)
      assert(evens.filter($"quality_score".isNotNull).count() == 0,
        "generation-1 rows must surface the added column as NULL")
      // generation-2 rows carry the real value
      val odds = merged.filter($"doc_id" % 2 === 1)
      assert(odds.filter($"quality_score".isNull).count() == 0)
      assert(odds.filter($"quality_score" =!= $"n_chars" % 100).count() == 0)

      // pushdown: a filter on the ADDED column prunes generation-1 files
      // entirely (parquet treats the absent column as all-null) — measured
      // from the scan, and the answer is still exactly the gen-2 rows
      val scored = merged.filter($"quality_score" >= 0)
      scored.collect()
      val scans = PartitionedLayout.fileScans(scored.queryExecution.executedPlan)
      assert(scans.nonEmpty)
      val pushed = scans.map(_.metadata.getOrElse("PushedFilters", "")).mkString
      assert(pushed.contains("quality_score"),
        s"added-column predicate not pushed to the scan: $pushed")
      assert(scored.count() == odds.count(),
        "added-column filter must keep exactly the generation-2 rows")
      // and the common-column pushdown is unaffected by the merge
      val common = merged.filter($"n_chars" > 100)
      common.collect()
      val pushed2 = PartitionedLayout.fileScans(common.queryExecution.executedPlan)
        .map(_.metadata.getOrElse("PushedFilters", "")).mkString
      assert(pushed2.contains("n_chars"), s"common-column predicate not pushed: $pushed2")
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
        .foreach(p => java.nio.file.Files.deleteIfExists(p))
    }
  }
}
