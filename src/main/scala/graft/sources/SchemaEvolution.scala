package graft.sources

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** №118 schema_evolution — reading a corpus whose parquet files were
  * written under EVOLVED schemas (the unavoidable 100 TB reality: a
  * year-old corpus spans every schema version its writers ever shipped;
  * nobody rewrites 100 TB to add a column):
  *
  *   - generation 1 files: (doc_id, lang, n_chars) — the original layout;
  *   - generation 2 files: + `quality_score` (a later pipeline addition);
  *   - ONE read over both via parquet `mergeSchema` — the union schema,
  *     generation-1 rows surfacing the added column as NULL (absence is
  *     data: "not yet scored", not zero).
  *
  * The driver row aggregates per language over the merged read: total
  * docs, scored docs (non-null count — must equal the generation-2 share
  * exactly), and the scored sum. A reader that dropped generation-1
  * files, defaulted the missing column to 0, or mis-unioned by POSITION
  * instead of by NAME diverges the hash.
  *
  * Scale notes: schema merging is a FOOTER operation (one footer read
  * per file — at 100 TB pin the schema explicitly via `.schema(...)`
  * once known, which skips the merge pass entirely; this operator proves
  * the semantics that shortcut must preserve). Filter pushdown on
  * columns absent from old files still prunes correctly — parquet
  * evaluates `IsNotNull(quality_score)` against a file with no such
  * column as all-null and skips the whole file (SchemaEvolutionSpec pins
  * pushdown in the scan for both common and added columns).
  */
object SchemaEvolution {

  /** Write the two-generation layout under one directory; returns root.
    * Generation split on doc_id parity — deterministic, every SF. The
    * added column is a pure function of the row so both engines can
    * recompute it: quality_score = n_chars mod 100. */
  private[graft] def writeGenerations(spark: SparkSession, dir: String): java.nio.file.Path = {
    val root = java.nio.file.Files.createTempDirectory("graft_schevo_")
    val docs = Tables(spark, dir).documents.select(col("doc_id"), col("lang"), col("n_chars"))
    docs.filter(col("doc_id") % 2 === 0)
      .coalesce(2).write.mode("overwrite").parquet(root.resolve("gen1").toString)
    docs.filter(col("doc_id") % 2 === 1)
      .withColumn("quality_score", col("n_chars") % 100)
      .coalesce(2).write.mode("overwrite").parquet(root.resolve("gen2").toString)
    root
  }

  def schemaEvolution(spark: SparkSession, dir: String): DataFrame = {
    val root = writeGenerations(spark, dir)
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(root.resolve("gen1").toString, root.resolve("gen2").toString)
    val rows = merged.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        count(col("quality_score")).as("n_scored"),
        coalesce(sum(col("quality_score")), lit(0L)).as("sum_score"))
      .orderBy(col("lang"))
      .collect()
    graft.Fs.rmTree(root)
    import spark.implicits._
    rows.toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toDF("lang", "n_docs", "n_scored", "sum_score")
      .orderBy(col("lang"))
  }

  /** Oracle from the raw corpus: generation 2 = odd doc_ids, the added
    * column's value recomputed from the same pure function. */
  val schemaEvolutionSql: String =
    s"""SELECT lang, count(*) AS n_docs,
       |  CAST(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
       |  CAST(coalesce(sum(CASE WHEN doc_id % 2 = 1 THEN n_chars % 100 END), 0) AS BIGINT) AS sum_score
       |FROM documents GROUP BY lang ORDER BY lang""".stripMargin
}
