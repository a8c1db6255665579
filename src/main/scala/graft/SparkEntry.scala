package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §2 for the operator inventory.
  * Every entry in [[queries]] has a matching DuckDB oracle in [[oracleSql]]
  * unless the operator is not SQL-expressible (then: rows-only + ScalaTest).
  */
object SparkEntry {

  /** Flagship: full export pipeline on sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Analytics.q1Agg(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Analytics heads (№33-35)
    "q1_agg" -> (Analytics.q1Agg _),
    "q3_join" -> (Analytics.q3Join _),
    // Text / dedup (№21,24,28-31)
    "token_count" -> (TextQueries.tokenCount _),
    "lang_id" -> (TextQueries.langId _),
    "quality_score" -> (TextQueries.qualityScore _),
    "doc_fingerprint" -> (TextQueries.docFingerprint _),
    "dedup_exact" -> (TextQueries.dedupExact _),
    "dedup_ngram_jaccard" -> (TextQueries.dedupNgramJaccard _),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_agg" -> Analytics.q1Sql,
    "q3_join" -> Analytics.q3Sql,
    "token_count" -> TextQueries.tokenCountSql,
    "lang_id" -> TextQueries.langIdSql,
    "quality_score" -> TextQueries.qualityScoreSql,
    "doc_fingerprint" -> TextQueries.docFingerprintSql,
    "dedup_exact" -> TextQueries.dedupExactSql,
    "dedup_ngram_jaccard" -> TextQueries.dedupNgramJaccardSql,
  )
}
