package graft.queries

import graft.kv.{KvModel, KvSql}
import graft.sources.KvSource
import graft.operators.ExportOps
import graft.operators.ExportOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Export-core operators (SURVEY §2 №1-20) as verified queries.
  *
  * Pattern (SURVEY §3): the Spark side CONSTRUCTS the HBase-shaped input
  * (KvModel: envelope + AES ciphertext) and runs the GENERIC operators on
  * it; the DuckDB oracle constructs the same input fields and the EXPECTED
  * stage outputs directly. Agreement proves the operators.
  */
object ExportQueries {

  // Time-range constants (events span 2024-01-01..01-30).
  val T1 = 1704672000000L // 2024-01-08
  val T2 = 1705881600000L // 2024-01-22

  /** Epoch-ms half-open range [loMs, hiMs) on the RAW scan column `ts_ns`
    * — delegates to the ONE layout-dispatch helper (Tables.tsRangeMs)
    * parameterized by column name, so the exactness-critical unit
    * conversion lives in a single place for all raw ts columns. */
  def tsNsRange(df: DataFrame, loMs: Long, hiMs: Long): Column =
    graft.Tables.tsRangeMs(df, loMs, hiMs, c = "ts_ns")

  /** kv + envelope, parsed + resolved — the common pipeline prefix.
    * `kvPred` filters on the CHEAP kv columns (etype, topic, ts_ns, …)
    * BEFORE the envelope is built: the parse/decrypt expressions are
    * placement-pinned (deterministic=false), so Catalyst cannot push a
    * later filter through them — a subset query without this decrypts the
    * whole corpus to emit 20%. At 100 TB this is the difference between
    * scanning a topic and decrypting the table. */
  private def parsed(spark: SparkSession, dir: String,
                     kvPred: Column = lit(true)): DataFrame = {
    val base = KvSource.envelopes(spark, dir, kvPred)
    extractEnvelope(base, col("envelope"), col("topic"))
  }

  /** Pipeline through decrypt + validate + sanitise + wrap → final records.
    * Same `kvPred` contract as [[parsed]]. */
  private def records(spark: SparkSession, dir: String,
                      kvPred: Column = lit(true)): DataFrame =
    recordsFromKv(KvSource.envelopes(spark, dir, kvPred))

  /** The full record pipeline over ANY envelope-bearing kv frame — batch or
    * streaming (all stages are per-row projections; see
    * graft.streaming.StreamExport.continuousExport for the stream form). */
  def recordsFromKv(kvWithEnvelope: DataFrame): DataFrame = {
    extractEnvelope(kvWithEnvelope, col("envelope"), col("topic"))
      .filter(mandatoryOk)
      .withColumn("payload_dec", decrypted)
      .withColumn("payload2", when(isBusinessAudit, auditPromote(col("payload_dec"), col("x_lm"))).otherwise(col("payload_dec")))
      .withColumn("v", validate(col("payload2"), col("x_id")))
      .filter(col("v").isNotNull) // validator rejections (none in this corpus)
      .withColumn("sanitised", sanitise(col("v.record"), col("r_db"), col("r_coll")))
      .withColumn("record", when(col("topic") === KvModel.EqualityTopic,
        equalityWrap(col("sanitised"), col("x_inner"))).otherwise(col("sanitised")))
      .withColumn("manifest_line", manifestLine(col("v.manifest_id"), col("ms"),
        col("r_db"), col("r_coll"), col("x_outer"), col("v.original_id"), col("x_inner")))
  }

  private val recordsCte: String =
    s"""records AS (
       |  SELECT kv.*, ${KvSql.expectedRecordSql} AS record,
       |    ${KvSql.manifestLineSql} AS manifest_line
       |  FROM kv WHERE valid)""".stripMargin

  // -------------------------------------------------------------- №1 kv_scan
  /** Time-range predicate on the RAW scan column (ts_ns) — Catalyst pushes
    * it into the parquet scan (`ms >= T1 ⇔ ts_ns >= T1e6` exactly, since
    * ms = floor(ns/1e6)); the derived key-byte filter runs post-scan. */
  def kvScan(spark: SparkSession, dir: String): DataFrame = {
    val kv = KvSource.kv(spark, dir)
    kv.filter(tsNsRange(kv, T1, T2))
      .filter(col("key_byte") >= 32 && col("key_byte") < 96)
      .select(col("eid"), col("key_hash"), col("ms"), col("topic"))
      .orderBy(col("eid"))
  }

  val kvScanSql: String =
    s"""WITH ${KvSql.cte}
       |SELECT eid, key_hash, ms, topic FROM kv
       |WHERE key_byte >= 32 AND key_byte < 96 AND ms >= $T1 AND ms < $T2
       |ORDER BY eid""".stripMargin

  // -------------------------------------------------------------- №2 keyspace_partition
  def keyspacePartition(spark: SparkSession, dir: String): DataFrame =
    KvSource.kv(spark, dir)
      .groupBy(partitionLabel(col("key_byte")).as("partition"))
      .agg(count(lit(1)).as("n"), min("key_byte").as("min_kb"), max("key_byte").as("max_kb"))
      .orderBy(col("min_kb"))

  val keyspacePartitionSql: String =
    s"""WITH ${KvSql.cte}
       |SELECT ${KvSql.partitionLabelSql("key_byte")} AS partition,
       |  count(*) AS n, min(key_byte) AS min_kb, max(key_byte) AS max_kb
       |FROM kv GROUP BY 1 ORDER BY min_kb""".stripMargin

  // -------------------------------------------------------------- №3 time_range_scan
  def timeRangeScan(spark: SparkSession, dir: String): DataFrame = {
    val kv = KvSource.kv(spark, dir)
    kv.filter(tsNsRange(kv, T1, T2))
      .groupBy(col("topic"))
      .agg(count(lit(1)).as("n"), min("ms").as("min_ms"), max("ms").as("max_ms"))
      .orderBy(col("topic"))
  }

  val timeRangeScanSql: String =
    s"""WITH ${KvSql.cte}
       |SELECT topic, count(*) AS n, min(ms) AS min_ms, max(ms) AS max_ms
       |FROM kv WHERE ms >= $T1 AND ms < $T2 GROUP BY topic ORDER BY topic""".stripMargin

  // -------------------------------------------------------------- №4 latest_cell
  /** Latest version per key via max_by aggregation — ONE hash shuffle with
    * map-side partial aggregation; no sort, no window (SURVEY §4). Key here
    * is the per-user row key (users have many event versions).
    */
  def latestCell(spark: SparkSession, dir: String): DataFrame =
    KvSource.kv(spark, dir)
      .groupBy(col("uid"))
      .agg(
        max_by(col("eid"), struct(col("ms"), col("eid"))).as("latest_eid"),
        max(struct(col("ms"), col("eid"))).getField("ms").as("latest_ms"),
        count(lit(1)).as("n_versions"))
      .orderBy(col("uid"))

  val latestCellSql: String =
    s"""WITH ${KvSql.cte},
       |ranked AS (
       |  SELECT uid, eid, ms, count(*) OVER (PARTITION BY uid) AS n_versions,
       |    row_number() OVER (PARTITION BY uid ORDER BY ms DESC, eid DESC) AS rn
       |  FROM kv)
       |SELECT uid, eid AS latest_eid, ms AS latest_ms, n_versions
       |FROM ranked WHERE rn = 1 ORDER BY uid""".stripMargin

  // -------------------------------------------------------------- №4b latest_cell_salted
  /** [[latestCell]] through the two-phase SALTED aggregation
    * ([[graft.operators.Salting.latestCellSalted]]) — the skew machinery
    * exercised on a driver row with the SAME oracle as latest_cell (the
    * two plans must agree on every row). The salted path's domain is a hot
    * row key holding a large share of all versions (HBase timeline skew):
    * phase 1 shuffles on (uid, salt) so the hot key spreads over 8
    * reducers, phase 2 re-aggregates the tiny partials on uid alone.
    * SaltingSpec proves equality under an injected hot key and pins the
    * two-exchange plan; this row proves it on the live corpus. */
  def latestCellSalted(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Salting.latestCellSalted(KvSource.kv(spark, dir), salts = 8)
      .orderBy(col("uid"))

  // -------------------------------------------------------------- №5 envelope_extract
  def envelopeExtract(spark: SparkSession, dir: String): DataFrame =
    parsed(spark, dir)
      .filter(mandatoryOk)
      .select(col("eid"), col("x_outer").as("outer_type"), col("x_inner").as("inner_type"),
        col("r_db"), col("r_coll"), col("x_lm").as("lm"), col("x_kek").as("kek"),
        col("x_iv").as("iv_b64"), col("x_eek").as("eek_b64"), col("x_id").as("id_json"))
      .orderBy(col("eid"))

  val envelopeExtractSql: String =
    s"""WITH ${KvSql.cte}
       |SELECT eid, outer_type, inner_type,
       |  ${KvSql.dbResolvedSql} AS r_db, ${KvSql.collResolvedSql} AS r_coll,
       |  lm_str AS lm, '${KvModel.Kek}' AS kek, iv_b64, eek_b64, id_json
       |FROM kv WHERE valid ORDER BY eid""".stripMargin

  // -------------------------------------------------------------- №6 topic_table_map
  def topicTableMap(spark: SparkSession, dir: String): DataFrame =
    KvSource.kv(spark, dir)
      .select(col("topic"),
        regexp_extract(col("topic"), """^(?:\w+\.)?([-\w]+)\.([-\w]+)$""", 1).as("t_db"),
        regexp_extract(col("topic"), """^(?:\w+\.)?([-\w]+)\.([-\w]+)$""", 2).as("t_coll"))
      .distinct()
      .orderBy(col("topic"))

  val topicTableMapSql: String =
    s"""WITH ${KvSql.cte}
       |SELECT DISTINCT topic,
       |  regexp_extract(topic, '^(?:\\w+\\.)?([-\\w]+)\\.([-\\w]+)$$', 1) AS t_db,
       |  regexp_extract(topic, '^(?:\\w+\\.)?([-\\w]+)\\.([-\\w]+)$$', 2) AS t_coll
       |FROM kv ORDER BY topic""".stripMargin

  // -------------------------------------------------------------- №7 blocked_topics
  def blockedTopics(spark: SparkSession, dir: String): DataFrame =
    KvSource.kv(spark, dir)
      .filter(!col("topic").isin(KvModel.BlockedTopics: _*))
      .groupBy(col("topic")).agg(count(lit(1)).as("n"))
      .orderBy(col("topic"))

  val blockedTopicsSql: String =
    s"""WITH ${KvSql.cte}
       |SELECT topic, count(*) AS n FROM kv
       |WHERE topic NOT IN (${KvModel.BlockedTopics.map(t => s"'$t'").mkString(", ")})
       |GROUP BY topic ORDER BY topic""".stripMargin

  // -------------------------------------------------------------- №8 validate_mandatory
  def validateMandatory(spark: SparkSession, dir: String): DataFrame =
    parsed(spark, dir)
      .groupBy(col("topic"))
      .agg(sum(when(mandatoryOk, 1L).otherwise(0L)).as("n_ok"),
        sum(when(mandatoryOk, 0L).otherwise(1L)).as("n_skipped"))
      .orderBy(col("topic"))

  val validateMandatorySql: String =
    s"""WITH ${KvSql.cte}
       |SELECT topic, CAST(sum(CASE WHEN valid THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
       |  CAST(sum(CASE WHEN valid THEN 0 ELSE 1 END) AS BIGINT) AS n_skipped
       |FROM kv GROUP BY topic ORDER BY topic""".stripMargin

  // -------------------------------------------------------------- №9 aes_roundtrip
  def aesRoundtrip(spark: SparkSession, dir: String): DataFrame =
    parsed(spark, dir)
      .filter(mandatoryOk)
      .withColumn("payload_dec", decrypted)
      .select(col("eid"), md5(col("payload_dec")).as("payload_md5"),
        length(col("payload_dec")).as("payload_len"))
      .orderBy(col("eid"))

  val aesRoundtripSql: String =
    s"""WITH ${KvSql.cte}
       |SELECT eid, md5(payload) AS payload_md5, length(payload) AS payload_len
       |FROM kv WHERE valid ORDER BY eid""".stripMargin

  // -------------------------------------------------------------- №10 business_audit
  def businessAudit(spark: SparkSession, dir: String): DataFrame =
    parsed(spark, dir, col("etype") === "error") // kv-level topic pre-filter
      .filter(mandatoryOk && isBusinessAudit)
      .withColumn("payload_dec", decrypted)
      .select(col("eid"), auditPromote(col("payload_dec"), col("x_lm")).as("audit_json"))
      .orderBy(col("eid"))

  val businessAuditSql: String =
    s"""WITH ${KvSql.cte}
       |SELECT eid,
       |  '{"user":"user' || CAST(uid AS VARCHAR) || '","AUDIT_EVENT":"errorEvent","TIME_STAMP":"'
       |    || lm_str || '","TIME_STAMP_ORIG":"' || lm_str || '"}' AS audit_json
       |FROM kv WHERE valid AND etype = 'error' ORDER BY eid""".stripMargin

  // -------------------------------------------------------------- №11 id_normalize
  def idNormalize(spark: SparkSession, dir: String): DataFrame =
    records(spark, dir)
      .select(col("eid"), col("v.manifest_id").as("manifest_id"), col("v.original_id").as("original_id"))
      .orderBy(col("eid"))

  val idNormalizeSql: String =
    s"""WITH ${KvSql.cte}
       |SELECT eid, ${KvSql.manifestIdSql} AS manifest_id, ${KvSql.originalIdSql} AS original_id
       |FROM kv WHERE valid ORDER BY eid""".stripMargin

  // -------------------------------------------------------------- №12 date_wrap
  def dateWrap(spark: SparkSession, dir: String): DataFrame =
    records(spark, dir, col("etype").isin("click", "view"))
      .select(col("eid"), col("v.record").as("record"))
      .orderBy(col("eid"))

  val dateWrapSql: String =
    s"""WITH ${KvSql.cte}
       |SELECT eid, ${KvSql.validatedRecordSql} AS record
       |FROM kv WHERE valid AND etype IN ('click','view') ORDER BY eid""".stripMargin

  // -------------------------------------------------------------- №13 sanitise
  def sanitiseQ(spark: SparkSession, dir: String): DataFrame =
    records(spark, dir, col("etype") === "purchase")
      .select(col("eid"), col("record"))
      .orderBy(col("eid"))

  val sanitiseSql: String =
    s"""WITH ${KvSql.cte}
       |SELECT eid, ${KvSql.expectedRecordSql} AS record
       |FROM kv WHERE valid AND etype = 'purchase' ORDER BY eid""".stripMargin

  // -------------------------------------------------------------- №14 equality_wrap
  def equalityWrapQ(spark: SparkSession, dir: String): DataFrame =
    records(spark, dir, col("etype") === "signup")
      .select(col("eid"), col("record"))
      .orderBy(col("eid"))

  val equalityWrapSql: String =
    s"""WITH ${KvSql.cte}
       |SELECT eid, ${KvSql.expectedRecordSql} AS record
       |FROM kv WHERE valid AND etype = 'signup' ORDER BY eid""".stripMargin

  // -------------------------------------------------------------- №15 manifest_gen
  def manifestGen(spark: SparkSession, dir: String): DataFrame =
    records(spark, dir)
      .select(col("eid"), col("manifest_line"))
      .orderBy(col("eid"))

  val manifestGenSql: String =
    s"""WITH ${KvSql.cte}
       |SELECT eid, ${KvSql.manifestLineSql} AS manifest_line
       |FROM kv WHERE valid ORDER BY eid""".stripMargin

  // -------------------------------------------------------------- №16 chunk_batch
  /** Byte-bounded chunk ids per (keyspace partition, topic): window cumsum
    * WITHIN the partition only — never a global sort (SURVEY §4). The
    * reference numbers batches per (topic, scan-partition) writer (one job
    * = one topic), so the byte-bound and batch index never span topics.
    * Chunk id = floor(exclusive-prefix-bytes / max).
    */
  def chunkBatch(spark: SparkSession, dir: String): DataFrame =
    ExportOps.withChunkIds(records(spark, dir))
      .groupBy(col("plabel"), col("topic"), col("batch"))
      .agg(count(lit(1)).as("n_records"), sum(col("bytes")).as("batch_bytes"))
      .orderBy(col("plabel"), col("topic"), col("batch"))

  val chunkBatchSql: String =
    s"""WITH ${KvSql.cte},
       |$recordsCte,
       |sized AS (
       |  SELECT topic, ${KvSql.partitionLabelSql("key_byte")} AS plabel,
       |    key_hash, eid, length(record) + 1 AS bytes
       |  FROM records),
       |batched AS (
       |  SELECT plabel, topic, bytes,
       |    CAST(coalesce(sum(bytes) OVER (PARTITION BY plabel, topic ORDER BY key_hash, eid
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // ${KvModel.ChunkMaxBytes} AS BIGINT) AS batch
       |  FROM sized)
       |SELECT plabel, topic, batch, count(*) AS n_records, CAST(sum(bytes) AS BIGINT) AS batch_bytes
       |FROM batched GROUP BY plabel, topic, batch ORDER BY plabel, topic, batch""".stripMargin

  // -------------------------------------------------------------- №17 snapshot_name
  def snapshotNameQ(spark: SparkSession, dir: String): DataFrame =
    ExportOps.withChunkIds(records(spark, dir))
      .groupBy(col("topic"), col("pstart"), col("pstop"), col("batch"))
      .agg(count(lit(1)).as("n_records"))
      .withColumn("object_key", snapshotName("exports", col("topic"), col("pstart"), col("pstop"), col("batch")))
      .select(col("object_key"), col("n_records"))
      .orderBy(col("object_key"))

  val snapshotNameSql: String =
    s"""WITH ${KvSql.cte},
       |$recordsCte,
       |sized AS (
       |  SELECT topic, ${KvSql.partitionLabelSql("key_byte")} AS plabel,
       |    ${KvSql.pstartSql("key_byte")} AS pstart,
       |    ${KvSql.pstopSql("key_byte")} AS pstop,
       |    key_hash, eid, length(record) + 1 AS bytes
       |  FROM records),
       |batched AS (
       |  SELECT topic, pstart, pstop, bytes,
       |    CAST(coalesce(sum(bytes) OVER (PARTITION BY plabel, topic ORDER BY key_hash, eid
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // ${KvModel.ChunkMaxBytes} AS BIGINT) AS batch
       |  FROM sized)
       |SELECT printf('exports/%s-%03d-%03d-%06d.txt.gz.enc', topic, pstart, pstop, batch + 1) AS object_key,
       |  count(*) AS n_records
       |FROM batched GROUP BY topic, pstart, pstop, batch ORDER BY object_key""".stripMargin

  // -------------------------------------------------------------- №18 jsonl_snapshot (oracle)
  /** The EXPECTED (object_key, record) pairs the snapshot sink must emit on
    * decrypt-read-back — the full sink contract (chunk assignment + object
    * naming + content round trip) reconstructed relationally. */
  val jsonlSnapshotSql: String =
    s"""WITH ${KvSql.cte},
       |$recordsCte,
       |sized AS (
       |  SELECT topic, ${KvSql.partitionLabelSql("key_byte")} AS plabel,
       |    ${KvSql.pstartSql("key_byte")} AS pstart,
       |    ${KvSql.pstopSql("key_byte")} AS pstop,
       |    key_hash, eid, record, length(record) + 1 AS bytes
       |  FROM records),
       |batched AS (
       |  SELECT topic, pstart, pstop, record,
       |    CAST(coalesce(sum(bytes) OVER (PARTITION BY plabel, topic ORDER BY key_hash, eid
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // ${KvModel.ChunkMaxBytes} AS BIGINT) AS batch
       |  FROM sized)
       |SELECT printf('exports/%s-%03d-%03d-%06d.txt.gz.enc', topic, pstart, pstop, batch + 1) AS object_key, record
       |FROM batched ORDER BY object_key, record""".stripMargin

  // -------------------------------------------------------------- №19 export_status
  def exportStatus(spark: SparkSession, dir: String): DataFrame =
    records(spark, dir)
      .groupBy(col("topic"))
      .agg(count(lit(1)).as("n_records"), sum(length(col("record")) + 1).as("total_bytes"))
      .orderBy(col("topic"))

  val exportStatusSql: String =
    s"""WITH ${KvSql.cte},
       |$recordsCte
       |SELECT topic, count(*) AS n_records, CAST(sum(length(record) + 1) AS BIGINT) AS total_bytes
       |FROM records GROUP BY topic ORDER BY topic""".stripMargin

  // -------------------------------------------------------------- №37 export_completion
  /** Export completion lifecycle, data-level (reference:
    * DynamoDBExportStatusService.kt:30-46 + JobCompletionNotificationListener
    * .kt:70-92 — the DynamoDB/SNS transport is §6 environment plumbing; the
    * STATUS SEMANTICS are data): per topic, the files/records a completed
    * export produced and its terminal status (Blocked_Topic aborts before
    * writing → 0 files; everything else completes → Exported), plus the
    * job-level completion verdict with the reference's precedence
    * (all-successful → COMPLETED_SUCCESSFULLY; any Exporting →
    * IN_PROGRESS; any Export_Failed → COMPLETED_UNSUCCESSFULLY; else
    * NOT_COMPLETED — note Blocked_Topic and Table_Unavailable COUNT AS
    * successful completion, DynamoDBExportStatusService.kt:162-165).
    *
    * The over-() window runs on the 15-row post-aggregation frame — single
    * partition by construction, never on row-scale data.
    */
  /** Per-topic status under the reference's lifecycle, data-level:
    * configured-but-absent table → Table_Unavailable; blocked → aborted
    * before writing → Blocked_Topic; else Exported. `present` is set by
    * [[completionWith]] (non-null ⇔ the topic has rows in the corpus). */
  def defaultTopicStatus: Column =
    when(col("present").isNull, "Table_Unavailable")
      .when(col("topic").isin(KvModel.BlockedTopics: _*), "Blocked_Topic")
      .otherwise("Exported")

  /** Completion lifecycle over the CONFIGURED topic list with a pluggable
    * per-topic status expression — the reference's process states
    * (Exporting / Export_Failed, set by the job runner, not the data) are
    * injected by callers; see [[exportCompletionFailed]] and
    * CompletionSpec for the failure verdicts. */
  /** Statuses that COUNT AS successful completion for the job verdict
    * (reference: DynamoDBExportStatusService.kt:162-165 — note
    * Table_Unavailable and Blocked_Topic are in the set). */
  val SuccessStatuses: Seq[String] =
    Seq("Exported", "Sent", "Received", "Success", "Table_Unavailable", "Blocked_Topic")

  def completionWith(spark: SparkSession, dir: String, statusFor: Column): DataFrame = {
    val successSet = SuccessStatuses
    import spark.implicits._
    val chunks = ExportOps.withChunkIds(
        records(spark, dir, !col("topic").isin(KvModel.BlockedTopics: _*)))
      .withColumn("object_key",
        snapshotName("exports", col("topic"), col("pstart"), col("pstop"), col("batch")))
      .groupBy(col("topic"))
      .agg(countDistinct(col("object_key")).as("files_exported"),
        count(lit(1)).as("records_exported"))
    val present = KvSource.kv(spark, dir).select(col("topic")).distinct()
      .withColumn("present", lit(true))
    val allTopics = KvModel.DeclaredTopics.toDF("topic")
    // Unpartitioned window BY DESIGN (WindowExec warns "No Partition
    // Defined"): the job verdict is a global min/max over the per-TOPIC
    // frame, whose size is bounded by the configured topic list (≤18 rows
    // at any data scale) — never over record-level data.
    val allW = Window.partitionBy()
    allTopics.join(chunks, Seq("topic"), "left").join(present, Seq("topic"), "left")
      .select(col("topic"),
        coalesce(col("files_exported"), lit(0L)).as("files_exported"),
        coalesce(col("records_exported"), lit(0L)).as("records_exported"),
        statusFor.as("status"))
      .withColumn("job_completion",
        when(min(when(col("status").isin(successSet: _*), 1).otherwise(0)).over(allW) === 1,
          "COMPLETED_SUCCESSFULLY")
          .when(max(when(col("status") === "Exporting", 1).otherwise(0)).over(allW) === 1,
            "IN_PROGRESS")
          .when(max(when(col("status") === "Export_Failed", 1).otherwise(0)).over(allW) === 1,
            "COMPLETED_UNSUCCESSFULLY")
          .otherwise("NOT_COMPLETED"))
      .orderBy(col("topic"))
  }

  def exportCompletion(spark: SparkSession, dir: String): DataFrame =
    completionWith(spark, dir, defaultTopicStatus)

  /** The failure lifecycle, reachable: one topic's export fails mid-run
    * (reference: any step exception → Export_Failed,
    * JobCompletionNotificationListener.kt:70-92). No Exporting remains, so
    * the verdict is COMPLETED_UNSUCCESSFULLY; the IN_PROGRESS precedence
    * (Exporting beats Export_Failed) and NOT_COMPLETED fallback are
    * spec-covered in CompletionSpec. */
  val FailedTopic = "database0.collection2"
  def exportCompletionFailed(spark: SparkSession, dir: String): DataFrame =
    completionWith(spark, dir,
      when(col("topic") === FailedTopic, "Export_Failed").otherwise(defaultTopicStatus))

  private def declaredTopicsValues: String =
    KvModel.DeclaredTopics.map(t => s"('$t')").mkString(", ")

  private def completionSqlWith(statusCase: String): String = {
    val blockedIn = KvModel.BlockedTopics.map(t => s"'$t'").mkString(", ")
    s"""WITH ${KvSql.cte},
       |records AS (
       |  SELECT kv.*, ${KvSql.expectedRecordSql} AS record
       |  FROM kv WHERE valid AND topic NOT IN ($blockedIn)),
       |sized AS (
       |  SELECT topic, ${KvSql.partitionLabelSql("key_byte")} AS plabel,
       |    ${KvSql.pstartSql("key_byte")} AS pstart,
       |    ${KvSql.pstopSql("key_byte")} AS pstop,
       |    key_hash, eid, length(record) + 1 AS bytes
       |  FROM records),
       |batched AS (
       |  SELECT topic, pstart, pstop,
       |    CAST(coalesce(sum(bytes) OVER (PARTITION BY plabel, topic ORDER BY key_hash, eid
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // ${KvModel.ChunkMaxBytes} AS BIGINT) AS batch
       |  FROM sized),
       |chunks AS (
       |  SELECT topic,
       |    count(DISTINCT printf('exports/%s-%03d-%03d-%06d.txt.gz.enc', topic, pstart, pstop, batch + 1)) AS files_exported,
       |    count(*) AS records_exported
       |  FROM batched GROUP BY topic),
       |topics AS (SELECT topic FROM (VALUES $declaredTopicsValues) v(topic)),
       |present AS (SELECT DISTINCT topic AS ptopic FROM kv),
       |pt AS (
       |  SELECT t.topic,
       |    coalesce(c.files_exported, 0) AS files_exported,
       |    coalesce(c.records_exported, 0) AS records_exported,
       |    $statusCase AS status
       |  FROM topics t LEFT JOIN chunks c USING (topic)
       |    LEFT JOIN present p ON p.ptopic = t.topic)
       |SELECT topic, files_exported, records_exported, status,
       |  CASE WHEN min(CASE WHEN status IN ('Exported','Sent','Received','Success','Table_Unavailable','Blocked_Topic')
       |         THEN 1 ELSE 0 END) OVER () = 1 THEN 'COMPLETED_SUCCESSFULLY'
       |       WHEN max(CASE WHEN status = 'Exporting' THEN 1 ELSE 0 END) OVER () = 1 THEN 'IN_PROGRESS'
       |       WHEN max(CASE WHEN status = 'Export_Failed' THEN 1 ELSE 0 END) OVER () = 1 THEN 'COMPLETED_UNSUCCESSFULLY'
       |       ELSE 'NOT_COMPLETED' END AS job_completion
       |FROM pt ORDER BY topic""".stripMargin
  }

  private def defaultStatusCase: String = {
    val blockedIn = KvModel.BlockedTopics.map(t => s"'$t'").mkString(", ")
    s"""CASE WHEN p.ptopic IS NULL THEN 'Table_Unavailable'
       |       WHEN t.topic IN ($blockedIn) THEN 'Blocked_Topic'
       |       ELSE 'Exported' END""".stripMargin
  }

  val exportCompletionSql: String = completionSqlWith(defaultStatusCase)

  val exportCompletionFailedSql: String = completionSqlWith(
    s"CASE WHEN t.topic = '$FailedTopic' THEN 'Export_Failed' ELSE $defaultStatusCase END")

  // -------------------------------------------------------------- №212 completion_message
  /** EXPORT-COMPLETION MESSAGING, data-level (r14 verdict item 6 — the
    * last reference behavior a real operator observes that graft modeled
    * only as a decision): the full set of messages the reference emits
    * around a run, as ONE deterministic frame — the transport (SQS/SNS
    * clients, retries, ARNs) is §6 environment plumbing, but WHICH
    * messages go to WHICH channel with WHAT payload fields is data:
    *   - one FIFO snapshot-sender message PER EXPORTED OBJECT, group id =
    *     topic with '.'→'_' (reference: S3StreamingWriter.kt:132 calls
    *     SQSMessagingService.notifySnapshotSender(objectKey) after every
    *     object; fifoQueueMessageRequest sets messageGroupId,
    *     SQSMessagingService.kt:20-29,52-57);
    *   - a "no files exported" FIFO message for a topic that COMPLETED
    *     with zero files (JobCompletionNotificationListener.kt:94-96 —
    *     exit COMPLETED && exportedFilesCount()==0; provably EMPTY on
    *     this corpus: every completed topic exports ≥1 file, and blocked/
    *     absent topics abort before the check — the oracle proves the
    *     empty set rather than the row narrating it);
    *   - one NON-fifo data-egress (RIS) message per topic that completed
    *     with files, key prefix "exports/<topic>-"
    *     (JobCompletionNotificationListener.kt:114-117,
    *     SQSMessagingService.kt:42-48 dataEgressRisMessage);
    *   - one SNS topic-failed monitoring message per topic whose run did
    *     NOT complete — blocked and table-unavailable abort the job
    *     (JobCompletionNotificationListener.kt:119-123,
    *     SnsServiceImpl.kt failedTopicMonitoringPayload);
    *   - one job-level SNS completion-monitoring message when the verdict
    *     is terminal, payload status = the verdict's description
    *     (JobCompletionNotificationListener.kt:139-143,
    *     ExportCompletionStatus.kt descriptions);
    *   - one job-level ADG-trigger message iff COMPLETED_SUCCESSFULLY
    *     (JobCompletionNotificationListener.kt:100-104). The PDM
    *     common-model leg is config-off by default
    *     (pdm.common.model.site.prefix blank) and stays a non-goal.
    * At 100 TB the only record-scale leg is the per-object one — it rides
    * the chunk frame (distributed, one row per exported object, exactly
    * the real message volume); everything else is topic-bounded. */
  def completionMessage(spark: SparkSession, dir: String): DataFrame = {
    val comp = completionWith(spark, dir, defaultTopicStatus)
    val nullS = lit(null).cast("string")
    val nullL = lit(null).cast("bigint")
    val groupId = regexp_replace(col("topic"), "\\.", "_")
    val fileMsgs = ExportOps.withChunkIds(
        records(spark, dir, !col("topic").isin(KvModel.BlockedTopics: _*)))
      .withColumn("object_key",
        snapshotName("exports", col("topic"), col("pstart"), col("pstop"), col("batch")))
      .select(col("topic"), col("object_key")).distinct()
      .select(lit("snapshot_sender").as("kind"), lit("sqs:snapshot-sender").as("channel"),
        lit(true).as("fifo"), groupId.as("group_id"), col("topic"), col("object_key"),
        nullL.as("files_exported"), nullS.as("payload_status"))
    // exit COMPLETED ⇔ status Exported (blocked/unavailable topics abort)
    val completed = comp.filter(col("status") === "Exported")
    val noFiles = completed.filter(col("files_exported") === 0)
      .select(lit("no_files_exported").as("kind"), lit("sqs:snapshot-sender").as("channel"),
        lit(true).as("fifo"), groupId.as("group_id"), col("topic"),
        nullS.as("object_key"), col("files_exported"), nullS.as("payload_status"))
    val ris = completed.filter(col("files_exported") > 0)
      .select(lit("data_egress_ris").as("kind"), lit("sqs:data-egress").as("channel"),
        lit(false).as("fifo"), nullS.as("group_id"), col("topic"),
        concat(lit("exports/"), col("topic"), lit("-")).as("object_key"),
        col("files_exported"), nullS.as("payload_status"))
    val failedMon = comp.filter(col("status").isin("Blocked_Topic", "Table_Unavailable"))
      .select(lit("topic_failed_monitoring").as("kind"), lit("sns:monitoring").as("channel"),
        lit(false).as("fifo"), nullS.as("group_id"), col("topic"),
        nullS.as("object_key"), nullL.as("files_exported"),
        lit("failed").as("payload_status"))
    val jobRow = comp.agg(max(col("job_completion")).as("jc"),
      sum(col("files_exported")).as("nf"))
    def desc = when(col("jc") === "COMPLETED_SUCCESSFULLY", "success")
      .when(col("jc") === "COMPLETED_UNSUCCESSFULLY", "failed")
      .when(col("jc") === "IN_PROGRESS", "in progress").otherwise("not completed")
    val monitoring = jobRow
      .filter(col("jc").isin("COMPLETED_SUCCESSFULLY", "COMPLETED_UNSUCCESSFULLY"))
      .select(lit("completion_monitoring").as("kind"), lit("sns:monitoring").as("channel"),
        lit(false).as("fifo"), nullS.as("group_id"), nullS.as("topic"),
        nullS.as("object_key"), col("nf").as("files_exported"), desc.as("payload_status"))
    val adg = jobRow.filter(col("jc") === "COMPLETED_SUCCESSFULLY")
      .select(lit("adg_trigger").as("kind"), lit("sns:adg").as("channel"),
        lit(false).as("fifo"), nullS.as("group_id"), nullS.as("topic"),
        nullS.as("object_key"), col("nf").as("files_exported"), desc.as("payload_status"))
    fileMsgs.unionByName(noFiles).unionByName(ris).unionByName(failedMon)
      .unionByName(monitoring).unionByName(adg)
      .orderBy(col("kind"), col("topic"), col("object_key"))
  }

  val completionMessageSql: String = {
    val blockedIn = KvModel.BlockedTopics.map(t => s"'$t'").mkString(", ")
    val successIn = SuccessStatuses.map(s => s"'$s'").mkString(", ")
    s"""WITH ${KvSql.cte},
       |records AS (
       |  SELECT kv.*, ${KvSql.expectedRecordSql} AS record
       |  FROM kv WHERE valid AND topic NOT IN ($blockedIn)),
       |sized AS (
       |  SELECT topic, ${KvSql.partitionLabelSql("key_byte")} AS plabel,
       |    ${KvSql.pstartSql("key_byte")} AS pstart,
       |    ${KvSql.pstopSql("key_byte")} AS pstop,
       |    key_hash, eid, length(record) + 1 AS bytes
       |  FROM records),
       |batched AS (
       |  SELECT topic, pstart, pstop,
       |    CAST(coalesce(sum(bytes) OVER (PARTITION BY plabel, topic ORDER BY key_hash, eid
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // ${KvModel.ChunkMaxBytes} AS BIGINT) AS batch
       |  FROM sized),
       |filekeys AS (
       |  SELECT DISTINCT topic,
       |    printf('exports/%s-%03d-%03d-%06d.txt.gz.enc', topic, pstart, pstop, batch + 1) AS object_key
       |  FROM batched),
       |chunks AS (
       |  SELECT topic, count(DISTINCT printf('exports/%s-%03d-%03d-%06d.txt.gz.enc', topic, pstart, pstop, batch + 1)) AS files_exported
       |  FROM batched GROUP BY topic),
       |topics AS (SELECT topic FROM (VALUES $declaredTopicsValues) v(topic)),
       |present AS (SELECT DISTINCT topic AS ptopic FROM kv),
       |pt AS (
       |  SELECT t.topic, coalesce(c.files_exported, 0) AS files_exported,
       |    $defaultStatusCase AS status
       |  FROM topics t LEFT JOIN chunks c USING (topic)
       |    LEFT JOIN present p ON p.ptopic = t.topic),
       |jc AS (
       |  SELECT CASE WHEN min(CASE WHEN status IN ($successIn) THEN 1 ELSE 0 END) = 1 THEN 'COMPLETED_SUCCESSFULLY'
       |              WHEN max(CASE WHEN status = 'Exporting' THEN 1 ELSE 0 END) = 1 THEN 'IN_PROGRESS'
       |              WHEN max(CASE WHEN status = 'Export_Failed' THEN 1 ELSE 0 END) = 1 THEN 'COMPLETED_UNSUCCESSFULLY'
       |              ELSE 'NOT_COMPLETED' END AS jc,
       |    CAST(sum(files_exported) AS BIGINT) AS nf
       |  FROM pt),
       |msgs AS (
       |  SELECT 'snapshot_sender' AS kind, 'sqs:snapshot-sender' AS channel, TRUE AS fifo,
       |    replace(topic, '.', '_') AS group_id, topic, object_key,
       |    CAST(NULL AS BIGINT) AS files_exported, CAST(NULL AS VARCHAR) AS payload_status
       |  FROM filekeys
       |  UNION ALL
       |  SELECT 'no_files_exported', 'sqs:snapshot-sender', TRUE, replace(topic, '.', '_'),
       |    topic, NULL, files_exported, NULL
       |  FROM pt WHERE status = 'Exported' AND files_exported = 0
       |  UNION ALL
       |  SELECT 'data_egress_ris', 'sqs:data-egress', FALSE, NULL, topic,
       |    'exports/' || topic || '-', files_exported, NULL
       |  FROM pt WHERE status = 'Exported' AND files_exported > 0
       |  UNION ALL
       |  SELECT 'topic_failed_monitoring', 'sns:monitoring', FALSE, NULL, topic,
       |    NULL, NULL, 'failed'
       |  FROM pt WHERE status IN ('Blocked_Topic', 'Table_Unavailable')
       |  UNION ALL
       |  SELECT 'completion_monitoring', 'sns:monitoring', FALSE, NULL, NULL, NULL, nf,
       |    CASE jc WHEN 'COMPLETED_SUCCESSFULLY' THEN 'success'
       |            WHEN 'COMPLETED_UNSUCCESSFULLY' THEN 'failed'
       |            WHEN 'IN_PROGRESS' THEN 'in progress' ELSE 'not completed' END
       |  FROM jc WHERE jc IN ('COMPLETED_SUCCESSFULLY', 'COMPLETED_UNSUCCESSFULLY')
       |  UNION ALL
       |  SELECT 'adg_trigger', 'sns:adg', FALSE, NULL, NULL, NULL, nf,
       |    CASE jc WHEN 'COMPLETED_SUCCESSFULLY' THEN 'success'
       |            WHEN 'COMPLETED_UNSUCCESSFULLY' THEN 'failed'
       |            WHEN 'IN_PROGRESS' THEN 'in progress' ELSE 'not completed' END
       |  FROM jc WHERE jc = 'COMPLETED_SUCCESSFULLY')
       |SELECT * FROM msgs ORDER BY kind, topic, object_key""".stripMargin
  }

  // -------------------------------------------------------------- №213 product_status
  /** PRODUCT-LEVEL STATUS TRACKING, data-level (r14 verdict item 6's
    * second leg): the reference maintains a SECOND status row — product
    * level, keyed (Correlation_Id, DataProduct='HTME') — distinct from
    * the per-topic export status
    * (DynamoDBProductStatusService.kt:22-46 setStatus via UpdateItem;
    * JobCompletionNotificationListener.kt:129-137 setProductStatus). The
    * state machine is data: COMPLETED iff the job verdict is
    * COMPLETED_SUCCESSFULLY, FAILED iff COMPLETED_UNSUCCESSFULLY, and NO
    * update for IN_PROGRESS / NOT_COMPLETED (the `when` has no else —
    * the row keeps its prior IN_PROGRESS). All four verdicts are driven
    * as scenarios over ONE chunk-frame pass (the per-topic statuses are
    * injected on the ≤18-row topic frame — the record-scale work never
    * re-runs per scenario). */
  def productStatus(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val chunks = ExportOps.withChunkIds(
        records(spark, dir, !col("topic").isin(KvModel.BlockedTopics: _*)))
      .withColumn("object_key",
        snapshotName("exports", col("topic"), col("pstart"), col("pstop"), col("batch")))
      .groupBy(col("topic"))
      .agg(countDistinct(col("object_key")).as("files_exported"))
    val present = KvSource.kv(spark, dir).select(col("topic")).distinct()
      .withColumn("present", lit(true))
    val base = KvModel.DeclaredTopics.toDF("topic")
      .join(chunks, Seq("topic"), "left").join(present, Seq("topic"), "left")
    // four verdict scenarios on the topic-bounded frame: clean run, one
    // failed topic, one still exporting, one in a status outside every set
    val scen = Seq("clean", "one_failed", "one_exporting", "one_cancelled").toDF("scenario")
    val status = when(col("scenario") === "one_failed" && col("topic") === FailedTopic, "Export_Failed")
      .when(col("scenario") === "one_exporting" && col("topic") === FailedTopic, "Exporting")
      .when(col("scenario") === "one_cancelled" && col("topic") === FailedTopic, "Cancelled")
      .otherwise(defaultTopicStatus)
    val verdict = when(col("all_ok") === 1, "COMPLETED_SUCCESSFULLY")
      .when(col("any_prog") === 1, "IN_PROGRESS")
      .when(col("any_fail") === 1, "COMPLETED_UNSUCCESSFULLY")
      .otherwise("NOT_COMPLETED")
    val update = when(col("job_completion") === "COMPLETED_SUCCESSFULLY", "COMPLETED")
      .when(col("job_completion") === "COMPLETED_UNSUCCESSFULLY", "FAILED")
    base.crossJoin(broadcast(scen))
      .withColumn("status", status)
      .groupBy(col("scenario"))
      .agg(
        min(when(col("status").isin(SuccessStatuses: _*), 1).otherwise(0)).as("all_ok"),
        max(when(col("status") === "Exporting", 1).otherwise(0)).as("any_prog"),
        max(when(col("status") === "Export_Failed", 1).otherwise(0)).as("any_fail"))
      .withColumn("job_completion", verdict)
      .select(col("scenario"), lit("HTME").as("data_product"), col("job_completion"),
        update.as("update_applied"),
        coalesce(update, lit("IN_PROGRESS")).as("product_status"))
      .orderBy(col("scenario"))
  }

  val productStatusSql: String = {
    val blockedIn = KvModel.BlockedTopics.map(t => s"'$t'").mkString(", ")
    val successIn = SuccessStatuses.map(s => s"'$s'").mkString(", ")
    s"""WITH ${KvSql.cte},
       |records AS (
       |  SELECT kv.*, ${KvSql.expectedRecordSql} AS record
       |  FROM kv WHERE valid AND topic NOT IN ($blockedIn)),
       |sized AS (
       |  SELECT topic, ${KvSql.partitionLabelSql("key_byte")} AS plabel,
       |    ${KvSql.pstartSql("key_byte")} AS pstart,
       |    ${KvSql.pstopSql("key_byte")} AS pstop,
       |    key_hash, eid, length(record) + 1 AS bytes
       |  FROM records),
       |batched AS (
       |  SELECT topic, pstart, pstop,
       |    CAST(coalesce(sum(bytes) OVER (PARTITION BY plabel, topic ORDER BY key_hash, eid
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // ${KvModel.ChunkMaxBytes} AS BIGINT) AS batch
       |  FROM sized),
       |chunks AS (
       |  SELECT topic, count(DISTINCT printf('exports/%s-%03d-%03d-%06d.txt.gz.enc', topic, pstart, pstop, batch + 1)) AS files_exported
       |  FROM batched GROUP BY topic),
       |topics AS (SELECT topic FROM (VALUES $declaredTopicsValues) v(topic)),
       |present AS (SELECT DISTINCT topic AS ptopic FROM kv),
       |scen AS (SELECT scenario FROM (VALUES ('clean'), ('one_failed'), ('one_exporting'), ('one_cancelled')) s(scenario)),
       |pt AS (
       |  SELECT s.scenario, t.topic,
       |    CASE WHEN s.scenario = 'one_failed' AND t.topic = '$FailedTopic' THEN 'Export_Failed'
       |         WHEN s.scenario = 'one_exporting' AND t.topic = '$FailedTopic' THEN 'Exporting'
       |         WHEN s.scenario = 'one_cancelled' AND t.topic = '$FailedTopic' THEN 'Cancelled'
       |         ELSE $defaultStatusCase END AS status
       |  FROM topics t LEFT JOIN chunks c USING (topic)
       |    LEFT JOIN present p ON p.ptopic = t.topic
       |    CROSS JOIN scen s),
       |v AS (
       |  SELECT scenario,
       |    CASE WHEN min(CASE WHEN status IN ($successIn) THEN 1 ELSE 0 END) = 1 THEN 'COMPLETED_SUCCESSFULLY'
       |         WHEN max(CASE WHEN status = 'Exporting' THEN 1 ELSE 0 END) = 1 THEN 'IN_PROGRESS'
       |         WHEN max(CASE WHEN status = 'Export_Failed' THEN 1 ELSE 0 END) = 1 THEN 'COMPLETED_UNSUCCESSFULLY'
       |         ELSE 'NOT_COMPLETED' END AS job_completion
       |  FROM pt GROUP BY scenario)
       |SELECT scenario, 'HTME' AS data_product, job_completion,
       |  CASE job_completion WHEN 'COMPLETED_SUCCESSFULLY' THEN 'COMPLETED'
       |                      WHEN 'COMPLETED_UNSUCCESSFULLY' THEN 'FAILED' END AS update_applied,
       |  coalesce(CASE job_completion WHEN 'COMPLETED_SUCCESSFULLY' THEN 'COMPLETED'
       |                               WHEN 'COMPLETED_UNSUCCESSFULLY' THEN 'FAILED' END,
       |           'IN_PROGRESS') AS product_status
       |FROM v ORDER BY scenario""".stripMargin
  }


  // -------------------------------------------------------------- №214 metrics_push
  /** METRICS PUSH, data-level (r14 verdict "What's missing" item 2 — the
    * last uncovered reference behavior): the reference pushes its
    * Prometheus registry to a push-gateway per run and deletes the
    * grouping key's series at the end
    * (PushGatewayServiceImpl.kt:20-43 pushMetrics/pushFinalMetrics/
    * deleteMetrics; MetricsConfiguration.kt registers the counters). The
    * push/scrape TRANSPORT is §6 plumbing, but WHAT the final push
    * contains is pure data — every counter's terminal value is a
    * function of the corpus and the per-topic outcome:
    *   - `htme_records_written` / `htme_bytes_written`, labeled by
    *     keyspace SPLIT (S3StreamingWriter.kt:137-138 incs per written
    *     batch with the split label; a labeled series exists only once
    *     incremented, so only written (topic, split) pairs appear);
    *   - the collection-outcome counters
    *     (DynamoDBExportStatusService.kt:79-99: Exported →
    *     successful + exactly one of empty/non_empty; Export_Failed →
    *     failed; Blocked_Topic / Table_Unavailable → none);
    *   - `htme_topics_started`/`_completed` = 1 and
    *     `htme_running_applications` back to 0 for EVERY declared topic
    *     (JobCompletionNotificationListener.kt:42-66 — beforeJob incs,
    *     afterJob's finally decs, failures included);
    *   - the retry/failure counters and `htme_records_failed_validation`
    *     at their registered-zero values (this corpus has no retries and
    *     skip_audit proves zero validator rejections).
    * `htme_topic_duration` (a wall-clock Summary) is the one registry
    * member with no data derivation — excluded, documented here. The
    * delete-after-scrape lifecycle (series gone after pushGateway
    * .delete) is pinned in CompletionMessageSpec, not the oracle row.
    * At 100 TB the split-labeled series are the only corpus-scale leg
    * and aggregate map-side per (topic, split) — the push payload is
    * registry-sized, never record-sized. */
  /** Per-topic registry metrics and their outcome logic — ONE list so the
    * Spark side and the oracle SQL cannot drift (metric, Spark column,
    * DuckDB CASE over pt(topic, files_exported, status)). */
  private val pushTopicMetrics: Seq[(String, Column, String)] = Seq(
    ("htme_topics_started", lit(1L), "1"),
    ("htme_topics_completed", lit(1L), "1"),
    ("htme_running_applications", lit(0L), "0"),
    ("htme_successful_collections",
      when(col("status") === "Exported", 1L).otherwise(0L),
      "CASE WHEN status = 'Exported' THEN 1 ELSE 0 END"),
    ("htme_successful_empty_collections",
      when(col("status") === "Exported" && col("files_exported") === 0, 1L).otherwise(0L),
      "CASE WHEN status = 'Exported' AND files_exported = 0 THEN 1 ELSE 0 END"),
    ("htme_successful_non_empty_collections",
      when(col("status") === "Exported" && col("files_exported") > 0, 1L).otherwise(0L),
      "CASE WHEN status = 'Exported' AND files_exported > 0 THEN 1 ELSE 0 END"),
    ("htme_failed_collections",
      when(col("status") === "Export_Failed", 1L).otherwise(0L),
      "CASE WHEN status = 'Export_Failed' THEN 1 ELSE 0 END"),
    ("htme_records_failed_validation", lit(0L), "0"),
    ("htme_retried_batch_puts", lit(0L), "0"),
    ("htme_retried_manifest_puts", lit(0L), "0"),
    ("htme_dks_decrypt_retries", lit(0L), "0"),
    ("htme_dks_decrypt_failures", lit(0L), "0"),
    ("htme_dks_new_key_retries", lit(0L), "0"),
    ("htme_dks_new_key_failures", lit(0L), "0"))

  def metricsPush(spark: SparkSession, dir: String): DataFrame = {
    val rec = records(spark, dir, !col("topic").isin(KvModel.BlockedTopics: _*))
      .withColumn("split", ExportOps.partitionLabel(col("key_byte")))
      .groupBy(col("topic"), col("split"))
      .agg(count(lit(1)).as("n_records"), sum(length(col("record")) + 1).as("n_bytes"))
    val written = rec
      .select(col("topic"), lit("htme_records_written").as("metric"),
        col("split"), col("n_records").cast("long").as("value"))
      .unionByName(rec.select(col("topic"), lit("htme_bytes_written").as("metric"),
        col("split"), col("n_bytes").cast("long").as("value")))
    val perTopic = completionWith(spark, dir, defaultTopicStatus)
      .select(col("topic"), col("files_exported"), col("status"))
    val nullSplit = lit(null).cast("string")
    val topicRows = pushTopicMetrics.map { case (m, v, _) =>
      perTopic.select(col("topic"), lit(m).as("metric"), nullSplit.as("split"),
        v.cast("long").as("value"))
    }.reduce(_ unionByName _)
    written.unionByName(topicRows)
      .orderBy(col("topic"), col("metric"), col("split"))
  }

  val metricsPushSql: String = {
    val blockedIn = KvModel.BlockedTopics.map(t => s"'$t'").mkString(", ")
    val topicLegs = pushTopicMetrics.map { case (m, _, sql) =>
      s"SELECT topic, '$m' AS metric, CAST(NULL AS VARCHAR) AS split, CAST($sql AS BIGINT) AS value FROM pt"
    }.mkString("\n  UNION ALL ")
    s"""WITH ${KvSql.cte},
       |records AS (
       |  SELECT kv.*, ${KvSql.expectedRecordSql} AS record
       |  FROM kv WHERE valid AND topic NOT IN ($blockedIn)),
       |splits AS (
       |  SELECT topic, ${KvSql.partitionLabelSql("key_byte")} AS split,
       |    count(*) AS n_records, CAST(sum(length(record) + 1) AS BIGINT) AS n_bytes
       |  FROM records GROUP BY 1, 2),
       |sized AS (
       |  SELECT topic, ${KvSql.partitionLabelSql("key_byte")} AS plabel,
       |    ${KvSql.pstartSql("key_byte")} AS pstart,
       |    ${KvSql.pstopSql("key_byte")} AS pstop,
       |    key_hash, eid, length(record) + 1 AS bytes
       |  FROM records),
       |batched AS (
       |  SELECT topic, pstart, pstop,
       |    CAST(coalesce(sum(bytes) OVER (PARTITION BY plabel, topic ORDER BY key_hash, eid
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // ${KvModel.ChunkMaxBytes} AS BIGINT) AS batch
       |  FROM sized),
       |chunks AS (
       |  SELECT topic, count(DISTINCT printf('exports/%s-%03d-%03d-%06d.txt.gz.enc', topic, pstart, pstop, batch + 1)) AS files_exported
       |  FROM batched GROUP BY topic),
       |topics AS (SELECT topic FROM (VALUES $declaredTopicsValues) v(topic)),
       |present AS (SELECT DISTINCT topic AS ptopic FROM kv),
       |pt AS (
       |  SELECT t.topic, coalesce(c.files_exported, 0) AS files_exported,
       |    $defaultStatusCase AS status
       |  FROM topics t LEFT JOIN chunks c USING (topic)
       |    LEFT JOIN present p ON p.ptopic = t.topic),
       |m AS (
       |  SELECT topic, 'htme_records_written' AS metric, split, CAST(n_records AS BIGINT) AS value FROM splits
       |  UNION ALL SELECT topic, 'htme_bytes_written', split, n_bytes FROM splits
       |  UNION ALL $topicLegs)
       |SELECT topic, metric, split, value FROM m ORDER BY topic, metric, split""".stripMargin
  }

  // -------------------------------------------------------------- №39 skip_audit
  /** Per-topic skip accounting — the reference logs-and-counts every record
    * it skips (envelope MissingFieldException, DecryptionFailureException,
    * validator rejection), and silent data loss at 100 TB is the failure
    * mode the lenient expressions ([[graft.functions.EnvelopeExtract]]
    * rejectRow, AesCtrCrypt.cryptOrNull) would otherwise hide. Spark-first,
    * the counts are RELATIONAL, not a side-channel metric: every rejection
    * reason is a flag in the frame, aggregated per topic and checked by the
    * oracle (which knows the corpus's expected rejects exactly — and that
    * decrypt/validate failures MUST be zero here). One pass, map-side
    * partial aggregation; observable in any deploy mode, streaming
    * included. */
  def skipAudit(spark: SparkSession, dir: String): DataFrame = {
    parsed(spark, dir)
      .withColumn("payload_dec", decrypted)
      .withColumn("v", when(col("x_ok") && col("payload_dec").isNotNull,
        validate(when(isBusinessAudit, auditPromote(col("payload_dec"), col("x_lm")))
          .otherwise(col("payload_dec")), col("x_id"))))
      .groupBy(col("topic"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(!col("x_ok"), 1)).as("n_envelope_rejected"),
        count(when(col("x_ok") && col("payload_dec").isNull, 1)).as("n_decrypt_failed"),
        count(when(col("x_ok") && col("payload_dec").isNotNull && col("v").isNull, 1)).as("n_validator_rejected"),
        count(when(col("x_ok") && col("payload_dec").isNotNull && col("v").isNotNull, 1)).as("n_exported"))
      .orderBy(col("topic"))
  }

  val skipAuditSql: String =
    s"""WITH ${KvSql.cte}
       |SELECT topic, count(*) AS n_rows,
       |  count(*) FILTER (WHERE NOT valid) AS n_envelope_rejected,
       |  CAST(0 AS BIGINT) AS n_decrypt_failed,
       |  CAST(0 AS BIGINT) AS n_validator_rejected,
       |  count(*) FILTER (WHERE valid) AS n_exported
       |FROM kv GROUP BY topic ORDER BY topic""".stripMargin

  // -------------------------------------------------------------- №20 printable_key
  def printableKeyQ(spark: SparkSession, dir: String): DataFrame =
    KvSource.kv(spark, dir)
      .select(col("eid"), ExportOps.printableKey(col("key_hash"), col("id_json")).as("printable"))
      .orderBy(col("eid"))

  val printableKeySql: String =
    s"""WITH ${KvSql.cte}
       |SELECT eid, '\\x' || substr(key_hash,1,2) || '\\x' || substr(key_hash,3,2)
       |  || '\\x' || substr(key_hash,5,2) || '\\x' || substr(key_hash,7,2) || id_json AS printable
       |FROM kv ORDER BY eid""".stripMargin

  /** The full pipeline frame WITH the kv routing columns — what a sink
    * consumes (the snapshot sink needs key_byte/key_hash for chunk
    * assignment alongside record + manifest_line). */
  def pipelineRecords(spark: SparkSession, dir: String): DataFrame =
    records(spark, dir)

  /** Flagship: the whole export pipeline end-to-end (records + manifest). */
  def exportRecords(spark: SparkSession, dir: String): DataFrame =
    records(spark, dir)
      .select(col("eid"), col("topic"), col("record"), col("manifest_line"))
      .orderBy(col("eid"))

  // -------------------------------------------------------------- №38 incremental_export
  /** The reference's PRIMARY daily mode composed end-to-end: time-range
    * scan (Scan.setTimeRange) + latest-version-per-key (HBase maxVersions=1
    * semantics) + the full record pipeline. Shape at scale: the ts
    * predicate pushes into the parquet scan; latest-cell is ONE max_by
    * hash-aggregation (map-side partial, no window/sort); everything after
    * is the per-row projection pipeline — so an incremental export reads
    * only the time slice and shuffles once on the row key. */
  def incrementalExport(spark: SparkSession, dir: String): DataFrame = {
    val kv0 = KvSource.kv(spark, dir)
    val kv = kv0.filter(tsNsRange(kv0, T1, T2))
    val cols = kv.columns
    val latest = kv
      .groupBy(col("uid"))
      .agg(max_by(struct(cols.map(col): _*), struct(col("ms"), col("eid"))).as("r"))
      .select(col("r.*"))
    recordsFromKv(KvModel.withEnvelope(latest))
      .select(col("eid"), col("topic"), col("record"), col("manifest_line"))
      .orderBy(col("eid"))
  }

  val incrementalExportSql: String =
    s"""WITH ${KvSql.cte},
       |latest AS (
       |  SELECT * FROM kv WHERE ms >= $T1 AND ms < $T2
       |  QUALIFY row_number() OVER (PARTITION BY uid ORDER BY ms DESC, eid DESC) = 1),
       |records AS (
       |  SELECT latest.*, ${KvSql.expectedRecordSql} AS record,
       |    ${KvSql.manifestLineSql} AS manifest_line
       |  FROM latest WHERE valid)
       |SELECT eid, topic, record, manifest_line FROM records ORDER BY eid""".stripMargin

  val exportRecordsSql: String =
    s"""WITH ${KvSql.cte},
       |$recordsCte
       |SELECT eid, topic, record, manifest_line FROM records ORDER BY eid""".stripMargin

  // -------------------------------------------------------------- №141 key_rotation
  /** Data-key LIFECYCLE (reference: app/services/impl/HttpKeyService.kt:96-161 —
    * `decryptKey` with its per-(encryptedKey, kekId) cache — driven by
    * app/batch/DecryptionProcessor.kt:36-57): data keys rotate per topic on
    * a [[RotationDays]]-day boundary, every record carries (kek_id,
    * wrapped data key, per-record IV), and the read path must unwrap each
    * DISTINCT key once — never once per record (the reference's cache
    * exists precisely because the DKS round trip per record would dominate).
    *
    * Spark-first: the reference's synchronized mutable cache becomes a KEY
    * TABLE — `distinct(topic, gen)` over the batch IS the cache (one row
    * per live key however many records share it), the KMS/DKS unwrap is a
    * projection on that bounded table (topics × generations rows), and
    * records join the unwrapped keys back by (topic, gen) with the key
    * table broadcast — the record stream is never reshuffled
    * (plan-pinned) and unwrap cost is per-key, not per-record. Cache-hit
    * accounting falls out of the same bounded rollup: fetches = 1 per key
    * row, hits = n_records − 1.
    *
    * ≥2 generations are live in one export by construction (the corpus
    * spans ~30 days; rotation every [[RotationDays]]), the decrypt is
    * verified record-exact through the encrypt → key-join → decrypt round
    * trip (per-key payload md5 extrema equal the oracle's plaintext
    * recomputation), and the rotation boundary is spec-pinned: adjacent
    * generations derive DIFFERENT keys and a neighbor generation's key
    * garbles every record. Key material is the same [[KvModel]]-style
    * deterministic stub (SURVEY §6: the DKS service itself is environment
    * plumbing; the JOIN SHAPE is the operator). */
  val RotationDays = 7

  /** Generation data key for (topic, gen) — the stub unwrap. */
  private def rotatedKey(topic: Column, gen: Column): Column =
    unhex(md5(concat(lit("rdk|"), topic, lit("|"), gen.cast("string"))))

  def keyRotation(spark: SparkSession, dir: String): DataFrame = {
    val kv = KvSource.kv(spark, dir).filter(col("valid"))
    // WRITE path (models the stored cells): per-(topic, gen) data key,
    // per-record IV — this is what lands on disk in production
    val enc = kv
      .withColumn("gen", expr(s"(ms DIV 86400000) DIV $RotationDays"))
      .withColumn("iv", unhex(md5(concat(lit("riv|"), col("eid").cast("string")))))
      .withColumn("ct", graft.functions.AesCtrCrypt.aesCtr(
        encode(col("payload"), "UTF-8"), rotatedKey(col("topic"), col("gen")), col("iv")))
      .select(col("topic"), col("gen"), col("eid"), col("iv"), col("ct"))
    // READ path under test: key table = the cache; unwrap per KEY; join back
    val keyTable = enc.select(col("topic"), col("gen")).distinct()
      .withColumn("kek_id", concat(lit("cloudhsm:"), col("gen").cast("string")))
      .withColumn("dk", rotatedKey(col("topic"), col("gen")))
    val dec = enc.join(broadcast(keyTable), Seq("topic", "gen"))
      .withColumn("payload_dec",
        decode(graft.functions.AesCtrCrypt.aesCtr(col("ct"), col("dk"), col("iv")), "UTF-8"))
    dec.groupBy(col("topic"), col("gen"), col("kek_id"))
      .agg(count(lit(1)).as("n_records"),
        sum(length(col("payload_dec"))).as("payload_bytes"),
        min(md5(col("payload_dec"))).as("md5_min"),
        max(md5(col("payload_dec"))).as("md5_max"))
      .withColumn("dks_fetches", lit(1L))
      .withColumn("cache_hits", col("n_records") - 1)
      .orderBy(col("topic"), col("gen"))
  }

  /** Oracle from the PLAINTEXT side: if any record decrypted under the
    * wrong generation's key, its md5 perturbs the per-key extrema. */
  val keyRotationSql: String =
    s"""WITH ${KvSql.cte},
       |kr AS (
       |  SELECT topic, (ms // 86400000) // $RotationDays AS gen, payload
       |  FROM kv WHERE valid)
       |SELECT topic, gen, 'cloudhsm:' || CAST(gen AS VARCHAR) AS kek_id,
       |  count(*) AS n_records,
       |  CAST(sum(length(payload)) AS BIGINT) AS payload_bytes,
       |  min(md5(payload)) AS md5_min, max(md5(payload)) AS md5_max,
       |  CAST(1 AS BIGINT) AS dks_fetches, count(*) - 1 AS cache_hits
       |FROM kr GROUP BY topic, gen ORDER BY topic, gen""".stripMargin
}
