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
    ExportQueries.exportRecords(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Export core (№1-20)
    "kv_scan" -> (ExportQueries.kvScan _),
    "keyspace_partition" -> (ExportQueries.keyspacePartition _),
    "time_range_scan" -> (ExportQueries.timeRangeScan _),
    "latest_cell" -> (ExportQueries.latestCell _),
    "envelope_extract" -> (ExportQueries.envelopeExtract _),
    "topic_table_map" -> (ExportQueries.topicTableMap _),
    "blocked_topics" -> (ExportQueries.blockedTopics _),
    "validate_mandatory" -> (ExportQueries.validateMandatory _),
    "aes_roundtrip" -> (ExportQueries.aesRoundtrip _),
    "business_audit" -> (ExportQueries.businessAudit _),
    "id_normalize" -> (ExportQueries.idNormalize _),
    "date_wrap" -> (ExportQueries.dateWrap _),
    "sanitise" -> (ExportQueries.sanitiseQ _),
    "equality_wrap" -> (ExportQueries.equalityWrapQ _),
    "manifest_gen" -> (ExportQueries.manifestGen _),
    "chunk_batch" -> (ExportQueries.chunkBatch _),
    "snapshot_name" -> (ExportQueries.snapshotNameQ _),
    "export_status" -> (ExportQueries.exportStatus _),
    "skip_audit" -> (ExportQueries.skipAudit _),
    "export_completion" -> (ExportQueries.exportCompletion _),
    "export_completion_failed" -> (ExportQueries.exportCompletionFailed _),
    "printable_key" -> (ExportQueries.printableKeyQ _),
    "export_records" -> (ExportQueries.exportRecords _),
    "incremental_export" -> (ExportQueries.incrementalExport _),
    // Analytics heads (№33-35)
    "q1_agg" -> (Analytics.q1Agg _),
    "q3_join" -> (Analytics.q3Join _),
    "sessionize" -> (Analytics.sessionize _),
    // Similarity / vectors (№25-27)
    "dedup_embedding" -> (VectorQueries.dedupEmbedding _),
    "knn_brute" -> (VectorQueries.knnBrute _),
    "knn_ivf" -> (VectorQueries.knnIvf _),
    "knn_graph" -> (VectorQueries.knnGraph _),
    "knn_recall" -> (VectorQueries.knnRecall _),
    // Hash dedup (№22-23)
    "dedup_minhash" -> (HashDedup.dedupMinhash _),
    "dedup_simhash" -> (HashDedup.dedupSimhash _),
    "dedup_recall" -> (HashDedup.dedupRecall _),
    // Multimodal (№32)
    "multimodal_ingest" -> (MultimodalQueries.multimodalIngest _),
    "multimodal_transform" -> (MultimodalQueries.multimodalTransform _),
    // Sinks / streaming (№18, №36)
    "jsonl_snapshot" -> (graft.sources.JsonlSnapshotSink.snapshotQuery _),
    "bucketed_join" -> (graft.sources.Bucketing.bucketedJoin _),
    "stream_export" -> (graft.streaming.StreamExport.streamExport _),
    "stream_sessionize" -> (graft.streaming.StatefulSessionize.streamSessionize _),
    "stream_dedup" -> (graft.streaming.StreamDedup.streamDedup _),
    "stream_join" -> (graft.streaming.StreamJoin.streamJoin _),
    // Text / dedup (№21,24,28-31)
    "token_count" -> (TextQueries.tokenCount _),
    "lang_id" -> (TextQueries.langId _),
    "quality_score" -> (TextQueries.qualityScore _),
    "doc_fingerprint" -> (TextQueries.docFingerprint _),
    "dedup_exact" -> (TextQueries.dedupExact _),
    "dedup_ngram_jaccard" -> (TextQueries.dedupNgramJaccard _),
    "dedup_cluster" -> (TextQueries.dedupCluster _),
    "text_normalize" -> (TextQueries.textNormalize _),
    "stratified_sample" -> (TextQueries.stratifiedSample _),
    "token_histogram" -> (TextQueries.tokenHistogram _),
    "contamination_check" -> (TextQueries.contaminationCheck _),
    "corpus_curate" -> (TextQueries.corpusCurate _),
    // Curation (№46-50)
    "line_dedup" -> (CurationQueries.lineDedup _),
    "pii_redact" -> (CurationQueries.piiRedact _),
    "doc_repetition" -> (CurationQueries.docRepetition _),
    "dedup_pipeline" -> (CurationQueries.dedupPipeline _),
    "dedup_substring" -> (CurationQueries.dedupSubstring _),
    "gopher_filter" -> (CurationQueries.gopherFilter _),
    // Pipeline accounting (№52-55) + semantic dedup (№56)
    "quality_classifier" -> (PipelineQueries.qualityClassifier _),
    "domain_mix" -> (PipelineQueries.domainMix _),
    "mix_sample" -> (PipelineQueries.mixSample _),
    "corpus_stats" -> (PipelineQueries.corpusStats _),
    "vocab_coverage" -> (PipelineQueries.vocabCoverage _),
    "sequence_pack" -> (PipelineQueries.sequencePack _),
    "sequence_manifest" -> (PipelineQueries.sequenceManifest _),
    "semantic_dedup" -> (VectorQueries.semanticDedup _),
    // Composed LLM-side flagship (№58)
    "pretrain_pipeline" -> (PipelineQueries.pretrainPipeline _),
  )

  def oracleSql: Map[String, String] = Map(
    "kv_scan" -> ExportQueries.kvScanSql,
    "keyspace_partition" -> ExportQueries.keyspacePartitionSql,
    "time_range_scan" -> ExportQueries.timeRangeScanSql,
    "latest_cell" -> ExportQueries.latestCellSql,
    "envelope_extract" -> ExportQueries.envelopeExtractSql,
    "topic_table_map" -> ExportQueries.topicTableMapSql,
    "blocked_topics" -> ExportQueries.blockedTopicsSql,
    "validate_mandatory" -> ExportQueries.validateMandatorySql,
    "aes_roundtrip" -> ExportQueries.aesRoundtripSql,
    "business_audit" -> ExportQueries.businessAuditSql,
    "id_normalize" -> ExportQueries.idNormalizeSql,
    "date_wrap" -> ExportQueries.dateWrapSql,
    "sanitise" -> ExportQueries.sanitiseSql,
    "equality_wrap" -> ExportQueries.equalityWrapSql,
    "manifest_gen" -> ExportQueries.manifestGenSql,
    "chunk_batch" -> ExportQueries.chunkBatchSql,
    "snapshot_name" -> ExportQueries.snapshotNameSql,
    "export_status" -> ExportQueries.exportStatusSql,
    "skip_audit" -> ExportQueries.skipAuditSql,
    "export_completion" -> ExportQueries.exportCompletionSql,
    "export_completion_failed" -> ExportQueries.exportCompletionFailedSql,
    "printable_key" -> ExportQueries.printableKeySql,
    "export_records" -> ExportQueries.exportRecordsSql,
    "incremental_export" -> ExportQueries.incrementalExportSql,
    "q1_agg" -> Analytics.q1Sql,
    "q3_join" -> Analytics.q3Sql,
    "sessionize" -> Analytics.sessionizeSql,
    "dedup_embedding" -> VectorQueries.dedupEmbeddingSql,
    "knn_brute" -> VectorQueries.knnBruteSql,
    "knn_ivf" -> VectorQueries.knnIvfSql,
    "knn_graph" -> VectorQueries.knnGraphSql,
    "knn_recall" -> VectorQueries.knnRecallSql,
    "dedup_minhash" -> HashDedup.dedupMinhashSql,
    "dedup_simhash" -> HashDedup.dedupSimhashSql,
    "dedup_recall" -> HashDedup.dedupRecallSql,
    "multimodal_ingest" -> MultimodalQueries.multimodalIngestSql,
    "multimodal_transform" -> MultimodalQueries.multimodalTransformSql,
    "stream_export" -> graft.streaming.StreamExport.streamExportSql,
    "stream_sessionize" -> graft.streaming.StatefulSessionize.streamSessionizeSql,
    "stream_dedup" -> graft.streaming.StreamDedup.streamDedupSql,
    "stream_join" -> graft.streaming.StreamJoin.streamJoinSql,
    // jsonl_snapshot: full sink round trip — the query WRITES the chunked
    // AES-CTR-encrypted objects, then decrypts them back; the oracle
    // reconstructs the expected (object_key, record) pairs relationally
    "jsonl_snapshot" -> ExportQueries.jsonlSnapshotSql,
    "bucketed_join" -> graft.sources.Bucketing.bucketedJoinSql,
    "token_count" -> TextQueries.tokenCountSql,
    "lang_id" -> TextQueries.langIdSql,
    "quality_score" -> TextQueries.qualityScoreSql,
    "doc_fingerprint" -> TextQueries.docFingerprintSql,
    "dedup_exact" -> TextQueries.dedupExactSql,
    "dedup_ngram_jaccard" -> TextQueries.dedupNgramJaccardSql,
    "dedup_cluster" -> TextQueries.dedupClusterSql,
    "text_normalize" -> TextQueries.textNormalizeSql,
    "stratified_sample" -> TextQueries.stratifiedSampleSql,
    "token_histogram" -> TextQueries.tokenHistogramSql,
    "contamination_check" -> TextQueries.contaminationCheckSql,
    "corpus_curate" -> TextQueries.corpusCurateSql,
    "line_dedup" -> CurationQueries.lineDedupSql,
    "pii_redact" -> CurationQueries.piiRedactSql,
    "doc_repetition" -> CurationQueries.docRepetitionSql,
    "dedup_pipeline" -> CurationQueries.dedupPipelineSql,
    "dedup_substring" -> CurationQueries.dedupSubstringSql,
    "gopher_filter" -> CurationQueries.gopherFilterSql,
    "quality_classifier" -> PipelineQueries.qualityClassifierSql,
    "domain_mix" -> PipelineQueries.domainMixSql,
    "mix_sample" -> PipelineQueries.mixSampleSql,
    "corpus_stats" -> PipelineQueries.corpusStatsSql,
    "vocab_coverage" -> PipelineQueries.vocabCoverageSql,
    "sequence_pack" -> PipelineQueries.sequencePackSql,
    "sequence_manifest" -> PipelineQueries.sequenceManifestSql,
    "semantic_dedup" -> VectorQueries.semanticDedupSql,
    "pretrain_pipeline" -> PipelineQueries.pretrainPipelineSql,
  )
}
