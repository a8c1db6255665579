package graft.kv

/** DuckDB-side mirror of [[KvModel]]: the `kv` CTE constructs the identical
  * rows, and the `expected*` fragments construct the EXPECTED OUTPUT of each
  * pipeline stage directly (the honest-oracle pattern of SURVEY §3/§5 —
  * Spark runs the generic operator, DuckDB builds what the operator must
  * produce; they can only agree if the operator is right).
  *
  * DuckDB dialect notes: 1-indexed lists, `//` integer division, RE2 regex,
  * strftime %g = milliseconds.
  *
  * FRAGMENT HYGIENE: these fragments get interpolated into stripMargin
  * templates — no line may BEGIN with optional-whitespace + `|` (a nested
  * stripMargin would eat it), so `||` always sits at line END.
  */
object KvSql {
  import KvModel.{ScanWidth, ChunkMaxBytes, D1, D2, A0, CD, AD, RD}

  def fmtP(msExpr: String): String =
    s"strftime(make_timestamp(($msExpr)*1000), '%Y-%m-%dT%H:%M:%S.%g+0000')"
  def fmtZ(msExpr: String): String =
    s"strftime(make_timestamp(($msExpr)*1000), '%Y-%m-%dT%H:%M:%S.%gZ')"

  private val e = "CAST(eid AS VARCHAR)"
  private val u = "CAST(uid AS VARCHAR)"

  /** The decrypted-payload construction, matching KvModel.payloadCol. */
  val payloadSql: String =
    "CASE\n" +
    s"  WHEN etype = 'error' THEN '{\"context\":{\"user\":\"user' || $u || '\"},\"auditType\":\"errorEvent\"}'\n" +
    s"  WHEN etype = 'signup' THEN '{\"_id\":\"eq' || $e || '\",\"attr\":\"value' || $e || '\"}'\n" +
    s"  WHEN etype = 'purchase' THEN '{\"_id\":\"pd' || $e || '\",\"note\":\"line1\\r\\nline2 for ' || $e || '\",\"amount\":\"' || CAST(ms % 100000 AS VARCHAR) || '\"}'\n" +
    "  ELSE\n" +
    s"    CASE WHEN eid % 3 = 0 THEN '{\"_id\":{\"y\":\"y' || $e || '\",\"x\":\"x' || $e || '\"},'\n" +
    s"         WHEN eid % 3 = 1 THEN '{\"_id\":\"id' || $e || '\",'\n" +
    "         ELSE '{' END ||\n" +
    s"    '\"type\":\"addressDeclaration\",\"d1\":\"' || ${fmtP(s"ms + ($D1)")} ||\n" +
    s"    '\",\"nested\":{\"d2\":\"' || ${fmtZ(s"ms + ($D2)")} ||\n" +
    s"    '\"},\"arr\":[\"' || ${fmtP(s"ms + ($A0)")} ||\n" +
    s"    '\",\"plain\"],\"createdDateTime\":\"' || ${fmtP(s"ms + ($CD)")} || '\"' ||\n" +
    s"    CASE WHEN eid % 5 IN (0,3) THEN ',\"_archivedDateTime\":\"' || ${fmtP(s"ms + ($AD)")} || '\"' ELSE '' END ||\n" +
    s"    CASE WHEN eid % 5 IN (0,1) THEN ',\"_removedDateTime\":\"' || ${fmtP(s"ms + ($RD)")} || '\"' ELSE '' END ||\n" +
    "    CASE WHEN eid % 2 = 0 THEN ',\"_lastModifiedDateTime\":\"' || lm_str || '\"' ELSE '' END ||\n" +
    "    '}'\n" +
    "END"

  /** Full kv WITH-prologue (chain of CTEs ending in `kv`). */
  val cte: String =
    "kv0 AS (\n" +
    "  SELECT event_id AS eid, user_id AS uid, event_type AS etype,\n" +
    "    epoch_ms(ts) AS ms,\n" +
    s"    ${fmtP("epoch_ms(ts)")} AS lm_str,\n" +
    "    '{\"id\":\"' || CAST(event_id AS VARCHAR) || '\"}' AS id_json,\n" +
    "    CASE WHEN event_type IN ('error','signup') THEN 'data'\n" +
    "         WHEN event_type = 'purchase' THEN 'penalties-and-deductions'\n" +
    "         ELSE 'database' || CAST(user_id % 3 AS VARCHAR) END AS db,\n" +
    "    CASE WHEN event_type = 'error' THEN 'businessAudit'\n" +
    "         WHEN event_type = 'signup' THEN 'equality'\n" +
    "         WHEN event_type = 'purchase' THEN 'sanction'\n" +
    "         ELSE 'collection' || CAST(event_id % 4 AS VARCHAR) END AS coll,\n" +
    "    CASE WHEN event_id % 13 = 0 THEN '' ELSE 'ODS_EXPORT' END AS outer_raw,\n" +
    "    CASE WHEN event_id % 2 = 0 THEN 'MONGO_UPDATE' ELSE 'MONGO_INSERT' END AS inner_type,\n" +
    "    event_id % 97 <> 0 AS valid\n" +
    "  FROM events),\n" +
    "kv AS (\n" +
    "  SELECT kv0.*,\n" +
    "    substr(md5(id_json), 1, 8) AS key_hash,\n" +
    "    (strpos('0123456789abcdef', substr(md5(id_json),1,1))-1)*16\n" +
    "      + strpos('0123456789abcdef', substr(md5(id_json),2,1)) - 1 AS key_byte,\n" +
    "    db || '.' || coll AS topic,\n" +
    "    CASE WHEN eid % 7 = 0 THEN '' ELSE db END AS db_msg,\n" +
    "    CASE WHEN eid % 11 = 0 THEN '' ELSE coll END AS coll_msg,\n" +
    "    CASE WHEN outer_raw = '' THEN 'TYPE_NOT_SET' ELSE outer_raw END AS outer_type,\n" +
    "    CASE WHEN eid % 97 <> 0 THEN to_base64(from_hex(md5('dk|' || CAST(eid AS VARCHAR)))) ELSE '' END AS eek_b64,\n" +
    "    to_base64(from_hex(md5('iv|' || CAST(eid AS VARCHAR)))) AS iv_b64,\n" +
    s"    $payloadSql AS payload\n" +
    "  FROM kv0)"

  // ------------------------------------------------------------------
  // Expected pipeline-stage outputs (constructed directly).
  // ------------------------------------------------------------------

  /** lastModified (Z form) after the validator's fallback chain, per family. */
  val lmZSql: String =
    "CASE\n" +
    "  WHEN etype IN ('error','signup','purchase') THEN '1980-01-01T00:00:00.000Z'\n" +
    s"  WHEN eid % 2 = 0 THEN ${fmtZ("ms")}\n" +
    s"  WHEN eid % 5 IN (0,1) THEN ${fmtZ(s"ms + ($RD)")}\n" +
    s"  ELSE ${fmtZ(s"ms + ($CD)")}\n" +
    "END"

  /** Expected FINAL record (validator → sanitise → equality wrap), i.e. the
    * mongo-backup-format line, with `$`→`d_` applied. */
  val expectedRecordSql: String =
    "CASE\n" +
    "  WHEN etype = 'error' THEN\n" +
    s"    '{\"user\":\"user' || $u || '\",\"AUDIT_EVENT\":\"errorEvent\"' ||\n" +
    s"    ',\"TIME_STAMP\":{\"d_date\":\"' || ${fmtZ("ms")} || '\"}' ||\n" +
    s"    ',\"TIME_STAMP_ORIG\":{\"d_date\":\"' || ${fmtZ("ms")} || '\"}' ||\n" +
    "    ',\"_lastModifiedDateTime\":{\"d_date\":\"1980-01-01T00:00:00.000Z\"}}'\n" +
    "  WHEN etype = 'signup' THEN\n" +
    s"    '{\"message\":{\"attr\":\"value' || $e || '\"' ||\n" +
    "    ',\"_lastModifiedDateTime\":{\"d_date\":\"1980-01-01T00:00:00.000Z\"}' ||\n" +
    s"    ',\"_id\":{\"d_oid\":\"eq' || $e || '\"}' ||\n" +
    "    ',\"@type\":\"' || inner_type || '\"}}'\n" +
    "  WHEN etype = 'purchase' THEN\n" +
    s"    '{\"note\":\"line1line2 for ' || $e || '\",\"amount\":\"' || CAST(ms % 100000 AS VARCHAR) || '\"' ||\n" +
    "    ',\"_lastModifiedDateTime\":{\"d_date\":\"1980-01-01T00:00:00.000Z\"}' ||\n" +
    s"    ',\"_id\":{\"d_oid\":\"pd' || $e || '\"}}'\n" +
    "  ELSE\n" +
    s"    CASE WHEN eid % 3 = 0 THEN '{\"_id\":{\"y\":\"y' || $e || '\",\"x\":\"x' || $e || '\"},' ELSE '{' END ||\n" +
    "    '\"type\":\"addressDeclaration\"' ||\n" +
    s"    ',\"d1\":{\"d_date\":\"' || ${fmtZ(s"ms + ($D1)")} || '\"}' ||\n" +
    s"    ',\"nested\":{\"d2\":{\"d_date\":\"' || ${fmtZ(s"ms + ($D2)")} || '\"}}' ||\n" +
    s"    ',\"arr\":[{\"d_date\":\"' || ${fmtZ(s"ms + ($A0)")} || '\"},\"plain\"]' ||\n" +
    s"    ',\"createdDateTime\":{\"d_date\":\"' || ${fmtZ(s"ms + ($CD)")} || '\"}' ||\n" +
    s"    CASE WHEN eid % 5 = 3 THEN ',\"_removedDateTime\":{\"d_date\":\"' || ${fmtZ(s"ms + ($AD)")} || '\"}' ELSE '' END ||\n" +
    s"    CASE WHEN eid % 5 IN (0,1) THEN ',\"_removedDateTime\":{\"d_date\":\"' || ${fmtZ(s"ms + ($RD)")} || '\"}' ELSE '' END ||\n" +
    s"    ',\"_lastModifiedDateTime\":{\"d_date\":\"' || $lmZSql || '\"}' ||\n" +
    s"    CASE WHEN eid % 3 = 1 THEN ',\"_id\":{\"d_oid\":\"id' || $e || '\"}' ELSE '' END ||\n" +
    "    '}'\n" +
    "END"

  /** Expected VALIDATOR-stage record (before sanitise: still `$date`/`$oid`,
    * `_archivedDateTime` not yet renamed; kept for eid%5=3, dropped when
    * `_removed` coexists). Only used for the click/view family. */
  val validatedRecordSql: String = expectedRecordSql
    .replace("d_date", "$date").replace("d_oid", "$oid")
    .replace(
      """CASE WHEN eid % 5 = 3 THEN ',"_removedDateTime":{"$date":"'""",
      """CASE WHEN eid % 5 = 3 THEN ',"_archivedDateTime":{"$date":"'""")

  /** Manifest id + original id per family (reference Validator/IdUtility). */
  val manifestIdSql: String =
    "CASE\n" +
    s"""  WHEN etype = 'error' THEN '{"$$oid":"' || $e || '"}'\n""" +
    s"""  WHEN etype = 'signup' THEN '{"$$oid":"eq' || $e || '"}'\n""" +
    s"""  WHEN etype = 'purchase' THEN '{"$$oid":"pd' || $e || '"}'\n""" +
    s"""  WHEN eid % 3 = 0 THEN '{"x":"x' || $e || '","y":"y' || $e || '"}'\n""" +
    s"""  WHEN eid % 3 = 1 THEN '{"$$oid":"id' || $e || '"}'\n""" +
    s"""  ELSE '{"$$oid":"' || $e || '"}'\n""" +
    "END"

  val originalIdSql: String =
    "CASE\n" +
    s"  WHEN etype = 'error' THEN $e\n" +
    s"  WHEN etype = 'signup' THEN 'eq' || $e\n" +
    s"  WHEN etype = 'purchase' THEN 'pd' || $e\n" +
    s"""  WHEN eid % 3 = 0 THEN '{"x":"x' || $e || '","y":"y' || $e || '"}'\n""" +
    s"  WHEN eid % 3 = 1 THEN 'id' || $e\n" +
    s"  ELSE $e\n" +
    "END"

  /** commons-text escapeCsv semantics (quote iff contains , " CR LF). */
  def csvEsc(x: String): String =
    s"""CASE WHEN regexp_matches($x, '[",\\n\\r]') THEN '"' || replace($x, '"', '""') || '"' ELSE $x END"""

  /** Resolved db/collection incl. topic-regex fallback
    * (reference: app/utils/TextUtils.kt:8, HBaseResultProcessor). */
  val dbResolvedSql: String =
    """CASE WHEN db_msg = '' THEN regexp_extract(topic, '^(?:\w+\.)?([-\w]+)\.([-\w]+)$', 1) ELSE db_msg END"""
  val collResolvedSql: String =
    """CASE WHEN coll_msg = '' THEN regexp_extract(topic, '^(?:\w+\.)?([-\w]+)\.([-\w]+)$', 2) ELSE coll_msg END"""

  /** Full manifest CSV line (reference: app/domain/DomainClasses.kt:95-103 —
    * note the originalId/innerType column order). */
  val manifestLineSql: String =
    Seq(
      csvEsc(s"($manifestIdSql)"),
      csvEsc("CAST(ms AS VARCHAR)"),
      csvEsc(s"($dbResolvedSql)"),
      csvEsc(s"($collResolvedSql)"),
      "'EXPORT'",
      csvEsc("outer_type"),
      csvEsc(s"($originalIdSql)"),
      csvEsc("inner_type")
    ).mkString(" || '|' || ")

  /** Unsigned-normalized partition bounds (mirrors ExportOps.partitionStart
    * / partitionStop). */
  def pstartSql(keyByte: String): String =
    s"CASE WHEN $keyByte >= 128 THEN (($keyByte - 128) // $ScanWidth) * $ScanWidth + 128 " +
      s"ELSE ($keyByte // $ScanWidth) * $ScanWidth END"

  def pstopSql(keyByte: String): String =
    s"CASE WHEN $keyByte >= 128 THEN least((($keyByte - 128) // $ScanWidth) * $ScanWidth + 128 + $ScanWidth, 256) " +
      s"ELSE least(($keyByte // $ScanWidth) * $ScanWidth + $ScanWidth, 128) END"

  /** Keyspace partition label for a leading key byte — unsigned-normalized
    * ranges (see ExportOps.partitionStart scaladoc for the reference
    * mapping). Width must divide 128.
    */
  def partitionLabelSql(keyByte: String): String = {
    val w = ScanWidth
    s"CASE WHEN $keyByte >= 128 THEN " +
      s"'p' || CAST((($keyByte - 128) // $w) * $w + 128 AS VARCHAR) || '-' || CAST(least((($keyByte - 128) // $w) * $w + 128 + $w, 256) AS VARCHAR) " +
      s"ELSE 'p' || CAST(($keyByte // $w) * $w AS VARCHAR) || '-' || CAST(least(($keyByte // $w) * $w + $w, 128) AS VARCHAR) END"
  }
}
