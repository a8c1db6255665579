package graft.operators

import graft.SparkSpec
import graft.kv.KvModel
import org.apache.spark.sql.functions._

class ExportOpsSpec extends SparkSpec {
  import spark.implicits._

  test("sanitise: reference replacement chain incl. lookbehind and \\u0000") {
    val df = Seq(
      // \r \n escape sequences removed only for sanitised collections
      ("""{"note":"a\r\nb"}""", "penalties-and-deductions", "sanction"),
      ("""{"note":"a\r\nb"}""", "database1", "collection2"),
      // (?<!\\)\\[r|n]: escaped backslash before r is protected
      ("""{"note":"keep\\rme"}""", "core", "healthAndDisabilityDeclaration"),
      ("""{"$oid":"x","money":"$5","_archivedDateTime":"d","_archivedFlag":"y"}""", "db", "c"),
      ("{\"nul\":\"a\\u0000b\"}", "db", "c")
    ).toDF("rec", "db", "coll")
      .withColumn("out", ExportOps.sanitise(col("rec"), col("db"), col("coll")))
    val out = df.select("out").as[String].collect()
    assert(out(0) == """{"note":"ab"}""")                       // stripped (sanction)
    assert(out(1) == """{"note":"a\r\nb"}""")                   // untouched (other coll)
    assert(out(2) == """{"note":"keep\\rme"}""")                // lookbehind protects \\r
    assert(out(3) == """{"d_oid":"x","money":"d_5","_removedDateTime":"d","_removedFlag":"y"}""")
    assert(out(4) == """{"nul":"ab"}""")                        // literal backslash-u0000 removed
  }

  test("csvEscape matches commons-text escapeCsv semantics") {
    val df = Seq("plain", """has"quote""", "has,comma", "has\nnewline").toDF("v")
      .withColumn("e", ExportOps.csvEscape(col("v")))
    val out = df.select("e").as[String].collect()
    assert(out(0) == "plain")
    assert(out(1) == "\"has\"\"quote\"")
    assert(out(2) == "\"has,comma\"")
    assert(out(3) == "\"has\nnewline\"")
  }

  test("partition bounds cover [0,256) with width " + KvModel.ScanWidth) {
    val df = Seq(0, 31, 32, 127, 128, 159, 255).toDF("key_byte")
      .select(col("key_byte"),
        ExportOps.partitionStart(col("key_byte")).as("start"),
        ExportOps.partitionStop(col("key_byte")).as("stop"),
        ExportOps.partitionLabel(col("key_byte")).as("label"))
    val rows = df.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(rows.contains((0, 0, 32, "p0-32")))
    assert(rows.contains((31, 0, 32, "p0-32")))
    assert(rows.contains((32, 32, 64, "p32-64")))
    assert(rows.contains((127, 96, 128, "p96-128")))
    assert(rows.contains((128, 128, 160, "p128-160")))
    assert(rows.contains((255, 224, 256, "p224-256")))
    rows.foreach { case (kb, start, stop, _) => assert(start <= kb && kb < stop) }
  }

  test("envelope extract: topic fallback + TYPE_NOT_SET normalization") {
    val env =
      """{"traceId":"t","@type":"","message":{"@type":"MONGO_INSERT","_id":{"id":"1"},"db":"","collection":"",""" +
        """"_lastModifiedDateTime":"2020-01-01T00:00:00.000+0000","encryption":{"encryptedEncryptionKey":"eek",""" +
        """"keyEncryptionKeyId":"kek","initialisationVector":"iv"},"dbObject":"ct"},"timestamp":"x"}"""
    val df = ExportOps.extractEnvelope(
      Seq((env, "some-db.some-coll")).toDF("envelope", "topic"), col("envelope"), col("topic"))
    val r = df.select("x_outer", "x_inner", "r_db", "r_coll", "x_eek", "x_id").head
    assert(r.getString(0) == "TYPE_NOT_SET")
    assert(r.getString(1) == "MONGO_INSERT")
    assert(r.getString(2) == "some-db")
    assert(r.getString(3) == "some-coll")
    assert(r.getString(4) == "eek")
    assert(r.getString(5) == """{"id":"1"}""")
  }

  test("unparseable envelope yields ok=false instead of aborting the task") {
    val df = ExportOps.extractEnvelope(
      Seq(("{not json at all", "db.coll"), ("", "db.coll")).toDF("envelope", "topic"),
      col("envelope"), col("topic"))
    // "{not json" throws in Jackson → caught → reject row; "" parses to a
    // MissingNode → empty fields → mandatory check rejects. Either way:
    // ok=false and the task survives.
    val rows = df.select("x_ok").collect()
    rows.foreach(r => assert(!r.getBoolean(0)))
  }

  test("equality wrap appends @type inside a message envelope") {
    val df = Seq(("""{"a":"1"}""", "TYPE_X")).toDF("rec", "t")
      .withColumn("w", ExportOps.equalityWrap(col("rec"), col("t")))
    assert(df.select("w").as[String].head == """{"message":{"a":"1","@type":"TYPE_X"}}""")
  }

  test("printable key renders 4 hash bytes + raw remainder") {
    val df = Seq(("0a1b2c3d", """{"id":"9"}""")).toDF("h", "id")
      .withColumn("p", ExportOps.printableKey(col("h"), col("id")))
    assert(df.select("p").as[String].head == """\x0a\x1b\x2c\x3d{"id":"9"}""")
  }

  test("strict blocked-topic mode aborts the job; clean corpus passes") {
    val dirty = Seq("db.ok", KvModel.BlockedTopics.head, "db.ok2").toDF("topic")
    val ex = intercept[Exception] {
      ExportOps.failOnBlockedTopics(dirty).select(length(col("topic"))).collect()
    }
    // raise_error surfaces wrapped in the task failure chain
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("Blocked topic: " + KvModel.BlockedTopics.head)))

    val clean = Seq("db.ok", "db.ok2").toDF("topic")
    val out = ExportOps.failOnBlockedTopics(clean).select("topic").as[String].collect()
    assert(out.sorted.toSeq == Seq("db.ok", "db.ok2")) // pass-through unchanged
  }
}
