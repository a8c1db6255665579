package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

/** Unit coverage for the validator expression against the reference
  * semantics (Validator/DateWrapper/IdUtility) — the corners the corpus
  * doesn't exercise. */
class JsonRecordSpec extends SparkSpec {

  private def run(payload: String, rowKey: String = """{"id":"77"}"""): (String, String, String) = {
    val r = JsonRecordOps.validate(UTF8String.fromString(payload), UTF8String.fromString(rowKey))
    (r.getUTF8String(0).toString, r.getUTF8String(1).toString, r.getUTF8String(2).toString)
  }

  test("scalar _id → {\"$oid\"} moved to end; manifest + original ids") {
    val (rec, mid, oid) = run("""{"_id":"abc","a":"1"}""")
    assert(rec == """{"a":"1","_lastModifiedDateTime":{"$date":"1980-01-01T00:00:00.000Z"},"_id":{"$oid":"abc"}}""")
    assert(mid == """{"$oid":"abc"}""")
    assert(oid == "abc")
  }

  test("object _id stays in place; manifest id is key-sorted") {
    val (rec, mid, oid) = run("""{"_id":{"z":"1","a":"2"},"b":"x"}""")
    assert(rec.startsWith("""{"_id":{"z":"1","a":"2"},"b":"x""""))
    assert(mid == """{"a":"2","z":"1"}""")
    assert(oid == mid)
  }

  test("missing _id → row-key reverse engineering (hash prefix already stripped)") {
    val (_, mid, oid) = run("""{"a":"1"}""", """{"id":"999"}""")
    assert(mid == """{"$oid":"999"}""")
    assert(oid == "999")
  }

  test("missing _id, non-scalar row key → sorted json both") {
    val (_, mid, oid) = run("""{"a":"1"}""", """{"declarationId":"9","citizenId":"3"}""")
    assert(mid == """{"citizenId":"3","declarationId":"9"}""")
    assert(oid == mid)
  }

  test("+0000 date strings wrap to {\"$date\": Z} in place, recursively") {
    val (rec, _, _) = run(
      """{"top":"2020-05-05T10:10:10.123+0000","nest":{"d":"2020-01-02T03:04:05.678+0000"},"arr":["2019-12-31T23:59:59.999+0000","x"]}""")
    assert(rec ==
      """{"top":{"$date":"2020-05-05T10:10:10.123Z"},"nest":{"d":{"$date":"2020-01-02T03:04:05.678Z"}},"arr":[{"$date":"2019-12-31T23:59:59.999Z"},"x"],"_lastModifiedDateTime":{"$date":"1980-01-01T00:00:00.000Z"}}""")
  }

  test("non-UTC offsets are converted to the same instant in Z form") {
    val (rec, _, _) = run("""{"d":"2020-06-01T12:00:00.000+0130"}""")
    assert(rec.contains(""""d":{"$date":"2020-06-01T10:30:00.000Z"}"""))
  }

  test("existing {\"$date\"} objects are reformatted, not double-wrapped") {
    val (rec, _, _) = run("""{"d":{"$date":"2020-05-05T10:10:10.123+0000"}}""")
    assert(rec.contains(""""d":{"$date":"2020-05-05T10:10:10.123Z"}"""))
  }

  test("non-date strings and non-matching shapes are untouched") {
    val (rec, _, _) = run("""{"a":"2020-05-05","b":"hello","c":"2020-05-05T10:10:10+0000"}""")
    // no millis → doesn't match either regex → untouched
    assert(rec.contains(""""a":"2020-05-05""""))
    assert(rec.contains(""""c":"2020-05-05T10:10:10+0000""""))
  }

  test("_lastModifiedDateTime fallback chain: removed > created > epoch") {
    val (r1, _, _) = run("""{"_removedDateTime":"2020-01-01T00:00:00.000+0000","createdDateTime":"2019-01-01T00:00:00.000+0000"}""")
    assert(r1.contains(""""_lastModifiedDateTime":{"$date":"2020-01-01T00:00:00.000Z"}"""))
    val (r2, _, _) = run("""{"createdDateTime":"2019-01-01T00:00:00.000+0000"}""")
    assert(r2.contains(""""_lastModifiedDateTime":{"$date":"2019-01-01T00:00:00.000Z"}"""))
    val (r3, _, _) = run("""{"a":"1"}""")
    assert(r3.contains(""""_lastModifiedDateTime":{"$date":"1980-01-01T00:00:00.000Z"}"""))
  }

  test("lastModified readable from an existing {\"$date\"} object") {
    val (rec, _, _) = run("""{"_lastModifiedDateTime":{"$date":"2021-07-07T07:07:07.007Z"},"a":"1"}""")
    assert(rec.endsWith(""""_lastModifiedDateTime":{"$date":"2021-07-07T07:07:07.007Z"}}"""))
  }

  test("_archivedDateTime dropped only when _removedDateTime present") {
    val (both, _, _) = run("""{"_archivedDateTime":"2020-01-01T00:00:00.000+0000","_removedDateTime":"2020-02-02T00:00:00.000+0000"}""")
    assert(!both.contains("_archivedDateTime"))
    assert(both.contains("_removedDateTime"))
    val (only, _, _) = run("""{"_archivedDateTime":"2020-01-01T00:00:00.000+0000"}""")
    assert(only.contains("_archivedDateTime"))
  }

  test("negative-offset lastModified converts to UTC (reference: Should_Change_Negative_Offset_Date_To_UTC)") {
    val (rec, _, _) = run("""{"_lastModifiedDateTime":"2020-06-01T12:00:00.000-0500","a":"1"}""")
    assert(rec.endsWith(""""_lastModifiedDateTime":{"$date":"2020-06-01T17:00:00.000Z"}}"""))
  }

  test("negative-offset strings ELSEWHERE in the tree stay unwrapped (DateWrapper regex is +HHMM only)") {
    val (rec, _, _) = run("""{"d":"2020-06-01T12:00:00.000-0500"}""")
    assert(rec.contains(""""d":"2020-06-01T12:00:00.000-0500""""))
  }

  test("reference IdUtility vectors (IdUtilityTest.kt)") {
    val (_, m1, o1) = run("""{"a":"1"}""", """{ "citizenId": "123455" }""")
    assert(o1 == """{"citizenId":"123455"}""" && m1 == o1)
    val (_, m2, o2) = run("""{"a":"1"}""", """{ "z": "12345", "a": "54321" }""")
    assert(o2 == """{"a":"54321","z":"12345"}""" && m2 == o2)
    val (_, m3, o3) = run("""{"a":"1"}""", """{ "id": "123455" }""")
    assert(o3 == "123455" && m3 == """{"$oid":"123455"}""")
  }

  test("malformed payloads REJECT the record (null), never throw") {
    import org.apache.spark.unsafe.types.UTF8String
    def raw(p: String, k: String = """{"id":"7"}""") =
      JsonRecordOps.validate(UTF8String.fromString(p), UTF8String.fromString(k))
    assert(raw("not json at all") == null)
    assert(raw("""["array","payload"]""") == null)
    assert(raw(""""scalar"""") == null)
    assert(raw("""{"a":"1"}""", "") == null)          // broken row key
    assert(raw("""{"a":"1"}""", "not-json") == null)  // broken row key
  }

  test("calendar-invalid shape-valid dates roll over leniently (reference SimpleDateFormat)") {
    val (rec, _, _) = run("""{"d":"2024-01-32T10:00:00.000+0000"}""")
    assert(rec.contains(""""d":{"$date":"2024-02-01T10:00:00.000Z"}"""))
  }

  test("lastModified always lands at the END of the object") {
    val (rec, _, _) = run("""{"_lastModifiedDateTime":"2020-03-03T03:03:03.333+0000","z":"1","a":"2"}""")
    assert(rec == """{"z":"1","a":"2","_lastModifiedDateTime":{"$date":"2020-03-03T03:03:03.333Z"}}""")
  }
}
