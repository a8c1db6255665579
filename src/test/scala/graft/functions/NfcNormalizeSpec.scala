package graft.functions

import graft.SparkSpec
import graft.GraftExtensions
import org.apache.spark.sql.functions._

/** Unicode semantics of the native NFC expression (the corpus is ASCII, so
  * the driver oracle exercises only the identity path -- these escapes pin
  * the actual normalization; composed and decomposed forms look identical
  * in source, hence explicit \u escapes everywhere). */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfc(s: String): String =
    Seq(s).toDF("t").select(NfcNormalize.nfcNormalize($"t")).head.getString(0)

  test("decomposed sequences compose (NFC)") {
    // e + COMBINING ACUTE (U+0301) -> e-acute (U+00E9)
    assert(nfc("cafe\u0301") == "caf\u00e9")
    // A + COMBINING RING (U+030A) -> A-ring (U+00C5); o + DIAERESIS -> o-uml
    assert(nfc("A\u030angstro\u0308m") == "\u00c5ngstr\u00f6m")
  }

  test("already-NFC text is returned unchanged (fast path)") {
    assert(nfc("caf\u00e9") == "caf\u00e9")
    assert(nfc("plain ascii 123") == "plain ascii 123")
  }

  test("null propagates; SQL registration works") {
    val row = Seq((Option.empty[String], "e\u0301")).toDF("a", "b")
      .select(NfcNormalize.nfcNormalize($"a"), NfcNormalize.nfcNormalize($"b")).head
    assert(row.isNullAt(0) && row.getString(1) == "\u00e9")
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT nfc_normalize('cafe\u0301')").head.getString(0) == "caf\u00e9")
  }
}
