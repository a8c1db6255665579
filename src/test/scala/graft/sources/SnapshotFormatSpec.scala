package graft.sources

import graft.SparkSpec
import com.fasterxml.jackson.databind.ObjectMapper

/** The written snapshot must be consumable as mongo-backup-format input:
  * one JSON object per line, `$`-keys sanitised to `d_`, no raw control
  * characters, manifest lines pipe-splittable with CSV quoting intact.
  */
class SnapshotFormatSpec extends SparkSpec {

  test("snapshot lines parse as JSON and manifests split into 8 columns") {
    val root = s"${System.getProperty("java.io.tmpdir")}/graft_snapshot_fmt"
    val records = graft.queries.ExportQueries.exportRecords(spark, sf)
    JsonlSnapshotSink.write(records, root)

    val mapper = new ObjectMapper()
    val lines = spark.read.text(s"$root/data").collect().map(_.getString(0))
    assert(lines.length == 989)
    lines.foreach { l =>
      val node = mapper.readTree(l) // throws on malformed JSON
      assert(node.isObject)
      // no raw control characters in the line (JSONL contract)
      assert(!l.exists(_ < ' '))
      // sanitisation applied: no `$`-prefixed keys survive
      assert(!l.contains("\"$"))
    }
    val manifests = spark.read.text(s"$root/manifests").collect().map(_.getString(0))
    manifests.foreach { m =>
      // pipe-split honoring CSV quoting: count unquoted pipes == 7
      var inQ = false
      var pipes = 0
      m.foreach {
        case '"' => inQ = !inQ
        case '|' if !inQ => pipes += 1
        case _ => ()
      }
      assert(pipes == 7, s"bad manifest line: $m")
    }
  }
}
