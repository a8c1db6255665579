package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._

/** №141 key_rotation: the data-key lifecycle contracts (reference
  * HttpKeyService decryptKey cache + DecryptionProcessor) — rotation
  * boundary, wrong-key failure, cache accounting, and the per-key (not
  * per-record) unwrap plan shape. */
class KeyRotationSpec extends SparkSpec {
  import spark.implicits._

  private lazy val rows = ExportQueries.keyRotation(spark, sf)
    .as[(String, Long, String, Long, Long, String, String, Long, Long)].collect().toSeq

  test("≥2 key generations are live in one export; rotation follows the day boundary") {
    val gens = rows.map(_._2).distinct.sorted
    assert(gens.size >= 2, s"only generations $gens — rotation never happened in this corpus")
    // at least one topic spans a rotation boundary
    val multiGenTopics = rows.groupBy(_._1).filter(_._2.map(_._2).distinct.size >= 2)
    assert(multiGenTopics.nonEmpty, "no topic lives across a rotation boundary")
    // the generation arithmetic is the documented day-boundary formula
    val kv = graft.sources.KvSource.kv(spark, sf).filter(col("valid"))
      .select($"topic", expr(s"(ms DIV 86400000) DIV ${ExportQueries.RotationDays}").as("gen"))
      .groupBy($"topic", $"gen").count()
      .as[(String, Long, Long)].collect()
      .map { case (t, g, c) => ((t, g), c) }.toMap
    assert(rows.map(r => ((r._1, r._2), r._4)).toMap == kv, "per-(topic, gen) counts drift from the kv frame")
  }

  test("decrypt round trip is record-exact; the NEIGHBOR generation's key garbles every record") {
    // reconstruct one (topic, gen) group's records by hand and check that
    // decrypting with gen+1's key never yields the original payload
    val kv = graft.sources.KvSource.kv(spark, sf).filter(col("valid"))
      .select($"topic", expr(s"(ms DIV 86400000) DIV ${ExportQueries.RotationDays}").as("gen"),
        $"eid", $"payload")
      .as[(String, Long, Long, String)].collect().toSeq
    assert(kv.nonEmpty)
    def key(topic: String, gen: Long): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"rdk|$topic|$gen".getBytes("UTF-8"))
    }
    def iv(eid: Long): Array[Byte] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      md.digest(s"riv|$eid".getBytes("UTF-8"))
    }
    kv.take(200).foreach { case (topic, gen, eid, payload) =>
      val ct = graft.functions.AesCtrCrypt.crypt(payload.getBytes("UTF-8"), key(topic, gen), iv(eid))
      val good = new String(graft.functions.AesCtrCrypt.crypt(ct, key(topic, gen), iv(eid)), "UTF-8")
      val bad = new String(graft.functions.AesCtrCrypt.crypt(ct, key(topic, gen + 1), iv(eid)), "UTF-8")
      assert(good == payload, s"round trip broke for eid=$eid")
      assert(bad != payload, s"neighbor generation's key decrypted eid=$eid — rotation is vacuous")
    }
    // adjacent generations genuinely derive different key material
    val t = kv.head._1
    assert(!key(t, 0).sameElements(key(t, 1)))
  }

  test("cache accounting: one fetch per distinct live key, hits = records − keys") {
    val nKeys = rows.size.toLong
    val nRecords = rows.map(_._4).sum
    assert(rows.forall(_._8 == 1L), "dks_fetches must be 1 per key row")
    assert(rows.map(_._9).sum == nRecords - nKeys, "cache hits must be records − distinct keys")
    // the cache does real work at this corpus: far fewer keys than records
    assert(nKeys * 10 <= nRecords, s"key table ($nKeys) not much smaller than records ($nRecords)")
  }

  test("plan: key table broadcast onto the record stream — records never reshuffled before decrypt") {
    val df = ExportQueries.keyRotation(spark, sf)
    val plan = ExportQueriesPlanHelper.exec(df)
    val bhj = plan.collect { case j: BroadcastHashJoinExec => j }
    assert(bhj.nonEmpty, s"key join is not a broadcast join:\n$plan")
    // stream side (the record/ciphertext scan) must contain no exchange:
    // the unwrap-join adds zero shuffles to the export read path
    bhj.foreach { j =>
      // stream side = the child that is NOT the broadcast exchange
      val stream = j.children.filterNot(c =>
        c.isInstanceOf[org.apache.spark.sql.execution.exchange.BroadcastExchangeExec] ||
          c.find(_.isInstanceOf[org.apache.spark.sql.execution.exchange.BroadcastExchangeExec]).isDefined)
      assert(stream.nonEmpty, s"could not identify the record stream side:\n$plan")
      stream.foreach { s =>
        val shuffles = s.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.isEmpty, s"record stream reshuffled below the key join:\n$plan")
      }
    }
  }
}
