package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The adversarial-dedup guards (SURVEY §4 / SCALING.md adversarial
  * section): conf'd LSH bucket cap ([[HashDedup.BucketCapConfKey]]) and
  * PPJoin prefix-gram df cap ([[TextQueries.GramCapConfKey]]), both
  * default-OFF (every driver oracle runs uncapped). On a handcrafted
  * hot-bucket corpus the caps must drop EXACTLY the template cluster —
  * nothing more (small genuine clusters survive verbatim), nothing less
  * (the quadratic pair set is gone) — and the accounting must equal the
  * closed form. */
class BucketCapSpec extends SparkSpec {
  import spark.implicits._

  private val Hot = 40  // template-cluster size: > the cap under test
  private val Cap = 32

  /** 40 byte-identical template docs (one hot bucket per band / hot
    * grams at df=40) + one genuine 2-doc duplicate cluster. */
  private def tok = {
    val template = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split(' ').toSeq
    val genuine = "kilo lima mike november oscar papa quebec romeo".split(' ').toSeq
    val rows = (0 until Hot).map(i => (i.toLong, template)) ++
      Seq((1000L, genuine), (1001L, genuine))
    rows.toDF("doc_id", "ws")
  }

  private def withCaps[A](bucket: Int, gram: Int)(body: => A): A = {
    spark.conf.set(HashDedup.BucketCapConfKey, bucket.toString)
    spark.conf.set(TextQueries.GramCapConfKey, gram.toString)
    try body finally {
      spark.conf.unset(HashDedup.BucketCapConfKey)
      spark.conf.unset(TextQueries.GramCapConfKey)
    }
  }

  test("band-join cap drops exactly the oversized buckets; off by default; accounting closed-form") {
    val t = tok.persist()
    try {
      def pairs(): Set[(Long, Long, Long)] = HashDedup.dedupMinhashFrom(t)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      // default (conf unset): the quadratic template pair set is found —
      // C(40,2) identical-signature pairs at all 4 bands + the genuine pair
      val full = pairs()
      assert(full.size == Hot * (Hot - 1) / 2 + 1, s"expected full pair set, got ${full.size}")
      assert(full((1000L, 1001L, HashDedup.Bands.toLong)), "genuine cluster missing uncapped")
      assert(full.forall(_._3 == HashDedup.Bands.toLong), "identical docs must match in every band")
      // capped: ONLY the genuine 2-doc cluster survives — the hot bucket
      // is excluded from pair generation in every band
      val capped = withCaps(bucket = Cap, gram = 0)(pairs())
      assert(capped == Set((1000L, 1001L, HashDedup.Bands.toLong)),
        s"cap must drop exactly the template cluster, got $capped")
      // a cap ABOVE the hot-bucket size changes nothing
      assert(withCaps(bucket = Hot, gram = 0)(pairs()) == full, "over-sized cap must be a no-op")
      // accounting: per band, 1 bucket of 40 rows = 780 avoided pairs
      val acct = HashDedup.cappedBucketStats(
          HashDedup.bandRowsOf(HashDedup.minhashSigFrom(t), HashDedup.Bands), Cap)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(acct.length == HashDedup.Bands, s"every band must report its dropped bucket: ${acct.toSeq}")
      acct.foreach { case (b, nb, rows, avoided) =>
        assert(nb == 1L && rows == Hot.toLong && avoided == Hot.toLong * (Hot - 1) / 2,
          s"band $b accounting off: buckets=$nb rows=$rows avoided=$avoided")
      }
    } finally { t.unpersist(); () }
  }

  test("simhash band cap: identical-fingerprint hot bucket dropped, genuine cluster survives") {
    val t = tok.persist()
    try {
      def pairs(): Set[(Long, Long)] = HashDedup.dedupSimhashFrom(t)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      // identical docs → identical fingerprints → hamming 0 in every band
      val full = pairs()
      assert(full.size == Hot * (Hot - 1) / 2 + 1, s"expected full verified set, got ${full.size}")
      val capped = withCaps(bucket = Cap, gram = 0)(pairs())
      assert(capped == Set((1000L, 1001L)),
        s"simhash cap must drop exactly the template cluster, got $capped")
      assert(withCaps(bucket = Hot, gram = 0)(pairs()) == full, "over-sized cap must be a no-op")
    } finally { t.unpersist(); () }
  }

  test("prefix-gram cap: stop-grams leave candidate generation, genuine cluster verified unchanged") {
    val t = tok.persist()
    try {
      def pairs(): Set[(Long, Long)] = TextQueries.dedupNgramJaccardFrom(t)
        .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
      val full = pairs()
      assert(full.size == Hot * (Hot - 1) / 2 + 1, s"expected full verified set, got ${full.size}")
      val capped = withCaps(bucket = 0, gram = Cap)(pairs())
      assert(capped == Set((1000L, 1001L)),
        s"gram cap must drop exactly the template cluster, got $capped")
      // the surviving pair's verification side is untouched: full shingle
      // sets, exact jaccard 1.0 for identical docs
      val row = withCaps(bucket = 0, gram = Cap)(
        TextQueries.dedupNgramJaccardFrom(t).filter($"doc_a" === 1000L).head())
      assert(row.getDouble(5) == 1.0, s"verification drifted under the cap: $row")
    } finally { t.unpersist(); () }
  }
}
