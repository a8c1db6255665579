package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic checks for the curation operators (№43-45) beyond the DuckDB
  * hash oracle: known-dup behavior, redaction completeness, invariants. */
class CurationSpec extends SparkSpec {

  test("line_dedup: exact-copy twins lose every line; near-copies keep at most the tail") {
    val out = CurationQueries.lineDedup(spark, sf).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    val exactTwins = out.filter(_.getLong(0) >= 2000000)
    assert(exactTwins.nonEmpty)
    exactTwins.foreach { r =>
      val base = byId(r.getLong(0) - 2000000)
      // doc and its byte-identical copy: every line has df>=2 in BOTH rows
      assert(r.getString(3) == "", s"copy ${r.getLong(0)} kept text '${r.getString(3)}'")
      assert(base.getString(3) == "", s"base ${base.getLong(0)} kept text")
      assert(r.getLong(2) == r.getLong(1), "copy must remove all lines")
    }
    val nearTwins = out.filter(_.getLong(0) >= 1000000).filter(_.getLong(0) < 2000000)
    assert(nearTwins.nonEmpty)
    nearTwins.foreach { r =>
      // appended token only perturbs the final fixed-width line
      assert(r.getLong(2) >= r.getLong(1) - 1,
        s"near-copy ${r.getLong(0)} removed only ${r.getLong(2)} of ${r.getLong(1)} lines")
    }
  }

  test("line_dedup: auto and shuffle join modes return identical output") {
    // the DedupScaleSpec pattern: the scale-safe configuration (shuffle
    // equi-join on the line key, bounded per-task build side) must return
    // row-identical output to the proof-size mode the driver oracle checks
    val auto = CurationQueries.lineDedupWith(spark, sf, "auto")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    graft.CacheRegistry.releaseAll(spark)
    val shuffled = CurationQueries.lineDedupWith(spark, sf, "shuffle")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))).toSet
    graft.CacheRegistry.releaseAll(spark)
    assert(auto.nonEmpty)
    assert(shuffled == auto, "join mode changed line_dedup output")
    intercept[IllegalArgumentException] {
      CurationQueries.lineDedupWith(spark, sf, "bogus")
    }
  }

  test("pii_redact: no residual matches, injection rule drives the counts") {
    val out = CurationQueries.piiRedact(spark, sf)
    val residual = out.filter(
      col("redacted").rlike(CurationQueries.EmailRe) ||
        col("redacted").rlike(CurationQueries.PhoneRe)).count()
    assert(residual == 0, s"$residual docs still contain PII after redaction")
    val wrong = out.filter(
      (col("doc_id") % 3 =!= 2 && col("n_emails") < 1) ||
        (col("doc_id") % 3 === 2 && col("n_emails") =!= 0) ||
        (col("doc_id") % 4 =!= 3 && col("n_phones") < 1) ||
        (col("doc_id") % 4 === 3 && col("n_phones") =!= 0)).count()
    assert(wrong == 0, s"$wrong docs disagree with the deterministic injection rule")
    assert(out.count() == graft.Tables(spark, sf).documents.count())
  }

  test("dedup_pipeline: drops every exact twin, conserves the corpus, keeps canonical ids") {
    val out = CurationQueries.dedupPipeline(spark, sf).collect()
    graft.CacheRegistry.releaseAll(spark)
    val ids = out.map(_.getLong(0)).toSet
    // exact copies (base id + 2000000) always cluster with their base →
    // never survive; their base (the cluster min) always does
    assert(ids.forall(_ < 2000000), "an exact-copy twin survived the pipeline")
    val corpusN = TextQueries.dupCorpus(spark, sf).count()
    // every corpus doc is accounted for exactly once across the clusters
    assert(out.map(_.getLong(1)).sum == corpusN, "cluster membership does not partition the corpus")
    // keepers of multi-doc clusters exist, and singletons dominate
    assert(out.exists(_.getLong(1) >= 2))
    assert(out.count(_.getLong(1) == 1) > out.length / 2)
  }

  test("dedup_substring: exact twins are fully covered; join modes agree") {
    val out = CurationQueries.dedupSubstring(spark, sf).collect()
    graft.CacheRegistry.releaseAll(spark)
    val byId = out.map(r => r.getLong(0) -> r).toMap
    val exactTwins = out.filter(_.getLong(0) >= 2000000)
    assert(exactTwins.nonEmpty)
    exactTwins.foreach { r =>
      // a byte-identical copy duplicates every window in copy AND base
      assert(r.getDouble(3) == 1.0, s"copy ${r.getLong(0)} dup_ratio ${r.getDouble(3)}")
      assert(byId(r.getLong(0) - 2000000).getDouble(3) == 1.0, "base of exact twin not fully covered")
    }
    out.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.000001)
    }
    val shuffled = CurationQueries.dedupSubstringWith(spark, sf, "shuffle")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    graft.CacheRegistry.releaseAll(spark)
    assert(shuffled == out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet,
      "join mode changed dedup_substring output")
  }

  test("gopher_filter: verdict matches rules, reason follows first-failure priority") {
    val out = CurationQueries.gopherFilter(spark, sf).collect()
    assert(out.nonEmpty)
    val reasons = Set("word_count", "mean_word_length", "stopwords", "dup_words", "top_2gram", "kept")
    out.foreach { r =>
      val (nTok, mwl, nStop, dupr, top2) =
        (r.getInt(1), r.getDouble(2), r.getInt(3), r.getDouble(4), r.getDouble(5))
      val keep = r.getBoolean(6); val reason = r.getString(7)
      assert(reasons(reason), s"unknown reason $reason")
      assert(keep == (reason == "kept"), s"doc ${r.getLong(0)}: keep=$keep reason=$reason")
      // first-failure priority: a later reason implies every earlier rule passed
      // (ratios are rounded 6dp in the output; thresholds sit far from any
      // rounding boundary on this corpus)
      if (reason == "word_count")
        assert(nTok < CurationQueries.GfMinWords || nTok > CurationQueries.GfMaxWords)
      if (reason != "word_count" && reason != "mean_word_length") {
        assert(nTok >= CurationQueries.GfMinWords && nTok <= CurationQueries.GfMaxWords)
        assert(mwl >= CurationQueries.GfMinMeanWord && mwl <= CurationQueries.GfMaxMeanWord)
      }
      if (reason == "dup_words") assert(nStop >= CurationQueries.GfMinStops)
      if (reason == "top_2gram") assert(dupr <= CurationQueries.GfMaxDupWord + 1e-6)
      if (reason == "kept") assert(top2 <= CurationQueries.GfMaxTop2 + 1e-6)
    }
    // the gate must filter, not rubber-stamp or annihilate
    val kept = out.count(_.getBoolean(6))
    assert(kept > 0 && kept < out.length, s"degenerate gopher gate: $kept/${out.length}")
    // multiple distinct rules fire on the proof corpus
    assert(out.map(_.getString(7)).distinct.length >= 3, "rule diversity too low")
  }

  test("doc_repetition: gram accounting and ratio invariants hold per doc") {
    val bad = CurationQueries.docRepetition(spark, sf)
      .filter(
        col("n_2grams") =!= col("n_tok") - 1 || // sum of 2-gram counts = n-1
          col("top_cnt") < 1 || col("top_cnt") > col("n_2grams") ||
          col("top2_ratio") < 0 || col("top2_ratio") > 1.000001 ||
          col("dup_word_ratio") < 0 || col("dup_word_ratio") > 1.000001)
      .count()
    assert(bad == 0)
  }

  test("url_dedup: every 4-variant surface group collapses to one canonical row") {
    val rows = CurationQueries.urlDedup(spark, sf).collect()
    // 500 docs / 4 variants per canonical target
    assert(rows.length == 125, s"${rows.length} groups")
    rows.foreach { r =>
      val url = r.getString(0)
      // canonical form: lowercase bare host, no port, no fragment, no
      // tracking params, params sorted, no trailing slash
      assert(url.startsWith("https://example.com/articles/item"), url)
      assert(url.endsWith("?a=1&b=2"), s"params not sorted/cleaned: $url")
      assert(!url.contains("utm_") && !url.contains("#") && !url.contains(":443"), url)
      assert(r.getLong(2) == 4L, s"group size ${r.getLong(2)} for $url")
      // keeper = minimum doc id = the %4==0 member of the group
      assert(r.getLong(1) % 4 == 0, s"keeper ${r.getLong(1)} not the v0 variant")
      val item = url.stripPrefix("https://example.com/articles/item").takeWhile(_.isDigit).toLong
      assert(r.getLong(1) == item * 4, s"keeper ${r.getLong(1)} != ${item * 4}")
    }
  }

  test("crawl_pipeline: composition equals its standalone stages") {
    import spark.implicits._
    val crawl = CurationQueries.crawlPipeline(spark, sf).collect()
    // stage 1: survivors are exactly url_dedup's keepers
    val keepers = CurationQueries.urlDedup(spark, sf)
      .select("keeper").as[Long].collect().toSet
    assert(crawl.map(_.getLong(0)).toSet == keepers, "survivor set != url_dedup keepers")
    // stage 2+3: because extraction provably recovers the ws-normalized
    // body (html_extract's md5 proof) and the gopher gate tokenizes on
    // whitespace, the composed verdict must equal the standalone gate run
    // directly on the raw documents
    val gopher = CurationQueries.gopherFilter(spark, sf)
      .select("doc_id", "n_tok", "keep", "reason")
      .as[(Long, Int, Boolean, String)].collect()
      .map(r => r._1 -> r).toMap
    crawl.foreach { r =>
      val d = r.getLong(0)
      gopher.get(d) match {
        case Some((_, nTok, keep, reason)) =>
          assert(r.getInt(3) == nTok && r.getBoolean(4) == keep && r.getString(5) == reason,
            s"doc $d: composed verdict (${r.getInt(3)}, ${r.getBoolean(4)}, ${r.getString(5)}) != standalone ($nTok, $keep, $reason)")
        case None => // <2 tokens: dropped by the gate, composed must mark word_count
          assert(!r.getBoolean(4) && r.getString(5) == "word_count", s"doc $d: short-doc fallback wrong")
      }
    }
  }

  test("html_extract recovers exactly the whitespace-normalized article body") {
    import spark.implicits._
    val out = CurationQueries.htmlExtract(spark, sf)
      .select($"doc_id", $"extract_md5", $"raw_len", $"extract_len")
    // ground truth: extraction must strip EVERY byte of page frame (title,
    // script, nav, aside, footer, all tags) and return the original text,
    // whitespace-collapsed — nothing more, nothing less
    val expect = graft.Tables(spark, sf).documents
      .select($"doc_id",
        md5(trim(regexp_replace($"text", "\\s+", " "))).as("want_md5"))
    val joined = out.join(expect, "doc_id").cache()
    try {
      assert(joined.count() > 0)
      val bad = joined.filter($"extract_md5" =!= $"want_md5").count()
      assert(bad == 0, s"$bad docs where extraction did not recover the body")
      // the frame is actually non-trivial: raw page is strictly longer
      assert(joined.filter($"raw_len" <= $"extract_len").count() == 0)
    } finally { joined.unpersist(); () }
  }
}
