package graft.queries

import graft.Tables
import graft.functions.VectorOps._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity-search + embedding-dedup operators (SURVEY §2 №25-27).
  *
  * Oracle mirror fragments live inline; DuckDB computes the same
  * double-cast sequential dot products (list_transform over an index range)
  * and the same 6dp rounding, so thresholds/ranks agree exactly.
  */
object VectorQueries {

  /** DuckDB dot product over DOUBLE-cast elements, sequential list_sum. */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE)))"
  private[graft] def cos6Sql(a: String, b: String): String =
    s"round(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})), 6)"

  val NearDupTau = 0.99
  val K = 5          // top-k neighbours
  val NQueries = 10  // query vectors: vec_id < 10
  val Probe = 2      // IVF cells probed

  /** IVF centroid count — FIXED, independent of corpus size. Centroids are
    * k-means-refined over a deterministic hash-ordered sample of the corpus
    * (md5 of the id — an unbiased order), so at any scale the centroid
    * broadcast is C vectors and cell assignment is O(n·C), never O(n·n/k).
    * Production tuning: C grows with the corpus (cell-size-constant C ∝ n
    * keeps the probe-join candidate count O(n·P·cellsize) — LINEAR; a
    * frozen C makes it O(n²·P/C), which the ScaleStress harness exposes
    * empirically). Settable per session via [[CentroidsConfKey]]; 64 is
    * proof-sized for the sf corpora and the oracle default. */
  val Centroids = 64

  /** Session override for the IVF centroid count (the C ∝ n dial the
    * scaling harness turns; the driver gate never sets it, so oracles see
    * [[Centroids]]). The k-means sample scales to ≥ 4·C alongside. */
  val CentroidsConfKey = "spark.graft.knn.centroids"

  private def centroidsOf(spark: SparkSession): Int =
    spark.conf.get(CentroidsConfKey, Centroids.toString).toInt

  /** k-means sample size — CONSTANT at any corpus scale (the sample is the
    * hash-ordered first M, collected to the driver: ~M·dim floats). */
  val SampleM = 1024

  /** Lloyd iterations over the sample ([[refinedCentroids]]). */
  val Lloyd = 2

  /** Spark round() semantics (BigDecimal.valueOf → HALF_UP) — the rounding
    * the cross-engine cosine path is already proven on. */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue

  /** Driver-side mirror of [[graft.functions.CosineSim]] + round 6dp:
    * sequential left folds in array order, float→double widening —
    * bit-identical to the engine expression and the DuckDB oracle.
    *
    * Zero-norm edge (an all-zero RESIDUAL when a vector coincides with
    * its №166 centroid): DuckDB's division by zero yields NULL, which
    * sorts LAST under `ORDER BY cos DESC` — a zero vector never wins an
    * assignment, and an all-undefined row ties down to the lowest c_id.
    * Java's 0/0 is NaN (which Spark would sort FIRST — the opposite), so
    * both this mirror and №166's engine-side score map the undefined
    * cosine to a −2 sentinel: below every real cosine ∈ [−1, 1], ties to
    * the lowest id — exactly the DuckDB NULL semantics, no fork. */
  private[queries] val UndefCos = -2.0

  private def cos6Local(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    val r = dot / (math.sqrt(na) * math.sqrt(nb))
    if (r.isNaN) UndefCos else round6(r)
  }

  /** k-means-refined IVF centroids: hash-ordered sample of [[SampleM]]
    * (constant-size TakeOrdered + driver collect at ANY corpus scale),
    * [[Lloyd]] Lloyd iterations driver-side, centroid components rounded to
    * 6dp and narrowed to float — every arithmetic step (sequential-fold
    * cosine, sample-order component sums, HALF_UP rounding) is chosen so
    * the DuckDB oracle reproduces the centroids EXACTLY
    * ([[refinedCentSql]]), keeping the knn oracles value-checkable.
    * Returns a local (c_id, c_emb) frame — a constant broadcast, cheaper
    * than the previous in-plan sample (no re-scan per consumer). Empty
    * clusters drop (both engines agree: group-by semantics). */
  private[graft] def refinedCentroids(spark: SparkSession, corpus: DataFrame,
                                        k: Int = -1): DataFrame = {
    import spark.implicits._
    // k = -1: resolve from the session conf (scaling harness); callers that
    // pass an explicit k (the oracle-matched queries) are untouched
    val kk = if (k > 0) k else centroidsOf(spark)
    lloydRefine(hashSample(corpus, math.max(SampleM, 4 * kk)), kk).toSeq.toDF("c_id", "c_emb")
  }

  /** The constant-size hash-ordered sample ([[SampleM]] full vectors to
    * the driver) — shared by [[refinedCentroids]] and the PQ codebook
    * training, which collects it ONCE and slices subvectors locally (the
    * sample order depends only on vec_id, so a subspace frame's sample IS
    * the slice of the full-vector sample). */
  private def hashSample(corpus: DataFrame, m: Int = SampleM): Array[Array[Float]] = corpus
    .orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
    .limit(m).select(col("emb"))
    .collect().map(_.getSeq[Float](0).toArray)

  /** [[Lloyd]] iterations over a driver-side sample (see
    * [[refinedCentroids]] for the exactness contract). */
  private def lloydRefine(sample: Array[Array[Float]], k: Int): Array[(Long, Array[Float])] =
    lloydIter(sample, sample.take(k).zipWithIndex.map { case (e, i) => ((i + 1).toLong, e) })

  /** WARM-start refinement: the same Lloyd iterations seeded from an
    * EXISTING model instead of the sample prefix — cell IDENTITY is
    * preserved (a cell's centroid moves with the data instead of being
    * renamed), which is what makes №175's delta rewrite meaningful:
    * under a cold re-train every vector "changes cell" by renaming
    * alone. Production retrains warm for exactly this reason. */
  private[queries] def refinedCentroidsWarm(spark: SparkSession, corpus: DataFrame,
                                            seed: DataFrame): DataFrame = {
    import spark.implicits._
    val seedArr = seed.select(col("c_id"), col("c_emb")).collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    // sample size PINNED to SampleM — the warm oracle CTE always samples
    // QUALIFY rk <= SampleM, so a max(SampleM, 4·k) here would silently
    // fork driver and oracle the moment a seed model exceeds SampleM/4
    // centroids; the guard makes the dial's headroom explicit instead
    require(seedArr.length * 4 <= SampleM,
      s"warm seed has ${seedArr.length} centroids; SampleM=$SampleM gives <4 sample vectors per cell")
    lloydIter(hashSample(corpus, SampleM), seedArr)
      .toSeq.toDF("c_id", "c_emb")
  }

  private def lloydIter(sample: Array[Array[Float]],
                        seed: Array[(Long, Array[Float])]): Array[(Long, Array[Float])] = {
    var cents: Array[(Long, Array[Float])] = seed
    for (_ <- 1 to Lloyd) {
      val assigned: Array[(Long, Array[Float])] = sample.map { e =>
        // cents is cid-ascending; strict > keeps the LOWEST cid on rounded
        // ties — the oracle's row_number (cos DESC, cid ASC)
        var bestCid = 0L; var bestCos = Double.NegativeInfinity
        cents.foreach { case (cid, cemb) =>
          val c = cos6Local(e, cemb)
          if (c > bestCos) { bestCos = c; bestCid = cid }
        }
        (bestCid, e)
      }
      // groupBy preserves encounter (= sample rank) order per key → the
      // component sums fold in the same order as the oracle's list(ORDER BY rk)
      cents = assigned.groupBy(_._1).toArray.sortBy(_._1).map { case (cid, members) =>
        val n = members.length
        val cemb = Array.tabulate(members(0)._2.length) { i =>
          var s = 0.0
          members.foreach(m => s += m._2(i).toDouble)
          round6(s / n + 1e-9).toFloat
        }
        (cid, cemb)
      }
    }
    cents
  }

  /** The oracle's mirror of [[refinedCentroids]]: CTE chain `{p}samp →
    * {p}c0 → ({p}a_i assign, {p}g_i group, {p}c_i update)×Lloyd → {p}cent`
    * over source relation `src(vec_id, emb)`. */
  private[graft] def refinedCentSql(src: String, p: String, k: Int = Centroids,
                             warmFrom: String = null): String = {
    def assign(it: Int): String = {
      val centSrc = if (it == 1) s"${p}c0" else s"${p}c${it - 1}"
      s"""${p}a$it AS (
         |  SELECT rk, emb, cid FROM (
         |    SELECT s.rk, s.emb, c.cid,
         |      row_number() OVER (PARTITION BY s.rk ORDER BY ${cos6Sql("s.emb", "c.cemb")} DESC, c.cid) AS r
         |    FROM ${p}samp s, $centSrc c) x WHERE r = 1)""".stripMargin
    }
    def update(it: Int): String =
      s"""${p}g$it AS (
         |  SELECT cid, list(emb ORDER BY rk) AS embs, count(*) AS n FROM ${p}a$it GROUP BY cid),
         |${p}c$it AS (
         |  SELECT cid, list_transform(range(1, len(embs[1]) + 1), i ->
         |    CAST(round(list_sum(list_transform(embs, e -> CAST(e[i] AS DOUBLE))) / n + 0.000000001, 6) AS FLOAT)) AS cemb
         |  FROM ${p}g$it)""".stripMargin
    val iters = (1 to Lloyd).map(it => assign(it) + ",\n" + update(it)).mkString(",\n")
    // warm start ([[refinedCentroidsWarm]]): c0 = the existing model's
    // (c_id, c_emb) instead of the sample prefix — identity-preserving
    val c0 =
      if (warmFrom == null) s"${p}c0 AS (SELECT rk AS cid, emb AS cemb FROM ${p}samp WHERE rk <= $k)"
      else s"${p}c0 AS (SELECT c_id AS cid, c_emb AS cemb FROM $warmFrom)"
    s"""${p}samp AS (
       |  SELECT emb, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
       |  FROM $src QUALIFY rk <= $SampleM),
       |$c0,
       |$iters,
       |${p}cent AS (SELECT cid AS c_id, cemb AS c_emb FROM ${p}c$Lloyd)""".stripMargin
  }

  /** LSH sign-bucket width (bits → 2^bits buckets) for embedding dedup.
    * Within-bucket candidate verification is all-pairs, O(n²/2^bits): 8 bits
    * is proof-sized for the sf corpora (and required by the injected-dup
    * recall contract below — copies perturb dim 60, buckets hash dims 1-8,
    * so recall is exact). At 100 TB set ≥16-24 bits — recall then depends
    * on near-dup pairs agreeing on every bucketed sign, which holds as
    * τ→1 (a τ=0.99 pair flips a given sign bit only if that dim is within
    * noise of 0); for lower τ route candidates through IVF cells instead. */
  val BucketBits = 8

  // ---------------------------------------------------------------- №25 dedup_embedding
  /** Corpus with injected near-dups: every 20th vector re-inserted
    * (id+1000000) with dim-60 perturbed by +0.01. Dims 1..8 are the LSH
    * sign-bucket bits, so injected copies always share their original's
    * bucket — the bucketed candidate join has full recall at τ=0.99 (no
    * natural pair comes near it; verified max natural cosine ≈ 0.51).
    * The oracle deliberately verifies with a NAIVE all-pairs scan.
    */
  def dedupEmbedding(spark: SparkSession, dir: String): DataFrame =
    dedupEmbeddingWith(spark, dir, BucketBits)

  /** [[dedupEmbedding]] with an explicit bucket width — the candidate-set
    * size knob (buckets 2^bits, within-bucket verify O(n²/2^bits)). The
    * driver query runs the proof size [[BucketBits]]; DedupScaleSpec proves
    * the ≥16-bit scale configuration finds the IDENTICAL pair set on the
    * injected-dup corpus (perturbation is outside every bucketed dim). */
  def dedupEmbeddingWith(spark: SparkSession, dir: String, bits: Int): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val copies = v.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"),
        concat(slice(col("emb"), 1, 59),
          array(element_at(col("emb"), 60) + lit(0.01f)),
          slice(col("emb"), 61, 4)).as("emb"))
    val corpus = graft.CacheRegistry.track(v.unionAll(copies)
      .withColumn("bucket", signBucket(col("emb"), bits))
      .persist())
    corpus.as("a").join(corpus.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        cosine6(col("a.emb"), col("b.emb")).as("cos"))
      .filter(col("cos") >= NearDupTau)
      .orderBy(col("id_a"), col("id_b"))
  }

  val dedupEmbeddingSql: String = {
    val perturbed = "emb[1:59] || [CAST(emb[60] AS FLOAT) + CAST(0.01 AS FLOAT)] || emb[61:64]"
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |corpus AS (
       |  SELECT vec_id, emb FROM v
       |  UNION ALL
       |  SELECT vec_id + 1000000, $perturbed FROM v WHERE vec_id % 20 = 0)
       |SELECT a.vec_id AS id_a, b.vec_id AS id_b, ${cos6Sql("a.emb", "b.emb")} AS cos
       |FROM corpus a JOIN corpus b ON a.vec_id < b.vec_id
       |WHERE ${cos6Sql("a.emb", "b.emb")} >= $NearDupTau
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Ranked grouped top-k: the custom whole-operator path
    * ([[graft.plans.GroupedTopK]] — logical node + pruning rule + two-phase
    * physical plan) by default; `spark.graft.nativeTopK=false` falls back
    * to the TopKByScore aggregate + posexplode chain. Row-identical either
    * way (GroupedTopKSpec), same scale shape (≤k rows per partition into
    * one hash exchange on the group). */
  private[queries] def topKRanked(df: DataFrame, group: String, score: String, id: String, k: Int): DataFrame = {
    if (df.sparkSession.conf.get("spark.graft.nativeTopK", "true").toBoolean)
      graft.plans.GroupedTopK.rankedTopK(df, group, score, id, k)
    else
      df.groupBy(col(group))
        .agg(graft.functions.TopKByScore.topK(col(score), col(id), k).as("top"))
        .select(col(group), posexplode(col("top")).as(Seq("pos", "e")))
        .select(col(group), col("e.id").as(id), col("e.score").as(score), (col("pos") + 1).as("rank"))
  }

  // ---------------------------------------------------------------- №26 knn_brute
  /** Brute-force top-k cosine: queries (tiny) are broadcast; the corpus is
    * scanned ONCE; ranking via the native TopKByScore bounded-heap
    * aggregate — each scan partition contributes at most k rows per query
    * to the shuffle (map-side partial top-k), where a window row_number
    * would shuffle and sort every scored corpus row.
    */
  def knnBrute(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val scored = corpus.join(broadcast(queries))
      .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
    topKRanked(scored, "q_id", "cos", "vec_id", K)
      .orderBy(col("q_id"), col("rank"))
  }

  val knnBruteSql: String =
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id, emb FROM v WHERE vec_id >= $NQueries),
       |scored AS (
       |  SELECT q_id, vec_id, ${cos6Sql("emb", "q_emb")} AS cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY ${cos6Sql("emb", "q_emb")} DESC, vec_id) AS rank
       |  FROM c, q)
       |SELECT q_id, vec_id, cos, rank FROM scored WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------- №27 knn_ivf
  /** Session conf exposing the IVF probe width as the QUERY parameter it
    * is internally ([[knnIvfWith]]); default = [[Probe]]. */
  val ProbeConfKey = "spark.graft.knn.probe"

  /** IVF: FIXED-C deterministic centroids (hash-ordered sample of the
    * corpus — constant-size broadcast at any corpus size), cells = nearest
    * centroid per corpus vector, probe = top-P cells per query, search only
    * probed cells. Scale path: the cell assignment is one broadcast-join
    * pass at O(n·C); probing prunes the search to ~P/C of the corpus. The
    * sample itself is a TakeOrderedAndProject (per-partition top-C, no full
    * sort shuffle).
    *
    * Probe width comes from `spark.graft.knn.probe` (default [[Probe]]) —
    * the recall/cost dial a user turns WITHOUT changing the plan shape.
    * Recall contract at the default: [[knnRecall]] MEASURES recall@[[K]]
    * per probe width on the live corpus (sf0.01 curve: 0.18 / 0.60 / 0.94
    * at probe 2 / 8 / 32 of [[Centroids]]=64 cells); QuerySpecs pins the default's
    * floor and that the conf actually moves the dial (probe=[[Centroids]] ≡
    * exhaustive ⇒ recall 1.0). On an isotropic random corpus low-probe
    * recall is intrinsically poor — production picks the probe from the
    * measured curve, which is exactly what this parameter feeds. */
  def knnIvf(spark: SparkSession, dir: String): DataFrame = {
    val probe = spark.conf.get(ProbeConfKey, Probe.toString).toInt
    require(probe >= 1, s"$ProbeConfKey must be >= 1, got $probe")
    knnIvfWith(spark, dir, probe)
  }

  /** [[knnIvf]] with an explicit probe width — the recall/cost knob
    * ([[knnRecall]] measures the curve: more probed cells → more of the
    * corpus scanned → higher recall, linearly more work). */
  def knnIvfWith(spark: SparkSession, dir: String, probe: Int): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val centroids = refinedCentroids(spark, corpus)
    ivfSearch(cellsOf(corpus, centroids), centroids, queries, probe, K)
  }

  /** Cell assignment: nearest centroid via max_by AGGREGATION (map-side
    * partial) — a per-vector window would shuffle AND sort
    * |corpus|×|centroids| rows. Tiebreak: max(struct(ccos, -c_id)) ==
    * (cosine desc, centroid id asc), matching the oracle's row_number. */
  private[graft] def cellsOf(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus.join(broadcast(centroids))
      .select(col("vec_id"), col("emb"), col("c_id"), cosine6(col("emb"), col("c_emb")).as("ccos"))
      .groupBy(col("vec_id"))
      .agg(first(col("emb")).as("emb"), // functionally dependent on vec_id
        max_by(col("c_id"), struct(col("ccos"), (-col("c_id")).as("neg"))).as("cell"))

  /** Probe + search over a PRE-BUILT cell assignment ([[knnRecall]] shares
    * one assignment across its probe widths — only this part varies). */
  private[graft] def ivfSearch(cells: DataFrame, centroids: DataFrame, queries: DataFrame,
                        probe: Int, k: Int): DataFrame = {
    // probe: top-P centroids per query via the bounded-heap aggregate
    val probes = queries.join(broadcast(centroids))
      .select(col("q_id"), col("q_emb"), col("c_id"), cosine6(col("q_emb"), col("c_emb")).as("qcos"))
      .groupBy(col("q_id"))
      .agg(first(col("q_emb")).as("q_emb"),
        graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), probe).as("top"))
      .select(col("q_id"), col("q_emb"), explode(col("top.id")).as("cell"))

    val scored = cells.join(broadcast(probes), "cell")
      .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
    topKRanked(scored, "q_id", "cos", "vec_id", k)
      .orderBy(col("q_id"), col("rank"))
  }

  /** Neighbors per vector in the kNN graph. */
  val GraphK = 3

  // ---------------------------------------------------------------- №27b knn_graph
  /** kNN GRAPH: top-k neighbors for EVERY corpus vector (the core of
    * embedding-dedup clustering), via IVF cells. The scale shape differs
    * from [[knnBrute]]/[[knnIvf]]: the query side IS the corpus, so nothing
    * is broadcast for the search itself — probes and cells are joined by a
    * plain equi-join on the cell id (both sides hash-partition on cell; at
    * 10⁹ vectors this is a co-partitioned shuffle join touching ~P/C of
    * the all-pairs space), and the per-vector top-k is the bounded-heap
    * TopKByScore aggregate (≤k rows per partition to the final shuffle).
    * Only the fixed-C centroid sample is broadcast (constant size).
    */
  def knnGraph(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val centroids = refinedCentroids(spark, v)

    val cells = v.join(broadcast(centroids))
      .select(col("vec_id"), col("emb"), col("c_id"), cosine6(col("emb"), col("c_emb")).as("ccos"))
      .groupBy(col("vec_id"))
      .agg(first(col("emb")).as("emb"),
        max_by(col("c_id"), struct(col("ccos"), (-col("c_id")).as("neg"))).as("cell"))

    val probes = v.join(broadcast(centroids))
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("c_id"),
        cosine6(col("emb"), col("c_emb")).as("qcos"))
      .groupBy(col("q_id"))
      .agg(first(col("q_emb")).as("q_emb"),
        graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), Probe).as("top"))
      .select(col("q_id"), col("q_emb"), explode(col("top.id")).as("cell"))

    val scored = cells.join(probes, "cell") // shuffle equi-join on cell — NO query broadcast
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
    topKRanked(scored, "q_id", "cos", "vec_id", GraphK)
      .select(col("q_id").as("vec_id"), col("vec_id").as("neighbor"), col("cos"), col("rank"))
      .orderBy(col("vec_id"), col("rank"))
  }

  val knnGraphSql: String =
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |${refinedCentSql("v", "")},
       |cells AS (
       |  SELECT vec_id, emb, c_id AS cell FROM (
       |    SELECT v.vec_id, v.emb, cent.c_id,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY ${cos6Sql("v.emb", "cent.c_emb")} DESC, cent.c_id) AS crank
       |    FROM v, cent) x WHERE crank = 1),
       |probes AS (
       |  SELECT q_id, q_emb, c_id AS cell FROM (
       |    SELECT v.vec_id AS q_id, v.emb AS q_emb, cent.c_id,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY ${cos6Sql("v.emb", "cent.c_emb")} DESC, cent.c_id) AS prank
       |    FROM v, cent) x WHERE prank <= $Probe),
       |scored AS (
       |  SELECT p.q_id, cells.vec_id AS n_id, ${cos6Sql("cells.emb", "p.q_emb")} AS cos,
       |    row_number() OVER (PARTITION BY p.q_id ORDER BY ${cos6Sql("cells.emb", "p.q_emb")} DESC, cells.vec_id) AS rank
       |  FROM cells JOIN probes p USING (cell) WHERE cells.vec_id <> p.q_id)
       |SELECT q_id AS vec_id, n_id AS neighbor, cos, rank FROM scored WHERE rank <= $GraphK
       |ORDER BY vec_id, rank""".stripMargin

  // ---------------------------------------------------------------- №27c knn_recall
  /** Probe widths the recall curve is measured at ([[knnRecall]]). */
  val RecallProbes: Seq[Int] = Seq(2, 8, 32)

  /** Recall accounting for BOTH approximate operators: per query vector,
    * |approx ∩ exact| / k against brute-force ground truth — the number a
    * production pipeline tunes (C, Probe) on, measured instead of asserted.
    * `ivf_pP` rows grade [[knnIvfWith]] at probe P across [[RecallProbes]]
    * — the tuning CURVE (P/C of the corpus scanned → recall), not a point;
    * `graph_p2` rows grade [[knnGraph]] restricted to the same query ids
    * (k=[[GraphK]], corpus = everything). Runs the graded operators
    * VERBATIM — this is a measurement harness over their outputs, so the
    * cost is the operators' own; the ground-truth side only broadcasts the
    * 10 query vectors. */
  def knnRecall(spark: SparkSession, dir: String): DataFrame = {
    def recallOf(approx: DataFrame, exact: DataFrame, k: Int, method: String): DataFrame = {
      val hits = exact.join(approx, Seq("q_id", "vec_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
      exact.select(col("q_id")).distinct().join(hits, Seq("q_id"), "left")
        .select(lit(method).as("method"), col("q_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          round(coalesce(col("n_hits"), lit(0L)).cast("double") / k + 1e-9, 6).as("recall"))
    }
    val brute = graft.CacheRegistry.track(
      knnBrute(spark, dir).select(col("q_id"), col("vec_id")).persist())
    // ONE centroid refinement + cell assignment shared across the probe
    // widths (only probing/search vary — the oracle shares its cells CTE
    // the same way); the search per width still runs the operator verbatim
    val vAll = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = vAll.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = vAll.filter(col("vec_id") >= NQueries)
    val centroids = refinedCentroids(spark, corpus)
    val cells = graft.CacheRegistry.track(cellsOf(corpus, centroids).persist())
    val ivfCurve = RecallProbes.map { p =>
      recallOf(ivfSearch(cells, centroids, queries, p, K).select(col("q_id"), col("vec_id")),
        brute, K, s"ivf_p$p")
    }.reduce(_ unionAll _)

    // graph ground truth: exact top-GraphK over the FULL corpus for the
    // measured query ids (queries broadcast; corpus scanned once)
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val gq = v.filter(col("vec_id") < NQueries).select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val gBrute = v.join(broadcast(gq)).filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
      .groupBy(col("q_id"))
      .agg(graft.functions.TopKByScore.topK(col("cos"), col("vec_id"), GraphK).as("top"))
      .select(col("q_id"), explode(col("top.id")).as("vec_id"))
    val graph = recallOf(
      knnGraph(spark, dir).filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("neighbor").as("vec_id")),
      gBrute, GraphK, s"graph_p$Probe")

    ivfCurve.unionAll(graph).orderBy(col("method"), col("q_id"))
  }

  /** Per-probe ivf CTE block for [[knnRecallSql]] (cells are shared — only
    * the probe list and downstream search differ by P). */
  private def ivfRecallCtes(p: Int): String =
    s"""probes_p$p AS (
       |  SELECT q_id, q_emb, c_id AS cell FROM (
       |    SELECT q.q_id, q.q_emb, cent.c_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "cent.c_emb")} DESC, cent.c_id) AS prank
       |    FROM q, cent) x WHERE prank <= $p),
       |iscored_p$p AS (
       |  SELECT p.q_id, cells.vec_id,
       |    row_number() OVER (PARTITION BY p.q_id ORDER BY ${cos6Sql("cells.emb", "p.q_emb")} DESC, cells.vec_id) AS rank
       |  FROM cells JOIN probes_p$p p USING (cell)),
       |ivf_p$p AS (SELECT q_id, vec_id FROM iscored_p$p WHERE rank <= $K),
       |ihits_p$p AS (
       |  SELECT b.q_id, count(*) AS n_hits
       |  FROM brute b JOIN ivf_p$p USING (q_id, vec_id) GROUP BY b.q_id)""".stripMargin

  private def ivfRecallSelect(p: Int): String =
    s"""SELECT 'ivf_p$p' AS method, q.q_id, coalesce(h.n_hits, 0) AS n_hits,
       |  round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / $K + 0.000000001, 6) AS recall
       |FROM (SELECT DISTINCT q_id FROM brute) q LEFT JOIN ihits_p$p h USING (q_id)""".stripMargin

  val knnRecallSql: String =
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id, emb FROM v WHERE vec_id >= $NQueries),
       |bscored AS (
       |  SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY ${cos6Sql("emb", "q_emb")} DESC, vec_id) AS rank
       |  FROM c, q),
       |brute AS (SELECT q_id, vec_id FROM bscored WHERE rank <= $K),
       |${refinedCentSql("c", "")},
       |cells AS (
       |  SELECT vec_id, emb, c_id AS cell FROM (
       |    SELECT c.vec_id, c.emb, cent.c_id,
       |      row_number() OVER (PARTITION BY c.vec_id ORDER BY ${cos6Sql("c.emb", "cent.c_emb")} DESC, cent.c_id) AS crank
       |    FROM c, cent) x WHERE crank = 1),
       |${RecallProbes.map(ivfRecallCtes).mkString(",\n")},
       |${refinedCentSql("v", "g")},
       |gcells AS (
       |  SELECT vec_id, emb, c_id AS cell FROM (
       |    SELECT v.vec_id, v.emb, gcent.c_id,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY ${cos6Sql("v.emb", "gcent.c_emb")} DESC, gcent.c_id) AS crank
       |    FROM v, gcent) x WHERE crank = 1),
       |gprobes AS (
       |  SELECT q_id, q_emb, c_id AS cell FROM (
       |    SELECT v.vec_id AS q_id, v.emb AS q_emb, gcent.c_id,
       |      row_number() OVER (PARTITION BY v.vec_id ORDER BY ${cos6Sql("v.emb", "gcent.c_emb")} DESC, gcent.c_id) AS prank
       |    FROM v, gcent WHERE v.vec_id < $NQueries) x WHERE prank <= $Probe),
       |gscored AS (
       |  SELECT p.q_id, gcells.vec_id,
       |    row_number() OVER (PARTITION BY p.q_id ORDER BY ${cos6Sql("gcells.emb", "p.q_emb")} DESC, gcells.vec_id) AS rank
       |  FROM gcells JOIN gprobes p USING (cell) WHERE gcells.vec_id <> p.q_id),
       |graph AS (SELECT q_id, vec_id FROM gscored WHERE rank <= $GraphK),
       |gbscored AS (
       |  SELECT a.vec_id AS q_id, b.vec_id,
       |    row_number() OVER (PARTITION BY a.vec_id ORDER BY ${cos6Sql("b.emb", "a.emb")} DESC, b.vec_id) AS rank
       |  FROM v a JOIN v b ON b.vec_id <> a.vec_id WHERE a.vec_id < $NQueries),
       |gbrute AS (SELECT q_id, vec_id FROM gbscored WHERE rank <= $GraphK),
       |ghits AS (
       |  SELECT b.q_id, count(*) AS n_hits
       |  FROM gbrute b JOIN graph USING (q_id, vec_id) GROUP BY b.q_id)
       |${RecallProbes.map(ivfRecallSelect).mkString("\nUNION ALL\n")}
       |UNION ALL
       |SELECT 'graph_p$Probe', q.q_id, coalesce(h.n_hits, 0),
       |  round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / $GraphK + 0.000000001, 6)
       |FROM (SELECT DISTINCT q_id FROM gbrute) q LEFT JOIN ghits h USING (q_id)
       |ORDER BY method, q_id""".stripMargin

  // ---------------------------------------------------------------- №146 knn_c_sweep
  /** The CENTROID-COUNT dial of the IVF quality/cost trade — the
    * companion curve to [[knnRecall]]'s probe dial and the measured basis
    * for the C ∝ √n tuning SCALING.md demonstrates: for each
    * C ∈ [[CSweep]], train C centroids (same frozen sample), assign,
    * search at the default probe width, and grade per query BOTH sides of
    * the trade — `n_cand` (candidate rows scored: the cost, Σ probed cell
    * sizes) and `recall` vs the brute-force gold. More cells ⇒ fewer
    * candidates per probe but a thinner probed fraction ⇒ the curve a
    * production deployment picks its C from. Harness shape: ONE persisted
    * corpus frame; per C the centroid model is the only broadcast and the
    * per-query rollups are bounded; cost is |CSweep| assignments (the
    * operator under measurement, run verbatim). */
  val CSweep: Seq[Int] = Seq(16, 64, 256)

  def knnCSweep(spark: SparkSession, dir: String): DataFrame = {
    val brute = graft.CacheRegistry.track(
      knnBrute(spark, dir).select(col("q_id"), col("vec_id")).persist())
    val vAll = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = vAll.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = graft.CacheRegistry.track(vAll.filter(col("vec_id") >= NQueries).persist())
    CSweep.map { c =>
      val cents = refinedCentroids(spark, corpus, c)
      val cells = graft.CacheRegistry.track(cellsOf(corpus, cents).persist())
      val probes = queries.join(broadcast(cents))
        .select(col("q_id"), col("c_id"), cosine6(col("q_emb"), col("c_emb")).as("qcos"))
        .groupBy(col("q_id"))
        .agg(graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), Probe).as("top"))
        .select(col("q_id"), explode(col("top.id")).as("cell"))
      val sizes = cells.groupBy(col("cell")).agg(count(lit(1)).as("csz"))
      val nCand = probes.join(sizes, Seq("cell"), "left")
        .groupBy(col("q_id")).agg(sum(coalesce(col("csz"), lit(0L))).as("n_cand"))
      val approx = ivfSearch(cells, cents, queries, Probe, K).select(col("q_id"), col("vec_id"))
      val hits = brute.join(approx, Seq("q_id", "vec_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
      brute.select(col("q_id")).distinct()
        .join(nCand, Seq("q_id"), "left").join(hits, Seq("q_id"), "left")
        .select(lit(s"ivf_c$c").as("method"), col("q_id"),
          coalesce(col("n_cand"), lit(0L)).as("n_cand"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          round(coalesce(col("n_hits"), lit(0L)).cast("double") / K + 1e-9, 6).as("recall"))
    }.reduce(_ unionAll _).orderBy(col("method"), col("q_id"))
  }

  private def cSweepCtes(c: Int): String =
    s"""${refinedCentSql("c", s"cw${c}_", c)},
       |cwcells_$c AS (
       |  SELECT vec_id, emb, c_id AS cell FROM (
       |    SELECT c.vec_id, c.emb, cent.c_id,
       |      row_number() OVER (PARTITION BY c.vec_id ORDER BY ${cos6Sql("c.emb", "cent.c_emb")} DESC, cent.c_id) AS crank
       |    FROM c, cw${c}_cent cent) x WHERE crank = 1),
       |cwprobes_$c AS (
       |  SELECT q_id, q_emb, c_id AS cell FROM (
       |    SELECT q.q_id, q.q_emb, cent.c_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "cent.c_emb")} DESC, cent.c_id) AS prank
       |    FROM q, cw${c}_cent cent) x WHERE prank <= $Probe),
       |cwcand_$c AS (
       |  SELECT p.q_id, count(*) AS n_cand
       |  FROM cwcells_$c JOIN cwprobes_$c p USING (cell) GROUP BY p.q_id),
       |cwivf_$c AS (
       |  SELECT q_id, vec_id FROM (
       |    SELECT p.q_id, cwcells_$c.vec_id,
       |      row_number() OVER (PARTITION BY p.q_id ORDER BY ${cos6Sql(s"cwcells_$c.emb", "p.q_emb")} DESC, cwcells_$c.vec_id) AS rank
       |    FROM cwcells_$c JOIN cwprobes_$c p USING (cell)) x WHERE rank <= $K),
       |cwhits_$c AS (
       |  SELECT b.q_id, count(*) AS n_hits
       |  FROM brute b JOIN cwivf_$c USING (q_id, vec_id) GROUP BY b.q_id)""".stripMargin

  private def cSweepSelect(c: Int): String =
    s"""SELECT 'ivf_c$c' AS method, q.q_id,
       |  coalesce(cd.n_cand, 0) AS n_cand, coalesce(h.n_hits, 0) AS n_hits,
       |  round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / $K + 0.000000001, 6) AS recall
       |FROM (SELECT DISTINCT q_id FROM brute) q
       |LEFT JOIN cwcand_$c cd USING (q_id) LEFT JOIN cwhits_$c h USING (q_id)""".stripMargin

  val knnCSweepSql: String =
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id, emb FROM v WHERE vec_id >= $NQueries),
       |bscored AS (
       |  SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY ${cos6Sql("emb", "q_emb")} DESC, vec_id) AS rank
       |  FROM c, q),
       |brute AS (SELECT q_id, vec_id FROM bscored WHERE rank <= $K),
       |${CSweep.map(cSweepCtes).mkString(",\n")}
       |${CSweep.map(cSweepSelect).mkString("\nUNION ALL\n")}
       |ORDER BY method, q_id""".stripMargin

  // ---------------------------------------------------------------- №145 embedding_drift
  /** EMBEDDING-DISTRIBUTION drift monitor — the vector-side twin of №130
    * source_drift (did the encoder / corpus shift between two snapshot
    * halves?): per dimension, compare the fixed-point mean between the
    * early and late half of the vector store (vec_id grid — the snapshot
    * boundary), with the shift reported as an exact cross-multiplied ppm
    * (|Σa·n_b − Σb·n_a|·10⁶ / (|Σa|·n_b + |Σb|·n_a)) — no float fold
    * anywhere: components quantize to 1e-4 fixed point (exact §5
    * rounding), the per-(half, dim) sums are BIGINTs, and the ratio is
    * integer-DIV'd. Scale shape: ONE posexplode projection, a 2×dims
    * hash agg (bounded key space — map-side partials carry the corpus),
    * then a dims-row self-join; output 64 rows at any corpus size.
    * PRECONDITION: dense vec_ids (generator contract) for the half grid. */
  /** The drift ratio in DECIMAL(38,0) — shared with DriftOverflowSpec,
    * which proves the BIGINT form WRAPS on constructible magnitudes.
    * Bound: |sum| ≤ n·10⁴ (quantized |x| ≤ 1), so |sum·n| ≤ n²·10⁴ —
    * 10²⁶ at n = 10¹¹ vectors, far past 2⁶³ ≈ 9.2·10¹⁸ (BIGINT wraps
    * once n exceeds ~3·10⁷ with saturated components) but comfortably
    * inside 38 digits even ×10⁶. */
  private[queries] val driftShiftPpmExpr: String =
    """abs(CAST(sum_a AS DECIMAL(38,0)) * n_b - CAST(sum_b AS DECIMAL(38,0)) * n_a) * 1000000
      | DIV greatest(abs(CAST(sum_a AS DECIMAL(38,0))) * n_b + abs(CAST(sum_b AS DECIMAL(38,0))) * n_a, 1)""".stripMargin

  def embeddingDrift(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings
    val n = v.agg((max(col("vec_id")) + 1).as("n"))
    val per = v.crossJoin(broadcast(n))
      .select(expr("(vec_id * 2) DIV n").as("half"),
        posexplode(expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 10000 + 0.000000001) AS BIGINT))")))
      .select(col("half"), (col("pos") + 1).as("dim"), col("col").as("q"))
      .groupBy(col("half"), col("dim"))
      .agg(count(lit(1)).as("n_vec"), sum(col("q")).as("sum_q"))
    val a = per.filter(col("half") === 0)
      .select(col("dim"), col("n_vec").as("n_a"), col("sum_q").as("sum_a"))
    val b = per.filter(col("half") === 1)
      .select(col("dim"), col("n_vec").as("n_b"), col("sum_q").as("sum_b"))
    a.join(b, "dim")
      .select(col("dim"), col("n_a"), col("n_b"), col("sum_a"), col("sum_b"),
        expr(driftShiftPpmExpr).as("shift_ppm"))
      .orderBy(col("dim"))
  }

  val embeddingDriftSql: String =
    s"""WITH ed_n AS (SELECT max(vec_id) + 1 AS n FROM embeddings),
       |ed_u AS (
       |  SELECT (vec_id * 2) // n AS half,
       |    generate_subscripts(embedding, 1) AS dim, unnest(embedding) AS x
       |  FROM embeddings CROSS JOIN ed_n),
       |ed_p AS (
       |  SELECT half, dim,
       |    CAST(round(CAST(x AS DOUBLE) * 10000 + 0.000000001) AS BIGINT) AS q
       |  FROM ed_u),
       |ed_g AS (
       |  SELECT half, dim, count(*) AS n_vec, CAST(sum(q) AS BIGINT) AS sum_q
       |  FROM ed_p GROUP BY half, dim)
       |SELECT a.dim, a.n_vec AS n_a, b.n_vec AS n_b, a.sum_q AS sum_a, b.sum_q AS sum_b,
       |  CAST((abs(CAST(a.sum_q AS HUGEINT) * b.n_vec - CAST(b.sum_q AS HUGEINT) * a.n_vec) * 1000000)
       |    // greatest(abs(CAST(a.sum_q AS HUGEINT)) * b.n_vec + abs(CAST(b.sum_q AS HUGEINT)) * a.n_vec, 1) AS BIGINT) AS shift_ppm
       |FROM (SELECT * FROM ed_g WHERE half = 0) a
       |JOIN (SELECT * FROM ed_g WHERE half = 1) b USING (dim)
       |ORDER BY dim""".stripMargin

  // ---------------------------------------------------------------- №56 semantic_dedup
  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster embeddings
    * with k-means, then near-dedup WITHIN each cluster only — the cluster
    * pass bounds the candidate space to O(n²/C) instead of all-pairs,
    * which is the whole point of the method at 100 TB (C grows with n, so
    * per-cell membership stays bounded). Distinct from [[dedupEmbedding]]
    * (LSH sign-buckets, pair OUTPUT): this is the cluster-then-drop
    * pipeline whose output is a per-vector keep/drop verdict.
    *
    * Reuses the proven pieces verbatim: the dup-injected corpus, the
    * [[refinedCentroids]] k-means (constant-size sample + broadcast at any
    * scale, oracle-reproduced bit-exactly) and the [[cellsOf]] assignment
    * (one broadcast-join pass, map-side max_by). Within a cell the drop
    * rule is deterministic and non-transitive: a vector is dropped iff
    * some LOWER-id member of its cell is ≥ τ cosine-similar — relational
    * (an EXISTS, not an iteration), identical in both engines. The
    * within-cell self-join is a shuffle equi-join on the cell id, both
    * sides co-partitioned — no broadcast of anything corpus-sized. */
  def semanticDedup(spark: SparkSession, dir: String): DataFrame =
    semanticDedupWith(spark, dir, "auto")

  /** [[semanticDedup]] with the mark-back scale knob shared with
    * line_dedup/dedup_substring: the dropped-id set grows with the
    * corpus's duplicated fraction, so it is never force-broadcast —
    * "auto" lets AQE decide from measured sizes; "shuffle" pins the
    * bounded-memory SHUFFLE_HASH equi-join for the 100 TB shape
    * (SemanticDedupSpec proves the modes row-identical). */
  def semanticDedupWith(spark: SparkSession, dir: String, mode: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val copies = v.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 1000000).as("vec_id"),
        concat(slice(col("emb"), 1, 59),
          array(element_at(col("emb"), 60) + lit(0.01f)),
          slice(col("emb"), 61, 4)).as("emb"))
    val corpus = v.unionAll(copies)
    val centroids = refinedCentroids(spark, corpus)
    val cells = graft.CacheRegistry.track(cellsOf(corpus, centroids)
      .select(col("vec_id"), col("emb"), col("cell")).persist())
    val dropped = cells.as("a").join(cells.as("b"),
        col("a.cell") === col("b.cell") && col("a.vec_id") < col("b.vec_id"))
      .filter(cosine6(col("a.emb"), col("b.emb")) >= NearDupTau)
      .select(col("b.vec_id").as("vec_id")).distinct()
      .select(col("vec_id"), lit(true).as("dup"))
    val marked = mode match {
      case "auto"    => cells.join(dropped, Seq("vec_id"), "left")
      case "shuffle" => cells.join(dropped.hint("SHUFFLE_HASH"), Seq("vec_id"), "left")
      case other     => throw new IllegalArgumentException(s"unknown semantic_dedup join mode: $other")
    }
    marked
      .select(col("vec_id"), col("cell"), coalesce(!col("dup"), lit(true)).as("kept"))
      .orderBy(col("vec_id"))
  }

  val semanticDedupSql: String = {
    val perturbed = "emb[1:59] || [CAST(emb[60] AS FLOAT) + CAST(0.01 AS FLOAT)] || emb[61:64]"
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |sdcorpus AS (
       |  SELECT vec_id, emb FROM v
       |  UNION ALL
       |  SELECT vec_id + 1000000, $perturbed FROM v WHERE vec_id % 20 = 0),
       |${refinedCentSql("sdcorpus", "sd")},
       |sdcells AS (
       |  SELECT vec_id, emb, c_id AS cell FROM (
       |    SELECT s.vec_id, s.emb, sdcent.c_id,
       |      row_number() OVER (PARTITION BY s.vec_id ORDER BY ${cos6Sql("s.emb", "sdcent.c_emb")} DESC, sdcent.c_id) AS crank
       |    FROM sdcorpus s, sdcent) x WHERE crank = 1),
       |sddropped AS (
       |  SELECT DISTINCT b.vec_id
       |  FROM sdcells a JOIN sdcells b
       |    ON a.cell = b.cell AND a.vec_id < b.vec_id
       |  WHERE ${cos6Sql("a.emb", "b.emb")} >= $NearDupTau)
       |SELECT c.vec_id, c.cell, d.vec_id IS NULL AS kept
       |FROM sdcells c LEFT JOIN sddropped d ON c.vec_id = d.vec_id
       |ORDER BY c.vec_id""".stripMargin
  }

  val knnIvfSql: String =
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id, emb FROM v WHERE vec_id >= $NQueries),
       |${refinedCentSql("c", "")},
       |cells AS (
       |  SELECT vec_id, emb, c_id AS cell FROM (
       |    SELECT c.vec_id, c.emb, cent.c_id,
       |      row_number() OVER (PARTITION BY c.vec_id ORDER BY ${cos6Sql("c.emb", "cent.c_emb")} DESC, cent.c_id) AS crank
       |    FROM c, cent) x WHERE crank = 1),
       |probes AS (
       |  SELECT q_id, q_emb, c_id AS cell FROM (
       |    SELECT q.q_id, q.q_emb, cent.c_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "cent.c_emb")} DESC, cent.c_id) AS prank
       |    FROM q, cent) x WHERE prank <= $Probe),
       |scored AS (
       |  SELECT p.q_id, cells.vec_id, ${cos6Sql("cells.emb", "p.q_emb")} AS cos,
       |    row_number() OVER (PARTITION BY p.q_id ORDER BY ${cos6Sql("cells.emb", "p.q_emb")} DESC, cells.vec_id) AS rank
       |  FROM cells JOIN probes p USING (cell))
       |SELECT q_id, vec_id, cos, rank FROM scored WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------- №119 knn_index_update
  /** Batch id predicate for the incremental-index split: every 20th
    * corpus vector is "today's arrivals". */
  private val BatchMod = 20

  /** Dir-keyed table-name suffix so a persisted model/index can never
    * serve another SF's corpus. */
  private def dirKey(dir: String): String = dir.replaceAll("[^a-zA-Z0-9]", "_")

  /** Build-if-absent PLAIN table (the constant-size model-state twin of
    * [[graft.sources.Bucketing.bucketedCached]]): the frozen centroid
    * model persists once per corpus version; reuse skips the base-sized
    * sample sort inside [[refinedCentroids]] on every subsequent batch. */
  private def cachedModel(spark: SparkSession, table: String)(build: => DataFrame): DataFrame = {
    val path = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_models", table)
    if (spark.catalog.tableExists(table) && java.nio.file.Files.exists(path))
      spark.table(table)
    else {
      spark.sql(s"DROP TABLE IF EXISTS $table")
      if (java.nio.file.Files.exists(path)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(path).iterator().asScala.toSeq.reverse
          .foreach(p => java.nio.file.Files.deleteIfExists(p))
      }
      build.write.mode("overwrite").option("path", path.toString).saveAsTable(table)
      spark.table(table)
    }
  }

  /** Bench hook: drop the persisted №119 centroid model + bucketed base
    * index for `dir` (at the session's effective centroid count), so the
    * harness can measure the COLD first-build cost as its own artifact
    * number — the steady-state median alone under-reports what a fresh
    * corpus version pays (~5× at sf0.1). */
  def dropIndexUpdateCaches(spark: SparkSession, dir: String): Unit = {
    val cc = centroidsOf(spark)
    Seq(("graft_models", s"graft_ivfupd_cent_${dirKey(dir)}_c$cc"),
        ("graft_bucketed", s"graft_ivfupd_base_${dirKey(dir)}_c$cc")).foreach {
      case (store, t) =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val path = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), store, t)
        if (java.nio.file.Files.exists(path)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(path).iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
    }
  }

  /** Incremental IVF index MAINTENANCE — the vector-side twin of №66
    * dedup_incremental: a daily embedding batch joins the persisted index
    * (№72's layout) WITHOUT a rebuild. The centroid model is FROZEN from
    * the base (production retrains centroids rarely, assigns daily), so:
    *
    *   - the base assignment is the PERSISTED index — №72's bucketed
    *     layout, built if absent and REUSED on every subsequent call
    *     (r10: the driver row now drives this access path, so bench
    *     iterations past the first measure batch-sized work, exactly the
    *     nightly-batch economics the operator claims); the frozen
    *     centroid model persists the same way (a constant-size table),
    *     skipping the base-sized sample sort per batch;
    *   - the BATCH assignment is batch-sized work: one broadcast-join
    *     pass over the arrivals only (constant centroid broadcast);
    *   - search runs over union(persisted index scan, batch assignment) —
    *     probes broadcast, so the base side is a pure bucketed SCAN with
    *     no exchange anywhere (PlanRegressionSpec pins it).
    *
    * Because per-vector assignment under FIXED centroids is independent,
    * the incremental union is EXACTLY the assignment a full rebuild under
    * the same centroids would produce — QuerySpecs pins incremental ≡
    * full-rebuild equality, and the oracle computes the full form
    * (centroids from the base, one assignment over base ∪ batch). At
    * 100 TB this is the difference between re-shuffling the whole vector
    * store nightly and touching only the day's arrivals; drift is managed
    * by re-training centroids when [[knnRecall]]'s measured curve decays. */
  def knnIndexUpdate(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val base = corpus.filter(col("vec_id") % BatchMod =!= 0)
    val batch = corpus.filter(col("vec_id") % BatchMod === 0)
    // build-if-absent: base-sized work happens ONCE per corpus version.
    // The effective centroid count is part of the cache key: a session
    // that first ran with spark.graft.knn.centroids set must not leak a
    // wrong-C model (or its dependent cell layout) into conf-default runs.
    val cc = centroidsOf(spark)
    val centroids = cachedModel(spark, s"graft_ivfupd_cent_${dirKey(dir)}_c$cc")(
      refinedCentroids(spark, base, cc)) // the FROZEN model
    val index = graft.sources.Bucketing.bucketedCached(
      spark, s"graft_ivfupd_base_${dirKey(dir)}_c$cc", "cell")(
      cellsOf(base, centroids))                   // the persisted №72 layout
    val arrivals = cellsOf(batch, centroids)      // batch-sized daily work
    // unionByName: the persisted table's column order is a storage detail
    ivfSearch(index.unionByName(arrivals), centroids, queries, Probe, K)
  }

  /** Full-rebuild form under the same frozen centroids (spec's equality
    * counterpart, and the oracle's formulation). */
  private[queries] def knnIndexFullRebuild(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val base = corpus.filter(col("vec_id") % BatchMod =!= 0)
    val centroids = refinedCentroids(spark, base)
    ivfSearch(cellsOf(corpus, centroids), centroids, queries, Probe, K)
  }

  val knnIndexUpdateSql: String =
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id, emb FROM v WHERE vec_id >= $NQueries),
       |b AS (SELECT vec_id, emb FROM c WHERE vec_id % $BatchMod <> 0),
       |${refinedCentSql("b", "")},
       |cells AS (
       |  SELECT vec_id, emb, c_id AS cell FROM (
       |    SELECT c.vec_id, c.emb, cent.c_id,
       |      row_number() OVER (PARTITION BY c.vec_id ORDER BY ${cos6Sql("c.emb", "cent.c_emb")} DESC, cent.c_id) AS crank
       |    FROM c, cent) x WHERE crank = 1),
       |probes AS (
       |  SELECT q_id, q_emb, c_id AS cell FROM (
       |    SELECT q.q_id, q.q_emb, cent.c_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "cent.c_emb")} DESC, cent.c_id) AS prank
       |    FROM q, cent) x WHERE prank <= $Probe),
       |scored AS (
       |  SELECT p.q_id, cells.vec_id, ${cos6Sql("cells.emb", "p.q_emb")} AS cos,
       |    row_number() OVER (PARTITION BY p.q_id ORDER BY ${cos6Sql("cells.emb", "p.q_emb")} DESC, cells.vec_id) AS rank
       |  FROM cells JOIN probes p USING (cell))
       |SELECT q_id, vec_id, cos, rank FROM scored WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------- №72 knn_graph_indexed
  /** PERSISTED IVF index — build once, query many: the cell assignment
    * ([[cellsOf]]) is written as a bucketed+sorted table on the cell id
    * ([[graft.sources.Bucketing]] layout), so every subsequent search
    * workload joins probes against the index with NO exchange and no sort
    * on the index side — only the (workload-sized) probe side shuffles to
    * the bucket partitioning. This is the economics of ANN at 100 TB: the
    * corpus-wide assignment pass is paid once, and each of the many query
    * workloads that follow (per-experiment graph builds, dedup sweeps,
    * retrieval evals) re-reads the co-located layout instead of
    * re-shuffling a 100 TB cells frame per run (knn_graph's shape pays
    * that co-partitioning shuffle on BOTH sides every time).
    *
    * Same search semantics as [[knnGraph]], same oracle — the layout
    * changes the PLAN (pinned exchange-free on the index side in
    * PlanRegressionSpec), never the answer. */
  def knnGraphIndexed(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val centroids = refinedCentroids(spark, v)
    // BUILD (once per corpus version): assignment written bucketed on cell
    val index = graft.sources.Bucketing.writeBucketedBy(
      cellsOf(v, centroids).select(col("vec_id"), col("emb"), col("cell")),
      "graft_ivf_cells", "cell")
    // QUERY: the workload's probes; MERGE pins the co-located join (at
    // proof scale AQE would broadcast and never exercise the layout — at
    // 100 TB the index side is never broadcastable)
    val probes = v.join(broadcast(centroids))
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"), col("c_id"),
        cosine6(col("emb"), col("c_emb")).as("qcos"))
      .groupBy(col("q_id"))
      .agg(first(col("q_emb")).as("q_emb"),
        graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), Probe).as("top"))
      .select(col("q_id"), col("q_emb"), explode(col("top.id")).as("cell"))
    val scored = index.hint("MERGE").join(probes, "cell")
      .filter(col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
    topKRanked(scored, "q_id", "cos", "vec_id", GraphK)
      .select(col("q_id").as("vec_id"), col("vec_id").as("neighbor"), col("cos"), col("rank"))
      .orderBy(col("vec_id"), col("rank"))
  }

  /** The index is an ACCESS PATH, not a semantic: same oracle as knn_graph. */
  val knnGraphIndexedSql: String = knnGraphSql

  // ---------------------------------------------------------------- №71 embedding_quantize
  /** Int8 scalar quantization for the vector corpus — the 4× memory /
    * bandwidth lever a 100 TB embedding store actually pulls (float32 →
    * int8 per dimension, one float scale per vector), with the retrieval
    * cost MEASURED instead of asserted: per query, top-[[K]] under
    * int8-cosine is graded against the float top-[[K]] (agreement@K), and
    * the worst score distortion over the float top-K pairs is reported.
    *
    * Quantization is exact-arithmetic cross-engine: scale = max|x|/127
    * (max is order-independent), q = round(x/scale + 1e-9) — both engines
    * round half-away-from-zero and the 1e-9 nudge resolves exact halves
    * identically (the §5 rounding rule); int dot products are exact
    * BIGINTs, so the quantized cosine is bit-identical in both engines.
    *
    * Scale shape: quantization is one narrow projection (persisted
    * BARRIER between the scale aggregation and the per-element lambda —
    * CollapseProject would otherwise inline the array_max once per
    * element, §9); search is the knn_brute shape (queries broadcast,
    * corpus scanned once, bounded-heap top-k). At 100 TB the quantized
    * corpus is what sits in memory/cache; this operator is the measured
    * go/no-go for that swap. */
  def embeddingQuantize(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    // barrier: scale must not be inlined into the per-element lambda
    val scaled = graft.CacheRegistry.track(v.select(col("vec_id"), col("emb"),
      greatest(expr("array_max(transform(emb, x -> abs(CAST(x AS DOUBLE))))") / 127.0, lit(1e-12)).as("scale"))
      .persist())
    val qv = graft.CacheRegistry.track(scaled.select(col("vec_id"), col("emb"),
      expr("transform(emb, x -> CAST(round(CAST(x AS DOUBLE) / scale + 0.000000001, 0) AS INT))").as("qemb"))
      .persist())
    def qcos(a: String, b: String): Column = {
      def dot(x: String, y: String) =
        s"CAST(aggregate(zip_with($x, $y, (p, q) -> CAST(p AS BIGINT) * q), 0L, (acc, e) -> acc + e) AS DOUBLE)"
      expr(s"round(${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)})) + 0.000000001, 6)")
    }
    val queries = qv.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("qemb").as("q_qemb"))
    val corpus = qv.filter(col("vec_id") >= NQueries)
    val scoredQ = corpus.join(broadcast(queries))
      .select(col("q_id"), col("vec_id"), qcos("qemb", "q_qemb").as("qcos"))
    val topQ = topKRanked(scoredQ, "q_id", "qcos", "vec_id", K)
      .select(col("q_id"), col("vec_id"))
    // float ground truth: the knn_brute operator verbatim
    val topF = graft.CacheRegistry.track(
      knnBrute(spark, dir).select(col("q_id"), col("vec_id"), col("cos")).persist())
    val hits = topF.join(topQ, Seq("q_id", "vec_id"))
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
    // score distortion over the float top-K pairs: |cos_int8 − cos_float|
    val qerr = topF
      .join(qv.select(col("vec_id").as("q_id"), col("qemb").as("q_qemb")), "q_id")
      .join(qv.select(col("vec_id"), col("qemb")), "vec_id")
      .select(col("q_id"), (qcos("qemb", "q_qemb") - col("cos")).as("err"))
      .groupBy(col("q_id")).agg(round(max(abs(col("err"))) + lit(1e-9), 6).as("max_qerr"))
    topF.select(col("q_id")).distinct()
      .join(hits, Seq("q_id"), "left")
      .join(qerr, Seq("q_id"), "left")
      .select(col("q_id"), coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double") / K + 1e-9, 6).as("agreement"),
        col("max_qerr"))
      .orderBy(col("q_id"))
  }

  val embeddingQuantizeSql: String = {
    def qdot(a: String, b: String): String =
      s"CAST(list_sum(list_transform(range(1, len($a)+1), i -> CAST($a[i] AS BIGINT) * $b[i])) AS DOUBLE)"
    def qcos(a: String, b: String): String =
      s"round(${qdot(a, b)} / (sqrt(${qdot(a, a)}) * sqrt(${qdot(b, b)})) + 0.000000001, 6)"
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |sc AS (
       |  SELECT vec_id, emb,
       |    greatest(list_max(list_transform(emb, x -> abs(CAST(x AS DOUBLE)))) / 127.0, 1e-12) AS scale
       |  FROM v),
       |qv AS (
       |  SELECT vec_id, emb,
       |    list_transform(emb, x -> CAST(round(CAST(x AS DOUBLE) / scale + 0.000000001, 0) AS INT)) AS qemb
       |  FROM sc),
       |q AS (SELECT vec_id AS q_id, qemb AS q_qemb FROM qv WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id, qemb FROM qv WHERE vec_id >= $NQueries),
       |rankedq AS (
       |  SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY ${qcos("qemb", "q_qemb")} DESC, vec_id) AS rank
       |  FROM c, q),
       |topq AS (SELECT q_id, vec_id FROM rankedq WHERE rank <= $K),
       |fq AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < $NQueries),
       |fc AS (SELECT vec_id, emb FROM v WHERE vec_id >= $NQueries),
       |rankedf AS (
       |  SELECT q_id, vec_id, ${cos6Sql("emb", "q_emb")} AS cos,
       |    row_number() OVER (PARTITION BY q_id ORDER BY ${cos6Sql("emb", "q_emb")} DESC, vec_id) AS rank
       |  FROM fc, fq),
       |topf AS (SELECT q_id, vec_id, cos FROM rankedf WHERE rank <= $K),
       |hits AS (
       |  SELECT f.q_id, count(*) AS n_hits
       |  FROM topf f JOIN topq USING (q_id, vec_id) GROUP BY f.q_id),
       |qerr AS (
       |  SELECT f.q_id, round(max(abs(${qcos("cv.qemb", "qq.q_qemb")} - f.cos)) + 0.000000001, 6) AS max_qerr
       |  FROM topf f
       |  JOIN q qq ON qq.q_id = f.q_id
       |  JOIN (SELECT vec_id, qemb FROM qv) cv ON cv.vec_id = f.vec_id
       |  GROUP BY f.q_id)
       |SELECT b.q_id, coalesce(h.n_hits, 0) AS n_hits,
       |  round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / $K + 0.000000001, 6) AS agreement,
       |  e.max_qerr
       |FROM (SELECT DISTINCT q_id FROM topf) b
       |LEFT JOIN hits h USING (q_id)
       |LEFT JOIN qerr e USING (q_id)
       |ORDER BY q_id""".stripMargin
  }

  // ---------------------------------------------------------------- №121 pq_quantize
  /** PQ geometries measured: M subspaces × [[PqCodebook]]-entry codebooks
    * — a vector stores as M codes (M bytes vs 64 float32s: 128× at M=2,
    * 64× at M=4). The compression→fidelity CURVE is the published number
    * (the №27c knn_recall discipline): more subspaces → finer
    * reconstruction → higher agreement, linearly more code bytes. */
  val PqMs: Seq[Int] = Seq(2, 4)
  val PqCodebook = 16

  /** Per-M PQ pipeline pieces: the reconstructed-corpus frame
    * (vec_id, recon) from one encoding pass. */
  private def pqRecon(spark: SparkSession, corpus: DataFrame, M: Int): DataFrame = {
    def sub(m: Int): Column = {
      val w = s"(size(emb) DIV $M)"
      if (m < M - 1) expr(s"slice(emb, $m * $w + 1, $w)")
      else expr(s"slice(emb, ${M - 1} * $w + 1, size(emb) - ${M - 1} * $w)")
    }
    // per-subspace codebooks — frozen model, constant broadcast (M·Ksub).
    // ONE sample collect for all subspaces: the hash order depends only on
    // vec_id, so each subspace's sample is a local slice of the full one
    // (6 corpus TakeOrdered jobs → 1; measured 4.3→3.9s at sf0.1 — the
    // remaining cost is the brute-force ground truth + the two encode
    // passes, the measurement itself)
    import spark.implicits._
    val full = hashSample(corpus)
    val d = full.headOption.map(_.length).getOrElse(0)
    val w = d / M
    val cbs = (0 until M).map { m =>
      val lo = m * w
      val hi = if (m < M - 1) (m + 1) * w else d
      lloydRefine(full.map(_.slice(lo, hi)), PqCodebook).toSeq.toDF("c_id", "c_emb")
    }
    val cbAll = cbs.zipWithIndex.map { case (cb, m) =>
      cb.select(lit(m).as("m"), col("c_id"), col("c_emb"))
    }.reduce(_ unionAll _)
    // ONE encoding pass over the corpus: every subspace argmax in a single
    // map-side-combining aggregation (max_by FILTER per subspace) against
    // the broadcast codebook union — never one shuffle per subspace
    val subbed = (0 until M).foldLeft(corpus) { (df, m) => df.withColumn(s"sub_$m", sub(m)) }
    val scos = (1 until M).foldLeft(
      when(col("m") === 0, cosine6(col("sub_0"), col("c_emb")))) { (acc, m) =>
      acc.when(col("m") === m, cosine6(col(s"sub_$m"), col("c_emb")))
    }
    val aggs = (0 until M).map(m =>
      expr(s"max_by(c_emb, struct(scos, -c_id)) FILTER (WHERE m = $m)").as(s"r$m"))
    subbed.join(broadcast(cbAll))
      .withColumn("scos", scos)
      .groupBy(col("vec_id"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("vec_id"), concat((0 until M).map(m => col(s"r$m")): _*).as("recon"))
  }

  /** Product quantization (Jégou et al. 2011) — the vector-store
    * compression lever BEYOND int8 (№71 keeps every dimension at 1 byte;
    * PQ stores whole SUBVECTORS as codebook indices): per geometry M,
    * learn a [[PqCodebook]]-entry codebook per subspace with the SAME
    * oracle-reproduced k-means as the IVF centroids ([[refinedCentroids]],
    * k parameterized), encode the corpus as nearest-codeword ids, and
    * grade retrieval over the RECONSTRUCTED vectors against the float
    * ground truth — per-query agreement@[[K]] and worst score distortion
    * for every M in [[PqMs]], the measured compression→fidelity curve a
    * production store picks its geometry from (on this isotropic random
    * corpus the coarse end is intrinsically poor — exactly why the curve
    * is measured, the №27c low-probe-recall precedent).
    *
    * Scale shape: codebooks are constant-size broadcasts; encoding is one
    * broadcast-join pass + one aggregation per geometry; search touches
    * only codes + codebooks (the float corpus never loads at query time).
    * Exactness: every cosine is the sequential-fold cos6 both engines
    * share; codeword ties break to the lowest code id. */
  def pqQuantize(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = graft.CacheRegistry.track(v.filter(col("vec_id") >= NQueries).persist())
    val topF = graft.CacheRegistry.track(
      knnBrute(spark, dir).select(col("q_id"), col("vec_id"), col("cos")).persist())
    val perM = PqMs.map { bigM =>
      val enc = graft.CacheRegistry.track(pqRecon(spark, corpus, bigM).persist())
      val scored = enc.join(broadcast(queries))
        .select(col("q_id"), col("vec_id"), cosine6(col("recon"), col("q_emb")).as("pqcos"))
      val topPq = topKRanked(scored, "q_id", "pqcos", "vec_id", K)
        .select(col("q_id"), col("vec_id"))
      val hits = topF.join(topPq, Seq("q_id", "vec_id"))
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_hits"))
      // score distortion over the float top-K pairs: |cos_pq − cos_float|
      val qerr = topF
        .join(broadcast(queries), "q_id")
        .join(enc.select(col("vec_id"), col("recon")), "vec_id")
        .select(col("q_id"), (cosine6(col("recon"), col("q_emb")) - col("cos")).as("err"))
        .groupBy(col("q_id")).agg(round(max(abs(col("err"))) + lit(1e-9), 6).as("max_qerr"))
      // corpus-level reconstruction fidelity — the number that MOVES with
      // M (agreement@K barely does on an isotropic corpus): mean cos6 of
      // vector vs its reconstruction, in EXACT integer ppm (cos6 is
      // already 6dp; the ×1e6 round then BIGINT sum DIV n is
      // order-independent — no float fold)
      val reconStat = enc.join(corpus, "vec_id")
        .select(cosine6(col("recon"), col("emb")).as("c6"))
        .select(expr("CAST(round(c6 * 1000000, 0) AS BIGINT)").as("ppm"))
        .groupBy()
        .agg(expr("sum(ppm) DIV count(1)").as("recon_ppm"))
      topF.select(col("q_id")).distinct()
        .join(hits, Seq("q_id"), "left")
        .join(qerr, Seq("q_id"), "left")
        .crossJoin(broadcast(reconStat))
        .select(lit(s"pq_m$bigM").as("method"), col("q_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          round(coalesce(col("n_hits"), lit(0L)).cast("double") / K + 1e-9, 6).as("agreement"),
          col("max_qerr"), col("recon_ppm"))
    }
    perM.reduce(_ unionAll _).orderBy(col("method"), col("q_id"))
  }

  /** Per-geometry CTE block: subspace slices → codebook chains → nearest
    * codeword per subspace → reconstruction → ranked search + grading. */
  private def pqCtes(bigM: Int): String = {
    val p = s"m$bigM"
    val w = s"(len(emb) // $bigM)"
    val subs = (0 until bigM).map { m =>
      val sl = if (m < bigM - 1) s"list_slice(emb, $m * $w + 1, ${m + 1} * $w)"
               else s"list_slice(emb, ${bigM - 1} * $w + 1, len(emb))"
      s"${p}s$m AS (SELECT vec_id, $sl AS emb FROM c)"
    }.mkString(",\n")
    val cents = (0 until bigM).map(m => refinedCentSql(s"${p}s$m", s"${p}k${m}_", PqCodebook)).mkString(",\n")
    val rs = (0 until bigM).map { m =>
      s"""${p}r$m AS (
         |  SELECT vec_id, c_emb AS e$m FROM (
         |    SELECT s.vec_id, a.c_emb,
         |      row_number() OVER (PARTITION BY s.vec_id ORDER BY ${cos6Sql("s.emb", "a.c_emb")} DESC, a.c_id) AS rk
         |    FROM ${p}s$m s, ${p}k${m}_cent a) x WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    val reconJoin = (1 until bigM).foldLeft(s"${p}r0")((acc, m) => s"$acc JOIN ${p}r$m USING (vec_id)")
    val cat = (0 until bigM).map(m => s"e$m").mkString(" || ")
    s"""$subs,
       |$cents,
       |$rs,
       |${p}recon AS (SELECT vec_id, $cat AS remb FROM $reconJoin),
       |${p}ranked AS (
       |  SELECT q.q_id, r.vec_id,
       |    row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("r.remb", "q.q_emb")} DESC, r.vec_id) AS rank
       |  FROM ${p}recon r, q),
       |${p}top AS (SELECT q_id, vec_id FROM ${p}ranked WHERE rank <= $K),
       |${p}hits AS (
       |  SELECT f.q_id, count(*) AS n_hits FROM topf f JOIN ${p}top USING (q_id, vec_id) GROUP BY f.q_id),
       |${p}qerr AS (
       |  SELECT f.q_id,
       |    round(max(abs(${cos6Sql("r.remb", "qq.q_emb")} - f.cos)) + 0.000000001, 6) AS max_qerr
       |  FROM topf f
       |  JOIN q qq ON qq.q_id = f.q_id
       |  JOIN ${p}recon r ON r.vec_id = f.vec_id
       |  GROUP BY f.q_id),
       |${p}rstat AS (
       |  SELECT CAST(sum(CAST(round(c6 * 1000000, 0) AS BIGINT)) AS BIGINT) // count(*) AS recon_ppm
       |  FROM (
       |    SELECT ${cos6Sql("r.remb", "c.emb")} AS c6
       |    FROM ${p}recon r JOIN c USING (vec_id)))""".stripMargin
  }

  private def pqSelect(bigM: Int): String =
    s"""SELECT 'pq_m$bigM' AS method, b.q_id, coalesce(h.n_hits, 0) AS n_hits,
       |  round(CAST(coalesce(h.n_hits, 0) AS DOUBLE) / $K + 0.000000001, 6) AS agreement,
       |  e.max_qerr, CAST(s.recon_ppm AS BIGINT) AS recon_ppm
       |FROM (SELECT DISTINCT q_id FROM topf) b
       |LEFT JOIN m${bigM}hits h USING (q_id)
       |LEFT JOIN m${bigM}qerr e USING (q_id)
       |CROSS JOIN m${bigM}rstat s""".stripMargin

  val pqQuantizeSql: String =
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id, emb FROM v WHERE vec_id >= $NQueries),
       |rankedf AS (
       |  SELECT q.q_id, c.vec_id, ${cos6Sql("c.emb", "q.q_emb")} AS cos,
       |    row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("c.emb", "q.q_emb")} DESC, c.vec_id) AS rank
       |  FROM c, q),
       |topf AS (SELECT q_id, vec_id, cos FROM rankedf WHERE rank <= $K),
       |${PqMs.map(pqCtes).mkString(",\n")}
       |${PqMs.map(pqSelect).mkString("\nUNION ALL\n")}
       |ORDER BY method, q_id""".stripMargin

  // ---------------------------------------------------------------- №160 knn_ivf_pq
  /** IVF-PQ search with ASYMMETRIC distance (ADC — Jégou et al. 2011
    * §IV): the composition a production vector store actually runs at
    * 100 TB, built from the repo's own parts — №27's IVF cells prune the
    * corpus to the probed cells, №121's per-subspace codebooks compress
    * each candidate to M byte codes, and the query scores candidates
    * WITHOUT touching float vectors: per subspace, the float query
    * precomputes a [[PqCodebook]]-entry LOOKUP TABLE (round(dot(q_m,
    * codeword), 6) — the deterministic sequential fold), and a
    * candidate's score is the M-term LUT sum for its codes. The float
    * corpus never loads at query time; an optional EXACT re-rank then
    * rescored only the top [[RerankR]] shortlist per query with true
    * cosine (the standard two-stage ADC + re-rank).
    *
    * Scale shape (the plan the operator is FOR): index build is ONE
    * aggregation pass — cell AND all M codes resolve in a single
    * map-side-combining max_by aggregation against one broadcast
    * codebook union (centroids tagged m = −1), never a join of two
    * corpus-sized frames. Query time: candidate generation is a
    * broadcast equi-join of the codes frame against the (queries ×
    * probe) cell list; scoring is M broadcast equi-joins against the
    * (queries × codebook) LUTs — NO shuffle touches the corpus until
    * the bounded grouped top-k; the re-rank joins the tiny shortlist
    * BROADCAST into one corpus scan. PlanRegressionSpec pins: every
    * corpus-side join is broadcast, zero data exchanges before top-k.
    *
    * Measured honestly (the №27c discipline): per (M, query) the row
    * carries hits@[[K]] of ADC alone, of ADC + exact re-rank, AND of
    * exact scoring over the same probed cells (n_hits_ivf — the probe
    * ceiling), all vs the FLOAT gold top-K — so the PQ-attributable
    * loss (ivf − rr), the re-rank's recovery (rr − adc), and the probe
    * ceiling are separately readable. All integer/6dp-deterministic:
    * oracle reproduces every code, LUT entry, and rank. */
  val RerankR: Int = 4 * K

  /** Subvector slice m of an M-way split over d dims (last slice takes
    * the remainder). */
  private def subCol(src: Column, m: Int, bigM: Int, d: Int): Column = {
    val w = d / bigM
    val lo = m * w + 1
    if (m < bigM - 1) slice(src, lo, w) else slice(src, lo, d - m * w)
  }

  /** ONE-pass IVF-PQ encode: (vec_id, emb) → (vec_id, cell,
    * code_0..code_{M-1}) in a single max_by aggregation against the
    * broadcast model union (m = −1 rows are the IVF centroids, m ≥ 0 the
    * subspace codebooks). Shared by №160 (in-memory model) and №162 (the
    * persisted frozen model) — the encode semantics cannot fork. */
  private[graft] def encodeCells(src: DataFrame, cbAll: DataFrame, bigM: Int, d: Int): DataFrame = {
    val subbed = (0 until bigM).foldLeft(src) { (df, m) =>
      df.withColumn(s"sub_$m", subCol(col("emb"), m, bigM, d))
    }
    val scos = (0 until bigM).foldLeft(
      when(col("m") === -1, cosine6(col("emb"), col("c_emb")))) { (acc, m) =>
      acc.when(col("m") === m, cosine6(col(s"sub_$m"), col("c_emb")))
    }
    val aggs = expr("max_by(c_id, struct(scos, -c_id)) FILTER (WHERE m = -1)").as("cell") +:
      (0 until bigM).map(m =>
        expr(s"max_by(c_id, struct(scos, -c_id)) FILTER (WHERE m = $m)").as(s"code_$m"))
    subbed.join(broadcast(cbAll))
      .withColumn("scos", scos)
      .groupBy(col("vec_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  def knnIvfPq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = graft.CacheRegistry.track(v.filter(col("vec_id") >= NQueries).persist())
    val gold = graft.CacheRegistry.track(
      knnBrute(spark, dir).select(col("q_id"), col("vec_id")).persist())

    // shared sample: centroids AND every subspace codebook slice from ONE
    // driver-side collect (refinedCentroids' contract at k = Centroids)
    val full = hashSample(corpus)
    val d = full.headOption.map(_.length).getOrElse(0)
    val centroids = lloydRefine(full, Centroids).toSeq.toDF("c_id", "c_emb")
    val probes = queries.join(broadcast(centroids))
      .select(col("q_id"), col("q_emb"), col("c_id"), cosine6(col("q_emb"), col("c_emb")).as("qcos"))
      .groupBy(col("q_id"))
      .agg(first(col("q_emb")).as("q_emb"),
        graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), Probe).as("top"))
      .select(col("q_id"), col("q_emb"), explode(col("top.id")).as("cell"))

    val perM = PqMs.map { bigM =>
      val w = d / bigM
      val cbs = (0 until bigM).map { m =>
        val hi = if (m < bigM - 1) (m + 1) * w else d
        lloydRefine(full.map(_.slice(m * w, hi)), PqCodebook).toSeq.toDF("c_id", "c_emb")
      }
      // ONE build pass: centroids ride the same broadcast union as the
      // subspace codebooks (m = −1), so cell + M codes are one hash agg
      val cbAll = (cbs.zipWithIndex.map { case (cb, m) =>
        cb.select(lit(m).as("m"), col("c_id"), col("c_emb"))
      } :+ centroids.select(lit(-1).as("m"), col("c_id"), col("c_emb"))).reduce(_ unionAll _)
      val codes = encodeCells(corpus, cbAll, bigM, d)

      // ADC lookup tables: (queries × codebook) per subspace — broadcast
      val luts = (0 until bigM).map { m =>
        queries.crossJoin(broadcast(cbs(m)))
          .select(col("q_id"), col("c_id").as(s"code_$m"),
            round(graft.functions.VectorOps.dot(subCol(col("q_emb"), m, bigM, d), col("c_emb")) + lit(1e-9), 6)
              .as(s"part_$m"))
      }
      val cand = (0 until bigM).foldLeft(
        codes.join(broadcast(probes.select(col("q_id"), col("cell"))), "cell")) { (df, m) =>
        df.join(broadcast(luts(m)), Seq("q_id", s"code_$m"))
      }
      val adcExpr = round((0 until bigM).map(m => col(s"part_$m")).reduce(_ + _) + lit(1e-9), 6)
      val scored = graft.CacheRegistry.track(
        cand.select(col("q_id"), col("vec_id"), adcExpr.as("adc")).persist())
      val topAdc = topKRanked(scored, "q_id", "adc", "vec_id", K).select(col("q_id"), col("vec_id"))
      // exact re-rank of the bounded shortlist: broadcast into ONE corpus scan
      val shortlist = topKRanked(scored, "q_id", "adc", "vec_id", RerankR)
        .select(col("q_id"), col("vec_id"))
      val rescored = corpus.join(broadcast(shortlist), "vec_id")
        .join(broadcast(queries), "q_id")
        .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
      val topRr = topKRanked(rescored, "q_id", "cos", "vec_id", K).select(col("q_id"), col("vec_id"))
      // the probe ceiling: exact scoring over the SAME probed cells
      val topIvf = topKRanked(
        codes.select(col("vec_id"), col("cell"))
          .join(corpus, "vec_id")
          .join(broadcast(probes), "cell")
          .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos")),
        "q_id", "cos", "vec_id", K).select(col("q_id"), col("vec_id"))
      // hit rollups are workload-bounded (≤ NQueries·K rows) — broadcast
      // them so the grading tail never plans a sort-merge exchange
      def hitsOf(top: DataFrame, name: String): DataFrame =
        gold.join(broadcast(top), Seq("q_id", "vec_id")).groupBy(col("q_id")).agg(count(lit(1)).as(name))
      queries.select(col("q_id"))
        .join(broadcast(hitsOf(topAdc, "h_adc")), Seq("q_id"), "left")
        .join(broadcast(hitsOf(topRr, "h_rr")), Seq("q_id"), "left")
        .join(broadcast(hitsOf(topIvf, "h_ivf")), Seq("q_id"), "left")
        .select(lit(s"ivfpq_m$bigM").as("method"), col("q_id"),
          coalesce(col("h_adc"), lit(0L)).as("n_hits_adc"),
          coalesce(col("h_rr"), lit(0L)).as("n_hits_rr"),
          coalesce(col("h_ivf"), lit(0L)).as("n_hits_ivf"),
          round(coalesce(col("h_adc"), lit(0L)).cast("double") / K + 1e-9, 6).as("recall_adc"),
          round(coalesce(col("h_rr"), lit(0L)).cast("double") / K + 1e-9, 6).as("recall_rr"),
          round(coalesce(col("h_ivf"), lit(0L)).cast("double") / K + 1e-9, 6).as("recall_ivf"))
    }
    perM.reduce(_ unionAll _).orderBy(col("method"), col("q_id"))
  }

  /** Per-geometry oracle CTEs for [[knnIvfPqSql]]. */
  private def ivfPqCtes(bigM: Int): String = {
    val p = s"ip$bigM"
    def subOf(src: String, m: Int): String = {
      val w = s"(len($src) // $bigM)"
      if (m < bigM - 1) s"list_slice($src, $m * $w + 1, ${m + 1} * $w)"
      else s"list_slice($src, ${bigM - 1} * $w + 1, len($src))"
    }
    val subs = (0 until bigM).map(m =>
      s"${p}s$m AS (SELECT vec_id, ${subOf("emb", m)} AS emb FROM c)").mkString(",\n")
    val cents = (0 until bigM).map(m =>
      refinedCentSql(s"${p}s$m", s"${p}k${m}_", PqCodebook)).mkString(",\n")
    val codeCtes = (0 until bigM).map { m =>
      s"""${p}c$m AS (
         |  SELECT vec_id, c_id AS code_$m FROM (
         |    SELECT s.vec_id, a.c_id,
         |      row_number() OVER (PARTITION BY s.vec_id ORDER BY ${cos6Sql("s.emb", "a.c_emb")} DESC, a.c_id) AS rk
         |    FROM ${p}s$m s, ${p}k${m}_cent a) x WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    val lutCtes = (0 until bigM).map { m =>
      s"""${p}l$m AS (
         |  SELECT q.q_id, a.c_id AS code_$m,
         |    round(list_sum(list_transform(range(1, len(${subOf("q.q_emb", m)})+1),
         |      i -> CAST((${subOf("q.q_emb", m)})[i] AS DOUBLE) * CAST(a.c_emb[i] AS DOUBLE))) + 0.000000001, 6) AS part_$m
         |  FROM q, ${p}k${m}_cent a)""".stripMargin
    }.mkString(",\n")
    val codeJoin = (1 until bigM).foldLeft(s"${p}c0")((acc, m) => s"$acc JOIN ${p}c$m USING (vec_id)")
    val lutJoin = (0 until bigM).map(m => s"JOIN ${p}l$m USING (q_id, code_$m)").mkString(" ")
    val adcSum = (0 until bigM).map(m => s"part_$m").mkString(" + ")
    s"""$subs,
       |$cents,
       |$codeCtes,
       |$lutCtes,
       |${p}codes AS (SELECT * FROM $codeJoin),
       |${p}cand AS (
       |  SELECT pr.q_id, cd.vec_id, round($adcSum + 0.000000001, 6) AS adc
       |  FROM ${p}codes cd JOIN cells ON cells.vec_id = cd.vec_id
       |  JOIN probes pr ON pr.cell = cells.cell $lutJoin),
       |${p}adcr AS (
       |  SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) AS rank
       |  FROM ${p}cand),
       |${p}topadc AS (SELECT q_id, vec_id FROM ${p}adcr WHERE rank <= $K),
       |${p}short AS (SELECT q_id, vec_id FROM ${p}adcr WHERE rank <= $RerankR),
       |${p}rr AS (
       |  SELECT s.q_id, s.vec_id,
       |    row_number() OVER (PARTITION BY s.q_id ORDER BY ${cos6Sql("c.emb", "q.q_emb")} DESC, s.vec_id) AS rank
       |  FROM ${p}short s JOIN c ON c.vec_id = s.vec_id JOIN q ON q.q_id = s.q_id),
       |${p}toprr AS (SELECT q_id, vec_id FROM ${p}rr WHERE rank <= $K),
       |${p}ha AS (SELECT g.q_id, count(*) AS h FROM gold g JOIN ${p}topadc t USING (q_id, vec_id) GROUP BY g.q_id),
       |${p}hr AS (SELECT g.q_id, count(*) AS h FROM gold g JOIN ${p}toprr t USING (q_id, vec_id) GROUP BY g.q_id)""".stripMargin
  }

  private def ivfPqSelect(bigM: Int): String = {
    val p = s"ip$bigM"
    s"""SELECT 'ivfpq_m$bigM' AS method, b.q_id,
       |  coalesce(a.h, 0) AS n_hits_adc, coalesce(r.h, 0) AS n_hits_rr, coalesce(iv.h, 0) AS n_hits_ivf,
       |  round(CAST(coalesce(a.h, 0) AS DOUBLE) / $K + 0.000000001, 6) AS recall_adc,
       |  round(CAST(coalesce(r.h, 0) AS DOUBLE) / $K + 0.000000001, 6) AS recall_rr,
       |  round(CAST(coalesce(iv.h, 0) AS DOUBLE) / $K + 0.000000001, 6) AS recall_ivf
       |FROM (SELECT DISTINCT q_id FROM gold) b
       |LEFT JOIN ${p}ha a USING (q_id)
       |LEFT JOIN ${p}hr r USING (q_id)
       |LEFT JOIN hivf iv USING (q_id)""".stripMargin
  }

  val knnIvfPqSql: String =
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id, emb FROM v WHERE vec_id >= $NQueries),
       |goldr AS (
       |  SELECT q.q_id, c.vec_id,
       |    row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("c.emb", "q.q_emb")} DESC, c.vec_id) AS rank
       |  FROM c, q),
       |gold AS (SELECT q_id, vec_id FROM goldr WHERE rank <= $K),
       |${refinedCentSql("c", "")},
       |cells AS (
       |  SELECT vec_id, c_id AS cell FROM (
       |    SELECT c.vec_id, cent.c_id,
       |      row_number() OVER (PARTITION BY c.vec_id ORDER BY ${cos6Sql("c.emb", "cent.c_emb")} DESC, cent.c_id) AS crank
       |    FROM c, cent) x WHERE crank = 1),
       |probes AS (
       |  SELECT q_id, c_id AS cell FROM (
       |    SELECT q.q_id, cent.c_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "cent.c_emb")} DESC, cent.c_id) AS prank
       |    FROM q, cent) x WHERE prank <= $Probe),
       |ivfr AS (
       |  SELECT pr.q_id, cells.vec_id,
       |    row_number() OVER (PARTITION BY pr.q_id ORDER BY ${cos6Sql("cc.emb", "qq.q_emb")} DESC, cells.vec_id) AS rank
       |  FROM cells JOIN probes pr USING (cell)
       |  JOIN c cc ON cc.vec_id = cells.vec_id JOIN q qq ON qq.q_id = pr.q_id),
       |topivf AS (SELECT q_id, vec_id FROM ivfr WHERE rank <= $K),
       |hivf AS (SELECT g.q_id, count(*) AS h FROM gold g JOIN topivf t USING (q_id, vec_id) GROUP BY g.q_id),
       |${PqMs.map(ivfPqCtes).mkString(",\n")}
       |${PqMs.map(ivfPqSelect).mkString("\nUNION ALL\n")}
       |ORDER BY method, q_id""".stripMargin

  /** Driver-side residual sample: the engines' exact assignment rule
    * (strict > keeps the LOWEST cid on rounded ties) + round6-narrowed
    * component difference — residual codebooks must train on exactly
    * what the corpus encodes. Shared by №166 and №169. */
  private def residSampleOf(full: Array[Array[Float]],
      cents: Array[(Long, Array[Float])]): Array[Array[Float]] = {
    def nearestCent(e: Array[Float]): Array[Float] = {
      var bestCos = Double.NegativeInfinity; var best: Array[Float] = null
      cents.foreach { case (_, cemb) =>
        val c = cos6Local(e, cemb)
        if (c > bestCos) { bestCos = c; best = cemb }
      }
      best
    }
    def sub6(x: Array[Float], c: Array[Float]): Array[Float] =
      Array.tabulate(x.length)(i => round6(x(i).toDouble - c(i).toDouble + 1e-9).toFloat)
    full.map(e => sub6(e, nearestCent(e)))
  }

  // ---------------------------------------------------------------- №166 knn_ivf_pq_res
  /** RESIDUAL-encoded IVF-PQ (Jégou et al. 2011 §IV.A) — №160's serving
    * shape with the encoding that gives production IVF-PQ most of its
    * fidelity: PQ codes the RESIDUAL x − centroid(cell(x)), not the raw
    * subvector. Raw-subvector PQ under a corpus-GLOBAL codebook must
    * spend its 16 codewords covering the whole space; residuals are
    * centered near zero with most of the coarse structure already
    * explained by the cell, so the same 16 codewords quantize a much
    * tighter distribution — №160's measured recon_ppm (~0.40–0.51) and
    * its ADC-vs-probe-ceiling gap are both symptoms this variant
    * addresses, and the row publishes the uplift (recon_ppm + recall_adc,
    * same grading discipline) side by side with №160's numbers.
    *
    * ADC decomposes exactly: dot(q, cemb + recon_residual) =
    * dot(q, cemb) + Σ_m dot(q_m, codeword_m) — one extra per-(query,
    * probed-cell) LUT term (the tiny probes frame), the per-subspace
    * LUTs unchanged in shape. Assignment metric, sampling, tie-breaks,
    * and 6dp discipline are №160's verbatim, so the measured uplift
    * isolates RESIDUAL ENCODING (the one changed variable).
    *
    * Scale shape: one extra corpus aggregation vs №160 — cell + residual
    * resolve first (broadcast centroids + max_by agg), then all M codes
    * in the second broadcast-union agg; the encode cost is the honest
    * price of conditioning codes on cells. Corpus-side joins stay
    * broadcast-only; emb/cemb ride the aggs (first()) so no corpus-sized
    * equi-join ever plans. Residual components and reconstructions are
    * round6-narrowed floats in BOTH engines, keeping every code, LUT
    * entry and rank oracle-exact. */
  def knnIvfPqRes(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = graft.CacheRegistry.track(v.filter(col("vec_id") >= NQueries).persist())
    val gold = graft.CacheRegistry.track(
      knnBrute(spark, dir).select(col("q_id"), col("vec_id")).persist())

    val full = hashSample(corpus)
    val d = full.headOption.map(_.length).getOrElse(0)
    val cents = lloydRefine(full, Centroids)
    val centroids = cents.toSeq.toDF("c_id", "c_emb")

    val residSample = residSampleOf(full, cents)

    // stage 1 (M-independent): cell + centroid + residual per vector in
    // ONE broadcast join + max_by aggregation; emb/cemb ride the agg so
    // no corpus-sized equi-join is ever planned
    val withCell = graft.CacheRegistry.track(
      corpus.join(broadcast(centroids))
        .withColumn("ccos", cosine6(col("emb"), col("c_emb")))
        .groupBy(col("vec_id"))
        .agg(first(col("emb")).as("emb"),
          expr("max_by(c_id, struct(ccos, -c_id))").as("cell"),
          expr("max_by(c_emb, struct(ccos, -c_id))").as("cemb"))
        .withColumn("remb", expr("zip_with(emb, cemb, (x, cc) -> " +
          "CAST(round(CAST(x AS DOUBLE) - CAST(cc AS DOUBLE) + 0.000000001, 6) AS FLOAT))"))
        .persist())
    val probes = queries.join(broadcast(centroids))
      .select(col("q_id"), col("q_emb"), col("c_id"), cosine6(col("q_emb"), col("c_emb")).as("qcos"))
      .groupBy(col("q_id"))
      .agg(first(col("q_emb")).as("q_emb"),
        graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), Probe).as("top"))
      .select(col("q_id"), col("q_emb"), explode(col("top.id")).as("cell"))
    // the residual ADC's extra term: dot(q, centroid) per probed cell
    val qcs = probes
      .join(broadcast(centroids.select(col("c_id").as("cell"), col("c_emb"))), "cell")
      .select(col("q_id"), col("cell"),
        round(graft.functions.VectorOps.dot(col("q_emb"), col("c_emb")) + lit(1e-9), 6).as("qc"))

    val perM = PqMs.map { bigM =>
      val w = d / bigM
      val cbs = (0 until bigM).map { m =>
        val hi = if (m < bigM - 1) (m + 1) * w else d
        lloydRefine(residSample.map(_.slice(m * w, hi)), PqCodebook).toSeq.toDF("c_id", "c_emb")
      }
      val cbAll = cbs.zipWithIndex.map { case (cb, m) =>
        cb.select(lit(m).as("m"), col("c_id"), col("c_emb"))
      }.reduce(_ unionAll _)
      // stage 2: all M residual codes in one broadcast-union agg; emb,
      // cemb and the codeword embeddings ride along for reconstruction
      val subbed = (0 until bigM).foldLeft(
        withCell.select(col("vec_id"), col("cell"), col("emb"), col("cemb"), col("remb"))) { (df, m) =>
        df.withColumn(s"sub_$m", subCol(col("remb"), m, bigM, d))
      }
      // nanvl → UndefCos: a zero residual subvector's cosine is NaN in
      // the JVM but NULL in DuckDB (sorts last, ties to lowest c_id) —
      // the sentinel reproduces the NULL semantics (see cos6Local)
      val scos = (1 until bigM).foldLeft(
        when(col("m") === 0, nanvl(cosine6(col("sub_0"), col("c_emb")), lit(UndefCos)))) { (acc, m) =>
        acc.when(col("m") === m, nanvl(cosine6(col(s"sub_$m"), col("c_emb")), lit(UndefCos)))
      }
      val aggs = Seq(first(col("cell")).as("cell"), first(col("emb")).as("emb"),
        first(col("cemb")).as("cemb")) ++
        (0 until bigM).flatMap(m => Seq(
          expr(s"max_by(c_id, struct(scos, -c_id)) FILTER (WHERE m = $m)").as(s"code_$m"),
          expr(s"max_by(c_emb, struct(scos, -c_id)) FILTER (WHERE m = $m)").as(s"cw_$m")))
      val codes = graft.CacheRegistry.track(
        subbed.join(broadcast(cbAll))
          .withColumn("scos", scos)
          .groupBy(col("vec_id"))
          .agg(aggs.head, aggs.tail: _*)
          .persist())

      val luts = (0 until bigM).map { m =>
        queries.crossJoin(broadcast(cbs(m)))
          .select(col("q_id"), col("c_id").as(s"code_$m"),
            round(graft.functions.VectorOps.dot(subCol(col("q_emb"), m, bigM, d), col("c_emb")) + lit(1e-9), 6)
              .as(s"part_$m"))
      }
      val cand = (0 until bigM).foldLeft(
        codes.join(broadcast(probes.select(col("q_id"), col("cell"))), "cell")) { (df, m) =>
        df.join(broadcast(luts(m)), Seq("q_id", s"code_$m"))
      }.join(broadcast(qcs), Seq("q_id", "cell"))
      val adcExpr = round(col("qc") + (0 until bigM).map(m => col(s"part_$m")).reduce(_ + _) + lit(1e-9), 6)
      val scored = graft.CacheRegistry.track(
        cand.select(col("q_id"), col("vec_id"), adcExpr.as("adc")).persist())
      val topAdc = topKRanked(scored, "q_id", "adc", "vec_id", K).select(col("q_id"), col("vec_id"))
      val shortlist = topKRanked(scored, "q_id", "adc", "vec_id", RerankR)
        .select(col("q_id"), col("vec_id"))
      val rescored = corpus.join(broadcast(shortlist), "vec_id")
        .join(broadcast(queries), "q_id")
        .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
      val topRr = topKRanked(rescored, "q_id", "cos", "vec_id", K).select(col("q_id"), col("vec_id"))
      // probe ceiling: exact scoring over the SAME probed cells (№160's)
      val topIvf = topKRanked(
        withCell.select(col("vec_id"), col("cell"), col("emb"))
          .join(broadcast(probes), "cell")
          .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos")),
        "q_id", "cos", "vec_id", K).select(col("q_id"), col("vec_id"))
      // reconstruction fidelity: centroid + concatenated residual codewords
      val reconStat = codes
        .withColumn("rrec", concat((0 until bigM).map(m => col(s"cw_$m")): _*))
        .withColumn("recon", expr("zip_with(cemb, rrec, (cc, r) -> " +
          "CAST(round(CAST(cc AS DOUBLE) + CAST(r AS DOUBLE) + 0.000000001, 6) AS FLOAT))"))
        .select(cosine6(col("recon"), col("emb")).as("c6"))
        .select(expr("CAST(round(c6 * 1000000, 0) AS BIGINT)").as("ppm"))
        .groupBy()
        .agg(expr("sum(ppm) DIV count(1)").as("recon_ppm"))
      def hitsOf(top: DataFrame, name: String): DataFrame =
        gold.join(broadcast(top), Seq("q_id", "vec_id")).groupBy(col("q_id")).agg(count(lit(1)).as(name))
      queries.select(col("q_id"))
        .join(broadcast(hitsOf(topAdc, "h_adc")), Seq("q_id"), "left")
        .join(broadcast(hitsOf(topRr, "h_rr")), Seq("q_id"), "left")
        .join(broadcast(hitsOf(topIvf, "h_ivf")), Seq("q_id"), "left")
        .crossJoin(broadcast(reconStat))
        .select(lit(s"ivfpqres_m$bigM").as("method"), col("q_id"),
          coalesce(col("h_adc"), lit(0L)).as("n_hits_adc"),
          coalesce(col("h_rr"), lit(0L)).as("n_hits_rr"),
          coalesce(col("h_ivf"), lit(0L)).as("n_hits_ivf"),
          round(coalesce(col("h_adc"), lit(0L)).cast("double") / K + 1e-9, 6).as("recall_adc"),
          round(coalesce(col("h_rr"), lit(0L)).cast("double") / K + 1e-9, 6).as("recall_rr"),
          round(coalesce(col("h_ivf"), lit(0L)).cast("double") / K + 1e-9, 6).as("recall_ivf"),
          col("recon_ppm"))
    }
    perM.reduce(_ unionAll _).orderBy(col("method"), col("q_id"))
  }

  /** Temporary №166 diagnostic: dump withCell/codes/codebooks for M=2. */
  private[graft] def debugResDump(spark: SparkSession, dir: String, out: String): Unit = {
    import spark.implicits._
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val corpus = graft.CacheRegistry.track(v.filter(col("vec_id") >= NQueries).persist())
    val full = hashSample(corpus)
    val d = full.headOption.map(_.length).getOrElse(0)
    val cents = lloydRefine(full, Centroids)
    val centroids = cents.toSeq.toDF("c_id", "c_emb")
    def nearestCent(e: Array[Float]): Array[Float] = {
      var bestCos = Double.NegativeInfinity; var best: Array[Float] = null
      cents.foreach { case (_, cemb) =>
        val c = cos6Local(e, cemb)
        if (c > bestCos) { bestCos = c; best = cemb }
      }
      best
    }
    def sub6(x: Array[Float], c: Array[Float]): Array[Float] =
      Array.tabulate(x.length)(i => round6(x(i).toDouble - c(i).toDouble + 1e-9).toFloat)
    val residSample = full.map(e => sub6(e, nearestCent(e)))
    val bigM = 2
    val w = d / bigM
    val cbs = (0 until bigM).map { m =>
      val hi = if (m < bigM - 1) (m + 1) * w else d
      lloydRefine(residSample.map(_.slice(m * w, hi)), PqCodebook).toSeq.toDF("c_id", "c_emb")
    }
    val withCell = corpus.join(broadcast(centroids))
      .withColumn("ccos", cosine6(col("emb"), col("c_emb")))
      .groupBy(col("vec_id"))
      .agg(first(col("emb")).as("emb"),
        expr("max_by(c_id, struct(ccos, -c_id))").as("cell"),
        expr("max_by(c_emb, struct(ccos, -c_id))").as("cemb"))
      .withColumn("remb", expr("zip_with(emb, cemb, (x, cc) -> " +
        "CAST(round(CAST(x AS DOUBLE) - CAST(cc AS DOUBLE) + 0.000000001, 6) AS FLOAT))"))
    withCell.write.mode("overwrite").parquet(s"$out/withcell")
    centroids.write.mode("overwrite").parquet(s"$out/centroids")
    cbs(0).write.mode("overwrite").parquet(s"$out/cb0")
    cbs(1).write.mode("overwrite").parquet(s"$out/cb1")
    // the residual SAMPLE itself (driver view), with its rank
    residSample.zipWithIndex.map { case (r, i) => (i + 1, r.toSeq) }.toSeq
      .toDF("rk", "remb").write.mode("overwrite").parquet(s"$out/residsample")
    ()
  }

  /** Per-geometry oracle CTEs for [[knnIvfPqResSql]] — №160's chain with
    * residual sources: slices cut `rc.remb`, codebooks train on the same
    * md5-ordered sample of the RESIDUAL corpus, the candidate score adds
    * the per-(query, cell) centroid term, and the reconstruction is
    * centroid + concatenated codewords. */
  private def ivfPqResCtes(bigM: Int): String = {
    val p = s"ir$bigM"
    def subOf(src: String, m: Int): String = {
      val w = s"(len($src) // $bigM)"
      if (m < bigM - 1) s"list_slice($src, $m * $w + 1, ${m + 1} * $w)"
      else s"list_slice($src, ${bigM - 1} * $w + 1, len($src))"
    }
    val subs = (0 until bigM).map(m =>
      s"${p}s$m AS (SELECT vec_id, ${subOf("remb", m)} AS emb FROM rc)").mkString(",\n")
    val cents = (0 until bigM).map(m =>
      refinedCentSql(s"${p}s$m", s"${p}k${m}_", PqCodebook)).mkString(",\n")
    val codeCtes = (0 until bigM).map { m =>
      s"""${p}c$m AS (
         |  SELECT vec_id, c_id AS code_$m, c_emb AS e$m FROM (
         |    SELECT s.vec_id, a.c_id, a.c_emb,
         |      row_number() OVER (PARTITION BY s.vec_id ORDER BY ${cos6Sql("s.emb", "a.c_emb")} DESC, a.c_id) AS rk
         |    FROM ${p}s$m s, ${p}k${m}_cent a) x WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    val lutCtes = (0 until bigM).map { m =>
      s"""${p}l$m AS (
         |  SELECT q.q_id, a.c_id AS code_$m,
         |    round(list_sum(list_transform(range(1, len(${subOf("q.q_emb", m)})+1),
         |      i -> CAST((${subOf("q.q_emb", m)})[i] AS DOUBLE) * CAST(a.c_emb[i] AS DOUBLE))) + 0.000000001, 6) AS part_$m
         |  FROM q, ${p}k${m}_cent a)""".stripMargin
    }.mkString(",\n")
    val codeJoin = (1 until bigM).foldLeft(s"${p}c0")((acc, m) => s"$acc JOIN ${p}c$m USING (vec_id)")
    val lutJoin = (0 until bigM).map(m => s"JOIN ${p}l$m USING (q_id, code_$m)").mkString(" ")
    val adcSum = (0 until bigM).map(m => s"part_$m").mkString(" + ")
    val cat = (0 until bigM).map(m => s"e$m").mkString(" || ")
    s"""$subs,
       |$cents,
       |$codeCtes,
       |$lutCtes,
       |${p}codes AS (SELECT * FROM $codeJoin),
       |${p}cand AS (
       |  SELECT pr.q_id, cd.vec_id, round(qc.qc + $adcSum + 0.000000001, 6) AS adc
       |  FROM ${p}codes cd JOIN rc ON rc.vec_id = cd.vec_id
       |  JOIN probes pr ON pr.cell = rc.cell $lutJoin
       |  JOIN qcell qc ON qc.q_id = pr.q_id AND qc.cell = rc.cell),
       |${p}adcr AS (
       |  SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) AS rank
       |  FROM ${p}cand),
       |${p}topadc AS (SELECT q_id, vec_id FROM ${p}adcr WHERE rank <= $K),
       |${p}short AS (SELECT q_id, vec_id FROM ${p}adcr WHERE rank <= $RerankR),
       |${p}rr AS (
       |  SELECT s.q_id, s.vec_id,
       |    row_number() OVER (PARTITION BY s.q_id ORDER BY ${cos6Sql("c.emb", "q.q_emb")} DESC, s.vec_id) AS rank
       |  FROM ${p}short s JOIN c ON c.vec_id = s.vec_id JOIN q ON q.q_id = s.q_id),
       |${p}toprr AS (SELECT q_id, vec_id FROM ${p}rr WHERE rank <= $K),
       |${p}rec AS (
       |  SELECT cd.vec_id,
       |    list_transform(range(1, len(rc.cemb) + 1), i ->
       |      CAST(round(CAST(rc.cemb[i] AS DOUBLE) + CAST(($cat)[i] AS DOUBLE) + 0.000000001, 6) AS FLOAT)) AS recon
       |  FROM ${p}codes cd JOIN rc ON rc.vec_id = cd.vec_id),
       |${p}rstat AS (
       |  SELECT CAST(sum(CAST(round(c6 * 1000000, 0) AS BIGINT)) AS BIGINT) // count(*) AS recon_ppm
       |  FROM (
       |    SELECT ${cos6Sql("r.recon", "c.emb")} AS c6
       |    FROM ${p}rec r JOIN c USING (vec_id))),
       |${p}ha AS (SELECT g.q_id, count(*) AS h FROM gold g JOIN ${p}topadc t USING (q_id, vec_id) GROUP BY g.q_id),
       |${p}hr AS (SELECT g.q_id, count(*) AS h FROM gold g JOIN ${p}toprr t USING (q_id, vec_id) GROUP BY g.q_id)""".stripMargin
  }

  private def ivfPqResSelect(bigM: Int): String = {
    val p = s"ir$bigM"
    s"""SELECT 'ivfpqres_m$bigM' AS method, b.q_id,
       |  coalesce(a.h, 0) AS n_hits_adc, coalesce(r.h, 0) AS n_hits_rr, coalesce(iv.h, 0) AS n_hits_ivf,
       |  round(CAST(coalesce(a.h, 0) AS DOUBLE) / $K + 0.000000001, 6) AS recall_adc,
       |  round(CAST(coalesce(r.h, 0) AS DOUBLE) / $K + 0.000000001, 6) AS recall_rr,
       |  round(CAST(coalesce(iv.h, 0) AS DOUBLE) / $K + 0.000000001, 6) AS recall_ivf,
       |  CAST(s.recon_ppm AS BIGINT) AS recon_ppm
       |FROM (SELECT DISTINCT q_id FROM gold) b
       |LEFT JOIN ${p}ha a USING (q_id)
       |LEFT JOIN ${p}hr r USING (q_id)
       |LEFT JOIN hivf iv USING (q_id)
       |CROSS JOIN ${p}rstat s""".stripMargin
  }

  val knnIvfPqResSql: String =
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id, emb FROM v WHERE vec_id >= $NQueries),
       |goldr AS (
       |  SELECT q.q_id, c.vec_id,
       |    row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("c.emb", "q.q_emb")} DESC, c.vec_id) AS rank
       |  FROM c, q),
       |gold AS (SELECT q_id, vec_id FROM goldr WHERE rank <= $K),
       |${refinedCentSql("c", "")},
       |cells AS (
       |  SELECT vec_id, c_id AS cell FROM (
       |    SELECT c.vec_id, cent.c_id,
       |      row_number() OVER (PARTITION BY c.vec_id ORDER BY ${cos6Sql("c.emb", "cent.c_emb")} DESC, cent.c_id) AS crank
       |    FROM c, cent) x WHERE crank = 1),
       |probes AS (
       |  SELECT q_id, c_id AS cell FROM (
       |    SELECT q.q_id, cent.c_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "cent.c_emb")} DESC, cent.c_id) AS prank
       |    FROM q, cent) x WHERE prank <= $Probe),
       |qcell AS (
       |  SELECT pr.q_id, pr.cell,
       |    round(list_sum(list_transform(range(1, len(q.q_emb)+1),
       |      i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(cent.c_emb[i] AS DOUBLE))) + 0.000000001, 6) AS qc
       |  FROM probes pr JOIN q ON q.q_id = pr.q_id JOIN cent ON cent.c_id = pr.cell),
       |rc AS (
       |  SELECT c.vec_id, c.emb, cells.cell, cent.c_emb AS cemb,
       |    list_transform(range(1, len(c.emb)+1), i ->
       |      CAST(round(CAST(c.emb[i] AS DOUBLE) - CAST(cent.c_emb[i] AS DOUBLE) + 0.000000001, 6) AS FLOAT)) AS remb
       |  FROM c JOIN cells ON cells.vec_id = c.vec_id JOIN cent ON cent.c_id = cells.cell),
       |ivfr AS (
       |  SELECT pr.q_id, cells.vec_id,
       |    row_number() OVER (PARTITION BY pr.q_id ORDER BY ${cos6Sql("cc.emb", "qq.q_emb")} DESC, cells.vec_id) AS rank
       |  FROM cells JOIN probes pr USING (cell)
       |  JOIN c cc ON cc.vec_id = cells.vec_id JOIN q qq ON qq.q_id = pr.q_id),
       |topivf AS (SELECT q_id, vec_id FROM ivfr WHERE rank <= $K),
       |hivf AS (SELECT g.q_id, count(*) AS h FROM gold g JOIN topivf t USING (q_id, vec_id) GROUP BY g.q_id),
       |${PqMs.map(ivfPqResCtes).mkString(",\n")}
       |${PqMs.map(ivfPqResSelect).mkString("\nUNION ALL\n")}
       |ORDER BY method, q_id""".stripMargin

  // ---------------------------------------------------------------- №162 knn_ivf_pq_update
  /** The PRODUCTION serving composition at 100 TB — №160's IVF-PQ ADC
    * search over a PERSISTED index with INCREMENTAL maintenance (№72's
    * bucketed layout × №119's arrivals economics × №160's asymmetric
    * scoring, one operator):
    *
    *   - the frozen MODEL (IVF centroids + all M subspace codebooks,
    *     trained on the BASE corpus's hash sample) persists once per
    *     corpus version ([[cachedModel]] — a constant-size table);
    *   - the BASE codes (vec_id, cell, code_0..M−1 — M bytes per vector,
    *     the only per-vector state the store keeps) persist as №72's
    *     bucketed+sorted-on-cell layout, built ONCE and scanned with no
    *     exchange on every subsequent search (plan-pinned);
    *   - daily ARRIVALS encode in one broadcast pass (batch-sized work —
    *     the №119 economics: touch the day's vectors, never the store);
    *   - search = ADC over union(bucketed scan, arrivals) with broadcast
    *     probes + LUTs, then the exact [[RerankR]]-shortlist re-rank.
    *
    * Because per-vector encoding under a FROZEN model is independent,
    * the incremental union ≡ a full re-encode of base ∪ batch under the
    * same model — IvfPqSpec pins row-for-row equality (scores AND
    * ranks), and the oracle computes the full form (model from base, one
    * encode over everything). Output = the re-ranked top-[[K]] with
    * EXACT cosine per hit — the results-shaped row (№119's), not №160's
    * grading-shaped one. Geometry fixed at M = [[PquM]] (the measured
    * better end of №160's curve). */
  val PquM = 4

  /** Bench hook (the [[dropIndexUpdateCaches]] twin): drop №162's
    * persisted model + bucketed code table so the cold first-build cost
    * is measurable as its own artifact number. */
  def dropIvfPqUpdateCaches(spark: SparkSession, dir: String): Unit = {
    Seq(("graft_models", s"graft_ivfpqu_model_${dirKey(dir)}_m$PquM"),
        ("graft_bucketed", s"graft_ivfpqu_codes_${dirKey(dir)}_m$PquM")).foreach {
      case (store, t) =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val path = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), store, t)
        if (java.nio.file.Files.exists(path)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(path).iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
    }
  }

  /** The frozen №162 model table: (m, c_id, c_emb) with m = −1 the IVF
    * centroids, m ∈ [0, M) the subspace codebooks — trained on the BASE
    * sample, persisted build-if-absent. */
  private def ivfPqUpdateModel(spark: SparkSession, dir: String, base: DataFrame): DataFrame =
    cachedModel(spark, s"graft_ivfpqu_model_${dirKey(dir)}_m$PquM") {
      import spark.implicits._
      val full = hashSample(base)
      val d = full.headOption.map(_.length).getOrElse(0)
      val w = d / PquM
      val cents = lloydRefine(full, Centroids).toSeq.toDF("c_id", "c_emb")
        .select(lit(-1).as("m"), col("c_id"), col("c_emb"))
      val cbs = (0 until PquM).map { m =>
        val hi = if (m < PquM - 1) (m + 1) * w else d
        lloydRefine(full.map(_.slice(m * w, hi)), PqCodebook).toSeq.toDF("c_id", "c_emb")
          .select(lit(m).as("m"), col("c_id"), col("c_emb"))
      }
      (cbs :+ cents).reduce(_ unionAll _)
    }

  /** Search over an arbitrary codes frame under the frozen model —
    * shared by the incremental operator and its full-rebuild spec twin. */
  private[graft] def ivfPqSearch(spark: SparkSession, codes: DataFrame, model: DataFrame,
                          corpus: DataFrame, queries: DataFrame, d: Int): DataFrame = {
    val centroids = model.filter(col("m") === -1).select(col("c_id"), col("c_emb"))
    val probes = queries.join(broadcast(centroids))
      .select(col("q_id"), col("q_emb"), col("c_id"), cosine6(col("q_emb"), col("c_emb")).as("qcos"))
      .groupBy(col("q_id"))
      .agg(first(col("q_emb")).as("q_emb"),
        graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), Probe).as("top"))
      .select(col("q_id"), col("q_emb"), explode(col("top.id")).as("cell"))
    val luts = (0 until PquM).map { m =>
      queries.crossJoin(broadcast(model.filter(col("m") === m).select(col("c_id"), col("c_emb"))))
        .select(col("q_id"), col("c_id").as(s"code_$m"),
          round(graft.functions.VectorOps.dot(subCol(col("q_emb"), m, PquM, d), col("c_emb")) + lit(1e-9), 6)
            .as(s"part_$m"))
    }
    val cand = (0 until PquM).foldLeft(
      codes.join(broadcast(probes.select(col("q_id"), col("cell"))), "cell")) { (df, m) =>
      df.join(broadcast(luts(m)), Seq("q_id", s"code_$m"))
    }
    val adcExpr = round((0 until PquM).map(m => col(s"part_$m")).reduce(_ + _) + lit(1e-9), 6)
    val shortlist = topKRanked(
      cand.select(col("q_id"), col("vec_id"), adcExpr.as("adc")),
      "q_id", "adc", "vec_id", RerankR).select(col("q_id"), col("vec_id"))
    val rescored = corpus.join(broadcast(shortlist), "vec_id")
      .join(broadcast(queries), "q_id")
      .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
    topKRanked(rescored, "q_id", "cos", "vec_id", K)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  def knnIvfPqUpdate(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val base = corpus.filter(col("vec_id") % BatchMod =!= 0)
    val batch = corpus.filter(col("vec_id") % BatchMod === 0)
    val model = ivfPqUpdateModel(spark, dir, base)
    val d = model.filter(col("m") === -1).selectExpr("size(c_emb)").head().getInt(0)
    val baseCodes = graft.sources.Bucketing.bucketedCached(
      spark, s"graft_ivfpqu_codes_${dirKey(dir)}_m$PquM", "cell")(
      encodeCells(base, model, PquM, d))
    val arrivals = encodeCells(batch, model, PquM, d)
    ivfPqSearch(spark, baseCodes.unionByName(arrivals), model, corpus, queries, d)
  }

  /** №170's hook: the №162 serving context — frozen model, persisted
    * bucketed base codes, and the pieces the streaming ingest twin needs
    * to encode arrivals and search identically. Returns (model,
    * baseCodes, d, corpus, queries, arrivalVectors). */
  private[graft] def ivfPqIngestContext(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame, Int, DataFrame, DataFrame, DataFrame) = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val base = corpus.filter(col("vec_id") % BatchMod =!= 0)
    val batch = corpus.filter(col("vec_id") % BatchMod === 0)
    val model = ivfPqUpdateModel(spark, dir, base)
    val d = model.filter(col("m") === -1).selectExpr("size(c_emb)").head().getInt(0)
    val baseCodes = graft.sources.Bucketing.bucketedCached(
      spark, s"graft_ivfpqu_codes_${dirKey(dir)}_m$PquM", "cell")(
      encodeCells(base, model, PquM, d))
    (model, baseCodes, d, corpus, queries, batch)
  }

  /** Full-rebuild twin under the same frozen model (the spec's equality
    * counterpart and the oracle's formulation). */
  private[queries] def knnIvfPqUpdateFullRebuild(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val base = corpus.filter(col("vec_id") % BatchMod =!= 0)
    val model = ivfPqUpdateModel(spark, dir, base)
    val d = model.filter(col("m") === -1).selectExpr("size(c_emb)").head().getInt(0)
    ivfPqSearch(spark, encodeCells(corpus, model, PquM, d), model, corpus, queries, d)
  }

  val knnIvfPqUpdateSql: String = {
    val p = "ipu"
    def subOf(src: String, m: Int): String = {
      val w = s"(len($src) // $PquM)"
      if (m < PquM - 1) s"list_slice($src, $m * $w + 1, ${m + 1} * $w)"
      else s"list_slice($src, ${PquM - 1} * $w + 1, len($src))"
    }
    val subs = (0 until PquM).map(m =>
      s"${p}s$m AS (SELECT vec_id, ${subOf("emb", m)} AS emb FROM b)").mkString(",\n")
    val cents = (0 until PquM).map(m =>
      refinedCentSql(s"${p}s$m", s"${p}k${m}_", PqCodebook)).mkString(",\n")
    val codeCtes = (0 until PquM).map { m =>
      s"""${p}c$m AS (
         |  SELECT vec_id, c_id AS code_$m FROM (
         |    SELECT s.vec_id, a.c_id,
         |      row_number() OVER (PARTITION BY s.vec_id ORDER BY ${cos6Sql("s.emb", "a.c_emb")} DESC, a.c_id) AS rk
         |    FROM (SELECT vec_id, ${subOf("emb", m)} AS emb FROM c) s, ${p}k${m}_cent a) x WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    val lutCtes = (0 until PquM).map { m =>
      s"""${p}l$m AS (
         |  SELECT q.q_id, a.c_id AS code_$m,
         |    round(list_sum(list_transform(range(1, len(${subOf("q.q_emb", m)})+1),
         |      i -> CAST((${subOf("q.q_emb", m)})[i] AS DOUBLE) * CAST(a.c_emb[i] AS DOUBLE))) + 0.000000001, 6) AS part_$m
         |  FROM q, ${p}k${m}_cent a)""".stripMargin
    }.mkString(",\n")
    val codeJoin = (1 until PquM).foldLeft(s"${p}c0")((acc, m) => s"$acc JOIN ${p}c$m USING (vec_id)")
    val lutJoin = (0 until PquM).map(m => s"JOIN ${p}l$m USING (q_id, code_$m)").mkString(" ")
    val adcSum = (0 until PquM).map(m => s"part_$m").mkString(" + ")
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id, emb FROM v WHERE vec_id >= $NQueries),
       |b AS (SELECT vec_id, emb FROM c WHERE vec_id % $BatchMod <> 0),
       |${refinedCentSql("b", "")},
       |$subs,
       |$cents,
       |cells AS (
       |  SELECT vec_id, c_id AS cell FROM (
       |    SELECT c.vec_id, cent.c_id,
       |      row_number() OVER (PARTITION BY c.vec_id ORDER BY ${cos6Sql("c.emb", "cent.c_emb")} DESC, cent.c_id) AS crank
       |    FROM c, cent) x WHERE crank = 1),
       |probes AS (
       |  SELECT q_id, c_id AS cell FROM (
       |    SELECT q.q_id, cent.c_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "cent.c_emb")} DESC, cent.c_id) AS prank
       |    FROM q, cent) x WHERE prank <= $Probe),
       |$codeCtes,
       |$lutCtes,
       |${p}codes AS (SELECT * FROM $codeJoin),
       |${p}cand AS (
       |  SELECT pr.q_id, cd.vec_id, round($adcSum + 0.000000001, 6) AS adc
       |  FROM ${p}codes cd JOIN cells ON cells.vec_id = cd.vec_id
       |  JOIN probes pr ON pr.cell = cells.cell $lutJoin),
       |${p}adcr AS (
       |  SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) AS rank
       |  FROM ${p}cand),
       |${p}short AS (SELECT q_id, vec_id FROM ${p}adcr WHERE rank <= $RerankR),
       |${p}rr AS (
       |  SELECT s.q_id, s.vec_id, ${cos6Sql("cc.emb", "qq.q_emb")} AS cos,
       |    row_number() OVER (PARTITION BY s.q_id ORDER BY ${cos6Sql("cc.emb", "qq.q_emb")} DESC, s.vec_id) AS rank
       |  FROM ${p}short s JOIN c cc ON cc.vec_id = s.vec_id JOIN q qq ON qq.q_id = s.q_id)
       |SELECT q_id, vec_id, cos, rank FROM ${p}rr WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- №169 knn_ivf_pq_res_update
  /** №162's production serving shape with №166's RESIDUAL encoding —
    * the composition a store would actually deploy once it adopts the
    * measured-better encoder: the frozen model (IVF centroids + M
    * RESIDUAL-trained subspace codebooks, from the BASE corpus's hash
    * sample residualized under the base centroids) persists once per
    * corpus version; base residual CODES persist as the bucketed-on-cell
    * layout scanned exchange-free into the probe join (plan-pinned);
    * daily arrivals residual-encode in TWO broadcast passes (cell +
    * residual resolve, then codes — №166's honest extra pass, batch-sized
    * here); search = residual ADC (per-(query, probed-cell) centroid dot
    * + LUT sums) + exact shortlist re-rank.
    *
    * Frozen-model independence holds exactly as in №162 — per-vector
    * residual encoding depends only on the vector and the model, so the
    * incremental union ≡ a full re-encode (IvfPqSpec pins scores AND
    * ranks); the oracle computes the full form. Output = №162's
    * results-shaped top-[[K]] with exact cosine. Geometry M = [[PquM]]. */
  def knnIvfPqResUpdate(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val base = corpus.filter(col("vec_id") % BatchMod =!= 0)
    val batch = corpus.filter(col("vec_id") % BatchMod === 0)
    val model = ivfPqResUpdateModel(spark, dir, base)
    val d = model.filter(col("m") === -1).selectExpr("size(c_emb)").head().getInt(0)
    val baseCodes = graft.sources.Bucketing.bucketedCached(
      spark, s"graft_ivfpqru_codes_${dirKey(dir)}_m$PquM", "cell")(
      encodeCellsRes(base, model, PquM, d))
    val arrivals = encodeCellsRes(batch, model, PquM, d)
    ivfPqResSearch(spark, baseCodes.unionByName(arrivals), model, corpus, queries, d)
  }

  /** Full-rebuild twin under the same frozen model (spec equality +
    * the oracle's formulation). */
  private[queries] def knnIvfPqResUpdateFullRebuild(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val base = corpus.filter(col("vec_id") % BatchMod =!= 0)
    val model = ivfPqResUpdateModel(spark, dir, base)
    val d = model.filter(col("m") === -1).selectExpr("size(c_emb)").head().getInt(0)
    ivfPqResSearch(spark, encodeCellsRes(corpus, model, PquM, d), model, corpus, queries, d)
  }

  /** Frozen residual model: centroids from the base sample; codebooks
    * from the base sample's RESIDUALS under those centroids. */
  private def ivfPqResUpdateModel(spark: SparkSession, dir: String, base: DataFrame): DataFrame =
    resModelOf(spark, s"graft_ivfpqru_model_${dirKey(dir)}_m$PquM", base)

  /** [[ivfPqResUpdateModel]] under a caller-chosen cache table (№181
    * trains the same shape over a different base split). */
  private def resModelOf(spark: SparkSession, table: String, base: DataFrame): DataFrame =
    cachedModel(spark, table) {
      import spark.implicits._
      val full = hashSample(base)
      val d = full.headOption.map(_.length).getOrElse(0)
      val w = d / PquM
      val cents = lloydRefine(full, Centroids)
      val residSample = residSampleOf(full, cents)
      val cbs = (0 until PquM).map { m =>
        val hi = if (m < PquM - 1) (m + 1) * w else d
        lloydRefine(residSample.map(_.slice(m * w, hi)), PqCodebook).toSeq.toDF("c_id", "c_emb")
          .select(lit(m).as("m"), col("c_id"), col("c_emb"))
      }
      (cbs :+ cents.toSeq.toDF("c_id", "c_emb")
        .select(lit(-1).as("m"), col("c_id"), col("c_emb"))).reduce(_ unionAll _)
    }

  /** Residual encode of `src` under a frozen model union — №166's two
    * stages as a shared function: cell + residual resolve in one
    * broadcast-centroid agg, then all M codes in one broadcast-codebook
    * agg. Returns (vec_id, cell, code_0..M−1) — the store's per-vector
    * state. */
  private def encodeCellsRes(src: DataFrame, model: DataFrame, bigM: Int, d: Int): DataFrame = {
    val centroids = model.filter(col("m") === -1).select(col("c_id"), col("c_emb"))
    val withCell = src.join(broadcast(centroids))
      .withColumn("ccos", cosine6(col("emb"), col("c_emb")))
      .groupBy(col("vec_id"))
      .agg(expr("max_by(c_id, struct(ccos, -c_id))").as("cell"),
        expr("max_by(c_emb, struct(ccos, -c_id))").as("cemb"),
        first(col("emb")).as("emb"))
      .withColumn("remb", expr("zip_with(emb, cemb, (x, cc) -> " +
        "CAST(round(CAST(x AS DOUBLE) - CAST(cc AS DOUBLE) + 0.000000001, 6) AS FLOAT))"))
    val cbAll = model.filter(col("m") >= 0)
    val subbed = (0 until bigM).foldLeft(
      withCell.select(col("vec_id"), col("cell"), col("remb"))) { (df, m) =>
      df.withColumn(s"sub_$m", subCol(col("remb"), m, bigM, d))
    }
    val scos = (1 until bigM).foldLeft(
      when(col("m") === 0, nanvl(cosine6(col("sub_0"), col("c_emb")), lit(UndefCos)))) { (acc, m) =>
      acc.when(col("m") === m, nanvl(cosine6(col(s"sub_$m"), col("c_emb")), lit(UndefCos)))
    }
    val aggs = first(col("cell")).as("cell") +:
      (0 until bigM).map(m =>
        expr(s"max_by(c_id, struct(scos, -c_id)) FILTER (WHERE m = $m)").as(s"code_$m"))
    subbed.join(broadcast(cbAll))
      .withColumn("scos", scos)
      .groupBy(col("vec_id"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Residual ADC search under a frozen model — [[ivfPqSearch]] plus the
    * per-(query, probed-cell) centroid-dot term. */
  private def ivfPqResSearch(spark: SparkSession, codes: DataFrame, model: DataFrame,
                             corpus: DataFrame, queries: DataFrame, d: Int): DataFrame = {
    val centroids = model.filter(col("m") === -1).select(col("c_id"), col("c_emb"))
    val probes = queries.join(broadcast(centroids))
      .select(col("q_id"), col("q_emb"), col("c_id"), cosine6(col("q_emb"), col("c_emb")).as("qcos"))
      .groupBy(col("q_id"))
      .agg(first(col("q_emb")).as("q_emb"),
        graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), Probe).as("top"))
      .select(col("q_id"), col("q_emb"), explode(col("top.id")).as("cell"))
    val qcs = probes
      .join(broadcast(centroids.select(col("c_id").as("cell"), col("c_emb"))), "cell")
      .select(col("q_id"), col("cell"),
        round(graft.functions.VectorOps.dot(col("q_emb"), col("c_emb")) + lit(1e-9), 6).as("qc"))
    val luts = (0 until PquM).map { m =>
      queries.crossJoin(broadcast(model.filter(col("m") === m).select(col("c_id"), col("c_emb"))))
        .select(col("q_id"), col("c_id").as(s"code_$m"),
          round(graft.functions.VectorOps.dot(subCol(col("q_emb"), m, PquM, d), col("c_emb")) + lit(1e-9), 6)
            .as(s"part_$m"))
    }
    val cand = (0 until PquM).foldLeft(
      codes.join(broadcast(probes.select(col("q_id"), col("cell"))), "cell")) { (df, m) =>
      df.join(broadcast(luts(m)), Seq("q_id", s"code_$m"))
    }.join(broadcast(qcs), Seq("q_id", "cell"))
    val adcExpr = round(col("qc") + (0 until PquM).map(m => col(s"part_$m")).reduce(_ + _) + lit(1e-9), 6)
    val shortlist = topKRanked(
      cand.select(col("q_id"), col("vec_id"), adcExpr.as("adc")),
      "q_id", "adc", "vec_id", RerankR).select(col("q_id"), col("vec_id"))
    val rescored = corpus.join(broadcast(shortlist), "vec_id")
      .join(broadcast(queries), "q_id")
      .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
    topKRanked(rescored, "q_id", "cos", "vec_id", K)
      .select(col("q_id"), col("vec_id"), col("cos"), col("rank"))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Bench hook: drop the persisted residual model + bucketed residual
    * code table (the №162 cold-build discipline for №169). */
  def dropIvfPqResUpdateCaches(spark: SparkSession, dir: String): Unit = {
    Seq(("graft_models", s"graft_ivfpqru_model_${dirKey(dir)}_m$PquM"),
        ("graft_bucketed", s"graft_ivfpqru_codes_${dirKey(dir)}_m$PquM")).foreach {
      case (store, t) =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val path = java.nio.file.Paths.get(
          System.getProperty("java.io.tmpdir"), store, t)
        if (java.nio.file.Files.exists(path)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(path).iterator().asScala.toSeq.reverse
            .foreach(p => java.nio.file.Files.deleteIfExists(p))
        }
    }
  }

  val knnIvfPqResUpdateSql: String = {
    val p = "ipru"
    def subOf(src: String, m: Int): String = {
      val w = s"(len($src) // $PquM)"
      if (m < PquM - 1) s"list_slice($src, $m * $w + 1, ${m + 1} * $w)"
      else s"list_slice($src, ${PquM - 1} * $w + 1, len($src))"
    }
    // residual codebooks train on the BASE sample's residuals; codes for
    // the WHOLE corpus come from the corpus residual frame rc
    val bsubs = (0 until PquM).map(m =>
      s"${p}s$m AS (SELECT vec_id, ${subOf("remb", m)} AS emb FROM brc)").mkString(",\n")
    val cents = (0 until PquM).map(m =>
      refinedCentSql(s"${p}s$m", s"${p}k${m}_", PqCodebook)).mkString(",\n")
    val codeCtes = (0 until PquM).map { m =>
      s"""${p}c$m AS (
         |  SELECT vec_id, c_id AS code_$m FROM (
         |    SELECT s.vec_id, a.c_id,
         |      row_number() OVER (PARTITION BY s.vec_id ORDER BY ${cos6Sql("s.emb", "a.c_emb")} DESC, a.c_id) AS rk
         |    FROM (SELECT vec_id, ${subOf("remb", m)} AS emb FROM rc) s, ${p}k${m}_cent a) x WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    val lutCtes = (0 until PquM).map { m =>
      s"""${p}l$m AS (
         |  SELECT q.q_id, a.c_id AS code_$m,
         |    round(list_sum(list_transform(range(1, len(${subOf("q.q_emb", m)})+1),
         |      i -> CAST((${subOf("q.q_emb", m)})[i] AS DOUBLE) * CAST(a.c_emb[i] AS DOUBLE))) + 0.000000001, 6) AS part_$m
         |  FROM q, ${p}k${m}_cent a)""".stripMargin
    }.mkString(",\n")
    val codeJoin = (1 until PquM).foldLeft(s"${p}c0")((acc, m) => s"$acc JOIN ${p}c$m USING (vec_id)")
    val lutJoin = (0 until PquM).map(m => s"JOIN ${p}l$m USING (q_id, code_$m)").mkString(" ")
    val adcSum = (0 until PquM).map(m => s"part_$m").mkString(" + ")
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id, emb FROM v WHERE vec_id >= $NQueries),
       |b AS (SELECT vec_id, emb FROM c WHERE vec_id % $BatchMod <> 0),
       |${refinedCentSql("b", "")},
       |cells AS (
       |  SELECT vec_id, c_id AS cell FROM (
       |    SELECT c.vec_id, cent.c_id,
       |      row_number() OVER (PARTITION BY c.vec_id ORDER BY ${cos6Sql("c.emb", "cent.c_emb")} DESC, cent.c_id) AS crank
       |    FROM c, cent) x WHERE crank = 1),
       |rc AS (
       |  SELECT c.vec_id,
       |    list_transform(range(1, len(c.emb)+1), i ->
       |      CAST(round(CAST(c.emb[i] AS DOUBLE) - CAST(cent.c_emb[i] AS DOUBLE) + 0.000000001, 6) AS FLOAT)) AS remb,
       |    cells.cell
       |  FROM c JOIN cells ON cells.vec_id = c.vec_id JOIN cent ON cent.c_id = cells.cell),
       |brc AS (SELECT rc.vec_id, rc.remb FROM rc WHERE rc.vec_id % $BatchMod <> 0),
       |probes AS (
       |  SELECT q_id, c_id AS cell FROM (
       |    SELECT q.q_id, cent.c_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "cent.c_emb")} DESC, cent.c_id) AS prank
       |    FROM q, cent) x WHERE prank <= $Probe),
       |qcell AS (
       |  SELECT pr.q_id, pr.cell,
       |    round(list_sum(list_transform(range(1, len(q.q_emb)+1),
       |      i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(cent.c_emb[i] AS DOUBLE))) + 0.000000001, 6) AS qc
       |  FROM probes pr JOIN q ON q.q_id = pr.q_id JOIN cent ON cent.c_id = pr.cell),
       |$bsubs,
       |$cents,
       |$codeCtes,
       |$lutCtes,
       |${p}codes AS (SELECT * FROM $codeJoin),
       |${p}cand AS (
       |  SELECT pr.q_id, cd.vec_id, round(qc.qc + $adcSum + 0.000000001, 6) AS adc
       |  FROM ${p}codes cd JOIN rc ON rc.vec_id = cd.vec_id
       |  JOIN probes pr ON pr.cell = rc.cell $lutJoin
       |  JOIN qcell qc ON qc.q_id = pr.q_id AND qc.cell = rc.cell),
       |${p}adcr AS (
       |  SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) AS rank
       |  FROM ${p}cand),
       |${p}short AS (SELECT q_id, vec_id FROM ${p}adcr WHERE rank <= $RerankR),
       |${p}rr AS (
       |  SELECT s.q_id, s.vec_id, ${cos6Sql("cc.emb", "qq.q_emb")} AS cos,
       |    row_number() OVER (PARTITION BY s.q_id ORDER BY ${cos6Sql("cc.emb", "qq.q_emb")} DESC, s.vec_id) AS rank
       |  FROM ${p}short s JOIN c cc ON cc.vec_id = s.vec_id JOIN q qq ON qq.q_id = s.q_id)
       |SELECT q_id, vec_id, cos, rank FROM ${p}rr WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- №83 embed_knn
  /** Retrieval over the MODEL-FREE embeddings (№82 doc_embed) — the
    * text→vector bridge driven end to end: top-[[K]] cosine neighbours
    * for every doc_id ≡ 0 (mod [[EmbedQEvery]]) query doc over the rest
    * of the corpus, on the feature-hashed integer vectors. The dot
    * products are EXACT 64-bit integer arithmetic (components bounded by
    * 15·n_tok, far under 2^53), so unlike float embeddings the score
    * needs no fold-order discipline — any summation order is bit-equal,
    * and only the final cosine division/sqrt touch floating point
    * (IEEE-identical in both engines, rounded to 6dp before ranking,
    * doc_id tiebreak). Same scale shape as knn_brute: queries broadcast
    * (workload-sized), corpus scanned once, native bounded-heap top-k —
    * ≤K rows per (query, partition) reach the shuffle. */
  val EmbedQEvery = 97

  def embedKnn(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // persisted barrier before the HOF dot-product lambda (§9
    // CollapseProject rule) — also shares the one embedding pass between
    // the query and corpus sides
    // docEmbedVectors only emits docs with >= 1 token (empty docs are
    // excluded upstream), so no zero-norm guard is needed here
    val v = graft.CacheRegistry.track(
      PipelineQueries.docEmbedVectors(spark, dir)
        .select($"doc_id", $"emb_arr", $"norm_sq")
        .persist())
    val queries = v.filter($"doc_id" % EmbedQEvery === 0)
      .select($"doc_id".as("q_id"), $"emb_arr".as("q_emb"), $"norm_sq".as("q_norm"))
    val corpus = v.filter($"doc_id" % EmbedQEvery =!= 0)
    val scored = corpus.join(broadcast(queries))
      .select($"q_id", $"doc_id",
        round(
          aggregate(zip_with($"emb_arr", $"q_emb", (x, y) => x * y), lit(0L), (acc, p) => acc + p)
            .cast("double") /
            (sqrt($"norm_sq".cast("double")) * sqrt($"q_norm".cast("double"))), 6).as("cos"))
    topKRanked(scored, "q_id", "cos", "doc_id", K)
      .select($"q_id", $"doc_id", $"cos", $"rank".cast("int").as("rank"))
      .orderBy($"q_id", $"rank")
  }

  val embedKnnSql: String =
    s"""WITH ${PipelineQueries.embDimsCtesSql},
       |nrm AS (SELECT doc_id, CAST(sum(e*e) AS BIGINT) AS norm_sq FROM e GROUP BY doc_id),
       |dot AS (
       |  SELECT q.doc_id AS q_id, c.doc_id, CAST(sum(c.e * q.e) AS BIGINT) AS dot
       |  FROM e c JOIN e q ON c.j = q.j
       |  WHERE q.doc_id % $EmbedQEvery = 0 AND c.doc_id % $EmbedQEvery <> 0
       |  GROUP BY 1, 2),
       |scored AS (
       |  SELECT d.q_id, d.doc_id,
       |    round(CAST(d.dot AS DOUBLE) / (sqrt(CAST(cn.norm_sq AS DOUBLE)) * sqrt(CAST(qn.norm_sq AS DOUBLE))), 6) AS cos
       |  FROM dot d
       |  JOIN nrm cn ON cn.doc_id = d.doc_id
       |  JOIN nrm qn ON qn.doc_id = d.q_id),
       |ranked AS (
       |  SELECT q_id, doc_id, cos,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, doc_id) AS INTEGER) AS rank
       |  FROM scored)
       |SELECT q_id, doc_id, cos, rank FROM ranked WHERE rank <= $K
       |ORDER BY q_id, rank""".stripMargin

  // ---------------------------------------------------------------- №122 hybrid_search
  /** Reciprocal-rank fusion (public: Cormack & Clarke 2009) of the two
    * retrieval paths — №91's BM25 posting-list ranking and the №83-shaped
    * cosine ranking over the №82 hashed embeddings — for the SAME query
    * docs (doc_id ≡ 0 mod [[TextQueries.QMod]]): the RAG-retrieval fusion
    * step (lexical recall + semantic recall beat either alone; a doc
    * surfacing in both legs outranks a doc topping one).
    *
    * RRF is INTEGER-EXACT here: contribution of rank r is L DIV (60+r)
    * with L = lcm(61..60+K) ([[RrfL]], one Scala val emits both engines'
    * literal), so every reciprocal is an exact BIGINT and the fused score
    * needs no float fold — ties break on doc_id. Both legs keep their
    * standalone semantics (BM25 leg IS №91's output; the embedding leg is
    * the knn_brute broadcast-scan shape over ONE persisted doc_embed
    * pass, self included — the sanity anchor in both legs).
    *
    * Scale shape: the legs are the standalone operators' shapes (posting
    * -list equi-join; queries-broadcast corpus scan + native bounded-heap
    * top-k); fusion itself is WORKLOAD-bounded — ≤ 2K candidate rows per
    * query into one hash agg, and the final ranking window partitions on
    * q_doc over ≤ 2K rows (the keyword_extract justification: bounded
    * per-partition sort, never a global one). */
  val RrfBase = 60
  val FuseK = 10
  /** lcm(61 .. 60+SearchK): every RRF reciprocal L/(60+r) is an exact
    * integer. 142813628717760 for K=10 — fused sums stay far under 2^53,
    * so even a double cast is exact. */
  val RrfL: Long = {
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    (RrfBase + 1 to RrfBase + TextQueries.SearchK)
      .foldLeft(1L)((l, d) => l / gcd(l, d) * d)
  }

  /** The №122 embedding leg as a standalone ranked frame (q_doc, doc_id,
    * rank ≤ SearchK) — shared with №136 retrieval_eval, where it is the
    * GOLD ranking the lexical systems are graded against. */
  private[queries] def embRanked(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // persisted barrier before the HOF dot-product lambda (§9) + one
    // embedding pass shared between query and corpus sides
    val v = graft.CacheRegistry.track(
      PipelineQueries.docEmbedVectors(spark, dir)
        .select($"doc_id", $"emb_arr", $"norm_sq").persist())
    val q = v.filter($"doc_id" % TextQueries.QMod === 0)
      .select($"doc_id".as("q_doc"), $"emb_arr".as("q_emb"), $"norm_sq".as("q_norm"))
    val scored = v.join(broadcast(q))
      .select($"q_doc", $"doc_id",
        round(
          aggregate(zip_with($"emb_arr", $"q_emb", (x, y) => x * y), lit(0L), (acc, p) => acc + p)
            .cast("double") /
            (sqrt($"norm_sq".cast("double")) * sqrt($"q_norm".cast("double"))), 6).as("cos"))
    topKRanked(scored, "q_doc", "cos", "doc_id", TextQueries.SearchK)
      .select($"q_doc", $"doc_id", $"rank")
  }

  def hybridSearch(spark: SparkSession, dir: String): DataFrame =
    hybridFrom(TextQueries.bm25Search(spark, dir), embRanked(spark, dir))

  /** Fusion over two PRE-RANKED legs (q_doc, doc_id, rank) — №122's body,
    * shared with №136 retrieval_eval so the eval's "hybrid" is literally
    * the operator over the same persisted legs (one tf-idf pass and one
    * embedding pass serve gold, bm25 and hybrid alike). */
  private[queries] def hybridFrom(bmRanked: DataFrame, embRankedF: DataFrame): DataFrame = {
    val spark = bmRanked.sparkSession
    import spark.implicits._
    val contrib = expr(s"CAST($RrfL DIV ($RrfBase + rank) AS BIGINT)")
    val bmLeg = bmRanked
      .select($"q_doc", $"doc_id", contrib.as("contrib"),
        $"rank".cast("int").as("bm25_rank"), lit(null).cast("int").as("emb_rank"))
    val embLeg = embRankedF
      .select($"q_doc", $"doc_id", contrib.as("contrib"),
        lit(null).cast("int").as("bm25_rank"), $"rank".cast("int").as("emb_rank"))
    val fused = bmLeg.unionByName(embLeg)
      .groupBy($"q_doc", $"doc_id")
      .agg(sum($"contrib").as("rrf_score"),
        max($"bm25_rank").as("bm25_rank"), max($"emb_rank").as("emb_rank"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"q_doc").orderBy($"rrf_score".desc, $"doc_id")
    fused.withColumn("rank", row_number().over(w))
      .filter($"rank" <= FuseK)
      .select($"q_doc", $"rank", $"doc_id", $"rrf_score", $"bm25_rank", $"emb_rank")
      .orderBy($"q_doc", $"rank")
  }

  /** The №122 CTE chain up to the fused ranked frame `fr` (and the
    * embedding leg `her`) — shared with №136 retrieval_eval. */
  private[queries] val hybridCtesSql: String =
    s"""${TextQueries.bm25CtesSql},
       |${PipelineQueries.embDimsCtesSql},
       |hnrm AS (SELECT doc_id, CAST(sum(e*e) AS BIGINT) AS norm_sq FROM e GROUP BY doc_id),
       |hdot AS (
       |  SELECT q.doc_id AS q_doc, c.doc_id, CAST(sum(c.e * q.e) AS BIGINT) AS dot
       |  FROM e c JOIN e q ON c.j = q.j
       |  WHERE q.doc_id % ${TextQueries.QMod} = 0
       |  GROUP BY 1, 2),
       |hsc AS (
       |  SELECT d.q_doc, d.doc_id,
       |    round(CAST(d.dot AS DOUBLE) / (sqrt(CAST(cn.norm_sq AS DOUBLE)) * sqrt(CAST(qn.norm_sq AS DOUBLE))), 6) AS cos
       |  FROM hdot d
       |  JOIN hnrm cn ON cn.doc_id = d.doc_id
       |  JOIN hnrm qn ON qn.doc_id = d.q_doc),
       |her AS (
       |  SELECT q_doc, doc_id,
       |    row_number() OVER (PARTITION BY q_doc ORDER BY cos DESC, doc_id) AS rank
       |  FROM hsc),
       |legs AS (
       |  SELECT q_doc, doc_id, CAST($RrfL // ($RrfBase + rank) AS BIGINT) AS contrib,
       |    CAST(rank AS INTEGER) AS bm25_rank, CAST(NULL AS INTEGER) AS emb_rank
       |  FROM bmr WHERE rank <= ${TextQueries.SearchK}
       |  UNION ALL
       |  SELECT q_doc, doc_id, CAST($RrfL // ($RrfBase + rank) AS BIGINT) AS contrib,
       |    CAST(NULL AS INTEGER) AS bm25_rank, CAST(rank AS INTEGER) AS emb_rank
       |  FROM her WHERE rank <= ${TextQueries.SearchK}),
       |fused AS (
       |  SELECT q_doc, doc_id, CAST(sum(contrib) AS BIGINT) AS rrf_score,
       |    max(bm25_rank) AS bm25_rank, max(emb_rank) AS emb_rank
       |  FROM legs GROUP BY 1, 2),
       |fr AS (
       |  SELECT q_doc, doc_id, rrf_score, bm25_rank, emb_rank,
       |    row_number() OVER (PARTITION BY q_doc ORDER BY rrf_score DESC, doc_id) AS rank
       |  FROM fused)""".stripMargin

  val hybridSearchSql: String =
    s"""WITH $hybridCtesSql
       |SELECT q_doc, CAST(rank AS INTEGER) AS rank, doc_id, rrf_score, bm25_rank, emb_rank
       |FROM fr WHERE rank <= $FuseK
       |ORDER BY q_doc, rank""".stripMargin

  // ---------------------------------------------------------------- №136 retrieval_eval
  /** Retrieval-quality scorecard — the №27c knn_recall ethos applied to
    * the TEXT retrieval family: №91 bm25_search and №122 hybrid_search
    * graded against the №136-gold = the embedding cosine ranking
    * ([[embRanked]] — the semantic signal), so the table answers "how
    * much semantic recall does lexical retrieval give up, and how much
    * does fusion buy back" with MEASURED numbers, not assertions.
    *
    * Metrics per system: overlap@K (|gold top-K ∩ system top-K| / K;
    * self is a member of both by construction — the shared anchor) and
    * MRR of the top NON-self gold doc in the system's ranking —
    * INTEGER-EXACT via the №122 lcm trick: reciprocal rank = [[MrrL]]
    * DIV rank (L = lcm(1..K) = 2520), summed as exact BIGINTs, one
    * final 6dp division. Every ranking comes from the operator's OWN
    * shared fragment (bm25Search / hybridSearch / embRanked — the
    * filter_agreement discipline), so the eval cannot drift from the
    * operators it grades. Output: 2 rows. */
  val MrrL: Long = {
    @annotation.tailrec
    def gcd(a: Long, b: Long): Long = if (b == 0) a else gcd(b, a % b)
    (1 to TextQueries.SearchK).foldLeft(1L)((l, d) => l / gcd(l, d) * d)
  }

  def retrievalEval(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val gold = graft.CacheRegistry.track(embRanked(spark, dir).persist())
    val w = Window.partitionBy($"q_doc").orderBy($"rank")
    val gold1 = gold.filter($"doc_id" =!= $"q_doc")
      .withColumn("rn", row_number().over(w)).filter($"rn" === 1)
      .select($"q_doc", $"doc_id")
    val qs = gold.select($"q_doc").distinct()
    def evalSys(system: String, sysFrame: DataFrame): DataFrame = {
      val s = graft.CacheRegistry.track(sysFrame.persist())
      val ov = gold.join(s, Seq("q_doc", "doc_id")).groupBy($"q_doc").agg(count(lit(1)).as("ov"))
      val rr = gold1.join(s, Seq("q_doc", "doc_id"), "left")
        .select($"q_doc", coalesce(expr(s"CAST($MrrL DIV rank AS BIGINT)"), lit(0L)).as("rr"))
      qs.join(ov, Seq("q_doc"), "left").join(rr, Seq("q_doc"), "left")
        .agg(count(lit(1)).as("n_queries"),
          sum(coalesce($"ov", lit(0L))).as("sum_ov"),
          sum(coalesce($"rr", lit(0L))).as("sum_rr"))
        .select(lit(system).as("system"), $"n_queries",
          round($"sum_ov".cast("double") / ($"n_queries" * TextQueries.SearchK) + lit(1e-9), 6).as("overlap_at_k"),
          round($"sum_rr".cast("double") / ($"n_queries" * MrrL) + lit(1e-9), 6).as("mrr"))
    }
    // ONE tf-idf pass and one embedding pass serve all three rankings:
    // gold (already persisted above), bm25, and the hybrid built from them
    val bm = graft.CacheRegistry.track(
      TextQueries.bm25Search(spark, dir).select($"q_doc", $"doc_id", $"rank").persist())
    val hy = hybridFrom(bm, gold).select($"q_doc", $"doc_id", $"rank")
    evalSys("bm25", bm).unionByName(evalSys("hybrid", hy)).orderBy($"system")
  }

  val retrievalEvalSql: String = {
    val k = TextQueries.SearchK
    def sys(name: String, cte: String): String =
      s"""re_ov_$name AS (
         |  SELECT g.q_doc, count(*) AS ov
         |  FROM re_gold g JOIN $cte s USING (q_doc, doc_id) GROUP BY 1),
         |re_rr_$name AS (
         |  SELECT g.q_doc, coalesce(CAST(max($MrrL // s.rank) AS BIGINT), 0) AS rr
         |  FROM re_g1 g LEFT JOIN $cte s USING (q_doc, doc_id) GROUP BY 1),
         |re_row_$name AS (
         |  SELECT '$name' AS system, count(*) AS n_queries,
         |    round(CAST(sum(coalesce(o.ov, 0)) AS DOUBLE) / (count(*) * $k) + 0.000000001, 6) AS overlap_at_k,
         |    round(CAST(sum(coalesce(r.rr, 0)) AS DOUBLE) / (count(*) * $MrrL) + 0.000000001, 6) AS mrr
         |  FROM re_qs q LEFT JOIN re_ov_$name o USING (q_doc) LEFT JOIN re_rr_$name r USING (q_doc))""".stripMargin
    s"""WITH $hybridCtesSql,
       |re_gold AS (SELECT q_doc, doc_id, rank FROM her WHERE rank <= $k),
       |re_g1 AS (
       |  SELECT q_doc, doc_id FROM (
       |    SELECT q_doc, doc_id, row_number() OVER (PARTITION BY q_doc ORDER BY rank) AS rn
       |    FROM re_gold WHERE doc_id <> q_doc) WHERE rn = 1),
       |re_qs AS (SELECT DISTINCT q_doc FROM re_gold),
       |re_sb AS (SELECT q_doc, doc_id, rank FROM bmr WHERE rank <= $k),
       |re_sh AS (SELECT q_doc, doc_id, rank FROM fr WHERE rank <= $FuseK),
       |${sys("bm25", "re_sb")},
       |${sys("hybrid", "re_sh")}
       |SELECT * FROM re_row_bm25 UNION ALL SELECT * FROM re_row_hybrid
       |ORDER BY system""".stripMargin
  }

  // ---------------------------------------------------------------- №92 text_cluster
  /** K-means document clustering over the №82 feature-hashed embeddings —
    * the corpus-organization operator (topic buckets, per-cluster
    * curation quotas, diversity sampling for training mixes): [[KmK]]
    * clusters, [[KmIters]] Lloyd iterations, ENTIRELY in exact 64-bit
    * integer arithmetic so both engines agree bit-for-bit:
    * distances are integer Σ(e−c)² (components bounded by 15·n_tok —
    * far under overflow), assignment tiebreak = lowest cluster id on
    * equal distance, and centroid components use FLOOR division realized
    * as `(s − pmod(s, n)) DIV n` — the subtraction makes the dividend
    * exactly divisible, so the quotient is the floor mean regardless of
    * either engine's truncate-vs-floor convention (both installed
    * engines truncate toward zero on negatives; the pmod form pins the
    * semantics rather than trusting that). Seeds = the
    * embeddings of doc_id < K (deterministic); an emptied cluster drops
    * out of later iterations in both engines (standard k-means
    * degeneracy, identical handling). The oracle unrolls the SAME
    * iterations as generated CTEs — one Scala loop emits both sides'
    * iteration count (the graph_centrality discipline).
    *
    * Scale shape: the (doc, dim) frame is persisted ONCE; per iteration
    * the centroid set is a CONSTANT-SIZE broadcast (K×dims rows — the
    * knn_ivf centroid justification), distances are one hash agg on
    * (doc, cluster), assignment one agg on doc, the centroid update one
    * bounded-key agg — O(iters) bounded shuffles, no window over the
    * corpus, nothing corpus-proportional broadcast. */
  val KmK = 8
  val KmIters = 3

  def textCluster(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // Centroid state lives on the DRIVER between iterations — the standard
    // distributed-Lloyd formulation (Spark MLlib's KMeans does the same):
    // the state is CONSTANT-SIZE (K×dims longs, corpus-independent, the
    // knn_ivf centroid-broadcast justification). With centroids as plain
    // constants, every assignment pass is a NARROW projection over the
    // persisted per-doc arrays — argmin over K literal arrays, zero
    // shuffle — and each centroid update is one bounded (cl, dim) hash
    // agg. Everything corpus-sized stays distributed; a recursive frame
    // lineage (whose every reference re-evaluates all earlier
    // iterations) never forms.
    val docArr = graft.CacheRegistry.track(
      PipelineQueries.docEmbedVectors(spark, dir).select($"doc_id", $"emb_arr").persist())
    // (cluster, distance) argmin as one expression over K literal centroids
    def assignCol(cents: Seq[(Long, Seq[Long])]): Column =
      array_min(array(cents.map { case (cl, arr) =>
        struct(
          aggregate(zip_with($"emb_arr", lit(arr.toArray), (x, y) => (x - y) * (x - y)),
            lit(0L), (acc, p) => acc + p).as("d"),
          lit(cl).as("cl"))
      }: _*))
    var cents: Seq[(Long, Seq[Long])] = docArr.filter($"doc_id" < KmK)
      .as[(Long, Seq[Long])].collect().toSeq
    for (_ <- 1 until KmIters)
      cents = docArr.select(assignCol(cents).getField("cl").as("cl"), $"emb_arr")
        .select($"cl", posexplode($"emb_arr").as(Seq("dim", "e")))
        .groupBy($"cl", $"dim")
        .agg(sum($"e").as("s"), count(lit(1)).as("nc"))
        .select($"cl", $"dim", expr("(s - pmod(s, nc)) DIV nc").as("c"))
        .as[(Long, Int, Long)].collect().toSeq
        .groupBy(_._1).toSeq
        .map { case (cl, rs) => cl -> rs.sortBy(_._2).map(_._3).toSeq }
    docArr.select($"doc_id", assignCol(cents).as("m"))
      .select($"doc_id", $"m.cl".as("cluster"), $"m.d".as("dist"))
      .orderBy($"doc_id")
  }

  /** Oracle: the same [[KmIters]] integer Lloyd iterations unrolled as
    * CTEs over the SHARED embedding fragment ([[PipelineQueries.embDimsCtesSql]]). */
  val textClusterSql: String = {
    val sb = new StringBuilder
    sb.append(s"WITH ${PipelineQueries.embDimsCtesSql},\n")
    sb.append(s"cent0 AS (SELECT doc_id AS cl, j, e AS c FROM e WHERE doc_id < $KmK)")
    for (i <- 1 to KmIters) {
      sb.append(
        s""",
           |d$i AS (
           |  SELECT e.doc_id, c.cl, CAST(sum((e.e - c.c) * (e.e - c.c)) AS BIGINT) AS d
           |  FROM e JOIN cent${i - 1} c USING (j) GROUP BY 1, 2),
           |a$i AS (
           |  SELECT doc_id, cl, d FROM (
           |    SELECT doc_id, cl, d, row_number() OVER (PARTITION BY doc_id ORDER BY d, cl) AS rn
           |    FROM d$i) t WHERE rn = 1)""".stripMargin)
      if (i < KmIters) sb.append(
        s""",
           |cent$i AS (
           |  SELECT a.cl, e.j,
           |    (CAST(sum(e.e) AS BIGINT)
           |      - ((CAST(sum(e.e) AS BIGINT) % count(*)) + count(*)) % count(*)) // count(*) AS c
           |  FROM a$i a JOIN e ON e.doc_id = a.doc_id GROUP BY 1, 2)""".stripMargin)
    }
    sb.append(
      s"""
         |SELECT doc_id, cl AS cluster, d AS dist FROM a$KmIters ORDER BY doc_id""".stripMargin)
    sb.toString
  }

  // ---------------------------------------------------------------- №86 graph_centrality
  /** PageRank over the kNN similarity graph (№27b's edges) — the
    * coreset-selection signal: central vectors are the corpus's
    * representatives, peripheral ones its outliers (what a curation
    * pipeline keeps/drops when subsampling a 100 TB embedding corpus).
    *
    * Determinism: the entire iteration runs in SCALED 64-bit INTEGER
    * arithmetic — rank unit = 10¹²/N, per-edge contribution `r DIV deg`,
    * damping 0.85 as `(·85) DIV 100` — so sums are exact and
    * order-independent (no float fold anywhere) and the oracle unrolls
    * the SAME [[PrIters]] iterations as plain CTEs, bit-equal. Dangling
    * mass is dropped (standard centrality simplification; scores, not
    * probabilities). Scale shape: the edge frame (+out-degree) is built
    * once and persisted; each iteration is ONE join (edges ⋈ ranks on
    * src, both shuffle-keyed on the join key) + one hash agg on dst +
    * the node left-join — O(iters) bounded shuffles over edge-sized
    * frames, the dedup_cluster loop discipline. */
  val PrIters = 5
  val PrScale = 1000000000000L

  def graphCentrality(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = graft.CacheRegistry.track(
      knnGraph(spark, dir).select(col("vec_id").as("src"), col("neighbor").as("dst")).persist())
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("deg"))
    val e = graft.CacheRegistry.track(edges.join(deg, "src").persist())
    val nodes = graft.CacheRegistry.track(
      Tables(spark, dir).embeddings.select($"vec_id".as("node")).persist())
    val n = nodes.count() // one scalar job; the loop below stays distributed
    val r0 = PrScale / n
    val base = r0 * 15 / 100
    var rank = nodes.withColumn("r", lit(r0))
    for (_ <- 1 to PrIters) {
      val contrib = e.join(rank, $"src" === $"node")
        .select($"dst", expr("r DIV deg").as("c"))
        .groupBy($"dst").agg(sum($"c").as("m"))
      rank = nodes.join(contrib, $"node" === $"dst", "left")
        .select($"node", expr(s"$base + (coalesce(m, 0) * 85) DIV 100").as("r"))
    }
    rank.select($"node".as("vec_id"), $"r".as("rank_scaled"))
      .orderBy($"vec_id")
  }

  /** The oracle unrolls the same [[PrIters]] integer iterations as plain
    * CTEs (m_i = incoming contributions, r_i = damped update) — generated
    * by the loop below so Spark and SQL can never disagree on the count. */
  val graphCentralitySql: String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH g AS (SELECT vec_id AS src, neighbor AS dst FROM (
         |  ${knnGraphSql.replace("\n", "\n  ")})),
         |deg AS (SELECT src, count(*) AS deg FROM g GROUP BY src),
         |e AS (SELECT g.src, g.dst, deg.deg FROM g JOIN deg USING (src)),
         |nodes AS (SELECT vec_id AS node FROM embeddings),
         |params AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT node, $PrScale // p.n AS r FROM nodes, params p)""".stripMargin)
    for (i <- 1 to PrIters) {
      sb.append(
        s""",
           |m$i AS (
           |  SELECT e.dst, CAST(sum(r${i - 1}.r // e.deg) AS BIGINT) AS m
           |  FROM e JOIN r${i - 1} ON r${i - 1}.node = e.src GROUP BY e.dst),
           |r$i AS (
           |  SELECT n.node,
           |    (($PrScale // p.n) * 15) // 100 + (coalesce(m$i.m, 0) * 85) // 100 AS r
           |  FROM nodes n CROSS JOIN params p
           |  LEFT JOIN m$i ON m$i.dst = n.node)""".stripMargin)
    }
    sb.append(
      s"""
         |SELECT node AS vec_id, r AS rank_scaled FROM r$PrIters ORDER BY vec_id""".stripMargin)
    sb.toString
  }

  // ---------------------------------------------------------------- №167 clustered_corpus
  /** The [[graft.ClusteredAnn]] generator ITSELF under the oracle — the
    * §16 clustered-geometry ANN table rests on this corpus, so its
    * generation is held to the same cross-engine discipline as every
    * operator: the DuckDB oracle REGENERATES the whole corpus from
    * `range(0, n)` (md5-hash fractions are exact power-of-two-denominator
    * doubles; the geometric cluster id is the top set bit of the 32-bit
    * hash via `length(bin(u+1))` — the №165 octave trick, no float log
    * anywhere) and recomputes the census: per-cluster sizes plus the mean
    * cosine of members to their OWN center and to the HEAD (cluster 0)
    * center in exact integer ppm. A hash mismatch means the two engines
    * disagree on a single generated component, a cluster assignment, or
    * the separation the §16 table claims — so head-heavy sizes AND
    * intra ≫ inter geometry are oracle-pinned facts, not spec-only ones.
    * Self-contained: reads no tables (the `dir` argument is unused), so
    * the row costs the same at every gate SF. */
  val CcN = 500
  val CcDims = 32

  def clusteredCorpus(spark: SparkSession, dir: String): DataFrame = {
    val centComp = (label: String) =>
      s"CAST(round(conv(substring(md5(concat('cc|', $label, '|', j)), 1, 8), 16, 10) / 2147483648.0 - 1.0 " +
        s"+ 0.000000001, 6) AS FLOAT)"
    graft.ClusteredAnn.frame(spark, CcN, CcDims)
      .withColumn("own_cent", expr(s"transform(sequence(0, ${CcDims - 1}), j -> ${centComp("label")})"))
      .withColumn("head_cent", expr(s"transform(sequence(0, ${CcDims - 1}), j -> ${centComp("'0'")})"))
      .select(col("label"),
        cosine6(col("embedding"), col("own_cent")).as("c_own"),
        cosine6(col("embedding"), col("head_cent")).as("c_head"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        expr("sum(CAST(round(c_own * 1000000, 0) AS BIGINT)) DIV count(1)").as("own_ppm"),
        expr("sum(CAST(round(c_head * 1000000, 0) AS BIGINT)) DIV count(1)").as("head_ppm"))
      .orderBy(col("label"))
  }

  val clusteredCorpusSql: String = {
    def u32(seed: String) =
      s"CAST(list_sum(list_transform(range(0, 8), k -> " +
        s"(strpos('0123456789abcdef', substr(md5($seed), CAST(k + 1 AS INT), 1)) - 1) " +
        s"* (CAST(1 AS BIGINT) << CAST(4 * (7 - k) AS INT)))) AS BIGINT)"
    val ns = graft.ClusteredAnn.NoiseScale
    val embComp =
      s"""CAST(round((${u32("'cc|' || label || '|' || j")} / 2147483648.0 - 1.0)
         |      + $ns * (2.0 * ${u32("'nz|' || vec_id || '|' || j")} / 4294967296.0 - 1.0)
         |      + 0.000000001, 6) AS FLOAT)""".stripMargin.replaceAll("\n\\s*", " ")
    val centComp = (label: String) =>
      s"CAST(round(${u32(s"'cc|' || $label || '|' || j")} / 2147483648.0 - 1.0 + 0.000000001, 6) AS FLOAT)"
    s"""WITH cc_ids AS (SELECT CAST(range AS BIGINT) AS vec_id FROM range(0, $CcN)),
       |cc_l AS (
       |  SELECT vec_id, CAST(greatest(0, least(${graft.ClusteredAnn.NClusters - 1},
       |    32 - length(bin(${u32("'cl|' || vec_id")} + 1)))) AS INT) AS label
       |  FROM cc_ids),
       |cc_e AS (
       |  SELECT vec_id, label,
       |    list_transform(range(0, $CcDims), j -> $embComp) AS emb
       |  FROM cc_l),
       |cc_cent AS (
       |  SELECT label, list_transform(range(0, $CcDims), j -> ${centComp("label")}) AS cent
       |  FROM (SELECT DISTINCT label FROM cc_l)),
       |cc_head AS (
       |  SELECT list_transform(range(0, $CcDims), j -> ${centComp("'0'")}) AS cent),
       |cc_s AS (
       |  SELECT e.label, ${cos6Sql("e.emb", "c.cent")} AS c_own, ${cos6Sql("e.emb", "h.cent")} AS c_head
       |  FROM cc_e e JOIN cc_cent c USING (label) CROSS JOIN cc_head h)
       |SELECT label, count(*) AS n_vecs,
       |  CAST(sum(CAST(round(c_own * 1000000, 0) AS BIGINT)) AS BIGINT) // count(*) AS own_ppm,
       |  CAST(sum(CAST(round(c_head * 1000000, 0) AS BIGINT)) AS BIGINT) // count(*) AS head_ppm
       |FROM cc_s GROUP BY label ORDER BY label""".stripMargin
  }

  // ---------------------------------------------------------------- №172 knn_ivf_rebalance
  /** Drift-triggered IVF RE-CLUSTER — the third leg of the serving
    * lifecycle (№119/№162 build + serve, №170 streaming ingest, THIS:
    * re-index when the frozen model stops fitting the data). №119's
    * scaladoc ends with "drift is managed by re-training centroids" —
    * this operator IS that management, measured end to end:
    *
    *   1. MONITOR: arrivals (every [[RebalArrMod]]ᵗʰ corpus vector) come
    *      from a DRIFTED encoder — a deterministic affine re-embedding
    *      x → [[RebalScale]]·x + [[RebalShift]] (an encoder fine-tune's
    *      systematic direction shift, the №145 scenario made concrete).
    *      Under the frozen base model, the total-variation divergence
    *      between the base and arrival CELL-SHARE distributions is the
    *      trigger statistic ([[rebalTvPpmExpr]], exact cross-multiplied
    *      ppm in DECIMAL(38) — №145's overflow lesson applied): cell
    *      shares are the monitor a store gets FOR FREE from the index it
    *      already maintains, no extra corpus pass.
    *   2. TRIGGER: tv_ppm > [[RebalTvThresholdPpm]] → re-train.
    *   3. REBALANCE: re-run the SAME [[refinedCentroids]] pipeline over
    *      the current store (base ∪ drifted arrivals — the sample is the
    *      constant-size md5-ordered prefix, so re-training costs the same
    *      as the original build), then ONE re-assignment pass — the
    *      amortized full-store shuffle production pays weekly, not
    *      nightly (№119 handles the nightly path).
    *
    * Output: one row per (phase `t0_stale`/`t1_rebalanced`, probe ∈
    * [[RebalProbes]]) with the trigger reading and the dials it moves —
    * occupancy (used cells, max cell, max-over-mean ppm), assignment
    * tightness (mean ppm cosine of each vector to its cell centroid), and
    * the served recall/COST pair: `n_hits` against brute gold AND
    * `n_cand` (probe-join candidate rows — the per-query scan bill), for
    * DRIFTED queries (today's traffic).
    *
    * The honest-recall finding (sf0.01, measured): at EQUAL probe the
    * stale index looks BETTER on hits alone — 45/50 vs 20/50 at probe 2 —
    * because the drift crams arrivals and queries into one 150-vector hot
    * cell, so probing it is accidental exhaustive search: 1595 candidates
    * vs 220. The rebalance is what turns the probe dial back into a real
    * lever: t1@probe8 reaches 43/50 at 759 candidates — HALF the stale
    * index's scan bill at its floor — and per-candidate efficiency
    * (hits∕cand) more than doubles at every probe. Hot cells, not recall
    * points, are what drift actually costs a store; this row measures
    * both so the trade is visible. The DuckDB oracle recomputes both
    * Lloyd refinements, both assignments, the TV monitor and all four
    * searches from first principles; IvfRebalanceSpec pins the trigger
    * genuinely firing, every health dial moving the right way, and the
    * accidental-recall direction itself (so nobody "fixes" it away). */
  val RebalArrMod = 3
  val RebalScale = "0.6"
  val RebalShift = "0.35"
  val RebalTvThresholdPpm = 100000L // 10% — an encoder change reads far above this

  /** Probe widths the before/after serving dials are measured at: the
    * default serving point and a wider setting, because the headline
    * finding is a recall/COST trade — see the scaladoc's honest-recall
    * paragraph. */
  val RebalProbes: Seq[Int] = Seq(Probe, 8)

  /** The drifted re-embedding, 6dp-rounded to float so both engines and
    * both sides (corpus arrivals, query traffic) share the exact bytes. */
  private def rebalDriftSql(c: String): String =
    s"transform($c, x -> CAST(round(CAST(x AS DOUBLE) * $RebalScale + $RebalShift + 0.000000001, 6) AS FLOAT))"

  /** TV divergence of per-cell shares in exact ppm: ½·Σ|p_c − q_c| =
    * Σ|n_a·N_b − n_b·N_a|·10⁶ ∕ (2·N_a·N_b), cross-multiplied in
    * DECIMAL(38) (n_a·N_b ≤ n² — BIGINT wraps past ~3·10⁹ vectors). */
  private val rebalTvPpmExpr: String =
    """CAST(sum(abs(CAST(n_a AS DECIMAL(38,0)) * nn_b - CAST(n_b AS DECIMAL(38,0)) * nn_a)) * 1000000
      | DIV (2 * CAST(max(nn_a) AS DECIMAL(38,0)) * max(nn_b)) AS BIGINT)""".stripMargin

  /** [[cellsOf]] keeping the winning cosine (the tightness dial needs it;
    * max(ccos) IS the winner's cosine — assignment is argmax). */
  private def cellsWithCos(corpus: DataFrame, centroids: DataFrame): DataFrame =
    corpus.join(broadcast(centroids))
      .select(col("vec_id"), col("emb"), col("c_id"), cosine6(col("emb"), col("c_emb")).as("ccos"))
      .groupBy(col("vec_id"))
      .agg(first(col("emb")).as("emb"),
        max_by(col("c_id"), struct(col("ccos"), (-col("c_id")).as("neg"))).as("cell"),
        max(col("ccos")).as("ccos"))

  def knnIvfRebalance(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    // today's traffic queries FROM the drifted distribution
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), expr(rebalDriftSql("emb")).as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val base = corpus.filter(col("vec_id") % RebalArrMod =!= 0)
    val arrivals = corpus.filter(col("vec_id") % RebalArrMod === 0)
      .select(col("vec_id"), expr(rebalDriftSql("emb")).as("emb"))
    val all = graft.CacheRegistry.track(base.unionByName(arrivals).persist())

    val cent0 = refinedCentroids(spark, base, Centroids)  // the frozen model
    val cent1 = refinedCentroids(spark, all, Centroids)   // re-trained on the current store
    val cells0 = graft.CacheRegistry.track(cellsWithCos(all, cent0).persist())
    val cells1 = graft.CacheRegistry.track(cellsWithCos(all, cent1).persist())

    // trigger: base vs arrival cell shares under the STALE model (the
    // monitor reads the index the store already maintains). Bounded frame:
    // ≤ C rows after the per-cell agg.
    val perCell = cells0
      .withColumn("arr", (col("vec_id") % RebalArrMod === 0).cast("long"))
      .groupBy(col("cell"))
      .agg(sum(col("arr")).as("n_a"), sum(lit(1L) - col("arr")).as("n_b"))
    val tv = perCell
      .withColumn("nn_a", sum(col("n_a")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .withColumn("nn_b", sum(col("n_b")).over(org.apache.spark.sql.expressions.Window.partitionBy()))
      .agg(expr(rebalTvPpmExpr).as("tv_ppm"))

    // brute gold over the SAME store for the drifted queries (10 rows broadcast)
    val gold = graft.CacheRegistry.track(
      topKRanked(all.join(broadcast(queries))
          .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos")),
        "q_id", "cos", "vec_id", K)
        .select(col("q_id"), col("vec_id")).persist())

    def phaseRow(phase: String, cells: DataFrame, cent: DataFrame, probe: Int): DataFrame = {
      val occ = cells.groupBy(col("cell")).agg(count(lit(1)).as("cn"))
        .agg(count(lit(1)).as("cells_used"), max(col("cn")).as("max_cell_n"),
          sum(col("cn")).as("n_store"))
      val tight = cells.agg(expr(
        "CAST(sum(CAST(round(ccos * 1000000 + 0.000000001) AS BIGINT)) DIV count(1) AS BIGINT)")
        .as("mean_ccos_ppm"))
      // candidate volume = the probe join's row count BEFORE ranking: the
      // per-query scan cost the occupancy skew actually charges
      val probeCells = queries.join(broadcast(cent))
        .select(col("q_id"), col("c_id"), cosine6(col("q_emb"), col("c_emb")).as("qcos"))
        .groupBy(col("q_id"))
        .agg(graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), probe).as("top"))
        .select(col("q_id"), explode(col("top.id")).as("cell"))
      val cand = cells.join(broadcast(probeCells), "cell").agg(count(lit(1)).as("n_cand"))
      val hits = ivfSearch(cells.select(col("vec_id"), col("emb"), col("cell")),
          cent, queries, probe, K)
        .join(broadcast(gold), Seq("q_id", "vec_id"))
        .agg(count(lit(1)).as("n_hits"))
      occ.crossJoin(broadcast(tight)).crossJoin(broadcast(cand))
        .crossJoin(broadcast(hits)).crossJoin(broadcast(tv))
        .select(lit(phase).as("phase"), lit(probe.toLong).as("probe"), col("tv_ppm"),
          (col("tv_ppm") > RebalTvThresholdPpm).as("triggered"),
          col("cells_used"), col("max_cell_n"),
          expr("max_cell_n * cells_used * 1000000 DIV n_store").as("max_over_mean_ppm"),
          col("mean_ccos_ppm"), col("n_cand"), col("n_hits"),
          lit(NQueries.toLong * K).as("n_gold"))
    }
    RebalProbes.map { p =>
      phaseRow("t0_stale", cells0, cent0, p)
        .unionAll(phaseRow("t1_rebalanced", cells1, cent1, p))
    }.reduce(_ unionAll _).orderBy(col("phase"), col("probe"))
  }

  // ---------------------------------------------------------------- №175 knn_ivf_rebalance_inc
  /** INCREMENTAL rebalance — №172 decides WHEN, this is HOW at 100 TB,
    * and the WARM start is the whole trick: re-training cold renames
    * every centroid identity, so ~99% of vectors "change cell" by
    * relabeling alone (measured — the first cut of this operator did
    * exactly that) and the delta degenerates to a full rewrite. Seeding
    * Lloyd from the LIVE model ([[refinedCentroidsWarm]] — what
    * production retrains actually do) preserves identity: centroids
    * move WITH the data, and "changed" means a vector genuinely crossed
    * a moved boundary. Measured under №172's heavy drift (sf0.01): 31
    * of 490 vectors move (6.3%), 18 of 64 cells touched, 259 rows
    * written (53% — touched cells include hot ones); under milder drift
    * moved_ppm IS the saving.
    *
    * Assignment under a broadcast model is a pure per-vector function,
    * so old and new assignments are two broadcast passes, and the
    * PERSISTED cell-partitioned store needs only its TOUCHED partitions
    * rewritten — cells that gained or lost members — via dynamic
    * partition overwrite ([[deltaRewrite]]); untouched cells' files
    * survive byte-for-byte (spec pins names/sizes/mtimes). The one real
    * trap is pinned too: a cell whose members ALL leave receives no
    * data in the dynamic overwrite, so its stale partition would
    * survive as GHOST rows — emptied partitions are deleted explicitly,
    * and the row's `n_store_diff` column is computed FROM THE FILES
    * (read the store back, symmetric-diff against the target): the
    * oracle predicts 0, so a ghost or lost row diverges the driver's
    * hash, not just a spec. Oracle recomputes both refinements (warm
    * seed mirrored as the c0 CTE) and every count relationally. */
  def knnIvfRebalanceInc(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val base = corpus.filter(col("vec_id") % RebalArrMod =!= 0)
    val arrivals = corpus.filter(col("vec_id") % RebalArrMod === 0)
      .select(col("vec_id"), expr(rebalDriftSql("emb")).as("emb"))
    val all = graft.CacheRegistry.track(base.unionByName(arrivals).persist())
    val cent0 = refinedCentroids(spark, base, Centroids)
    // WARM re-train: Lloyd seeded from the live model over the current
    // store's sample — cell identity survives, so "changed" means the
    // vector actually crossed a moved boundary, not a renamed label
    val cent1 = refinedCentroidsWarm(spark, all, cent0)
    val j = graft.CacheRegistry.track(
      cellsOf(all, cent0).select(col("vec_id"), col("emb"), col("cell").as("cell0"))
        .join(cellsOf(all, cent1).select(col("vec_id"), col("cell").as("cell1")), "vec_id")
        .persist())
    val store = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_stores", s"graft_ivfrebinc_${dirKey(dir)}").toString
    val emptied = partialRewrite(store,
      j.select(col("vec_id"), col("emb"), col("cell0").as("cell")),
      j.select(col("vec_id"), col("emb"), col("cell1").as("cell")))
    // the files ARE the proof: read the store back and diff against the
    // target assignment — the oracle predicts zero
    val back = spark.read.parquet(store).select(col("vec_id"), col("cell"))
    val want = j.select(col("vec_id"), col("cell1").as("cell"))
    val diff = storeMultisetDiff(back, want)
    val chg = j.filter(col("cell0") =!= col("cell1"))
    val touched = chg.select(col("cell0").as("cell"))
      .unionAll(chg.select(col("cell1").as("cell"))).distinct()
    val written = j.join(broadcast(touched.withColumnRenamed("cell", "cell1")), "cell1")
      .agg(count(lit(1)).as("n_rows_written"))
    j.agg(count(lit(1)).as("n_total"),
        sum(when(col("cell0") =!= col("cell1"), 1L).otherwise(0L)).as("n_changed"))
      .crossJoin(broadcast(touched.agg(count(lit(1)).as("cells_touched"))))
      .crossJoin(broadcast(written))
      .crossJoin(broadcast(diff))
      .select(col("n_total"), col("n_changed"),
        expr("n_changed * 1000000 DIV n_total").as("moved_ppm"),
        lit(Centroids.toLong).as("cells_total"), col("cells_touched"),
        lit(emptied.length.toLong).as("cells_emptied"),
        col("n_rows_written"),
        expr("n_rows_written * 1000000 DIV n_total").as("write_bill_ppm"),
        col("n_store_diff"))
  }

  /** MULTISET read-back diff (one row, `n_store_diff`): except() is
    * set-based, so a duplicated (vec_id, cell) row in the read-back
    * store — e.g. a partition both surviving and rewritten — would
    * collapse and report 0. Full-outer join of groupBy-count frames
    * sees membership drift AND row duplication; the oracle predicts 0. */
  private[queries] def storeMultisetDiff(back: DataFrame, want: DataFrame): DataFrame =
    multisetDiff(back, want, Seq("vec_id", "cell"))

  private[queries] def multisetDiff(back: DataFrame, want: DataFrame,
                                    cols: Seq[String]): DataFrame =
    back.groupBy(cols.map(col): _*).agg(count(lit(1)).as("nb"))
      .join(want.groupBy(cols.map(col): _*).agg(count(lit(1)).as("nw")),
        cols, "full_outer")
      .agg(coalesce(sum(abs(coalesce(col("nb"), lit(0L)) - coalesce(col("nw"), lit(0L)))), lit(0L))
        .as("n_store_diff"))

  /** The delta-rewrite mechanism (shared with IvfRebalanceSpec's
    * synthetic ghost scenario): land `oldA` as the cell-partitioned
    * store ([[landStore]]), then bring it to `newA` by dynamically
    * overwriting ONLY the partitions of cells that gained or lost
    * members ([[deltaRewrite]]), deleting emptied cells' partitions
    * explicitly (dynamic overwrite never clears a partition it writes
    * no data to). Returns the emptied cell ids. */
  private[queries] def partialRewrite(store: String, oldA: DataFrame,
                                      newA: DataFrame): Array[Long] = {
    landStore(store, oldA)
    deltaRewrite(store, oldA, newA)
  }

  /** Cluster by the partition key before a partitioned write: without
    * it every input task writes a file into every cell directory it
    * happens to hold (tasks × cells tiny files and as many commits);
    * clustered, each cell's data is one task's contiguous write — the
    * same discipline a 100 TB store needs to avoid the small-files
    * problem. */
  private def byCell(a: DataFrame): DataFrame = a.repartition(col("cell"))

  private[queries] def landStore(store: String, a: DataFrame): Unit =
    byCell(a).write.partitionBy("cell").mode("overwrite").parquet(store)

  private[queries] def deltaRewrite(store: String, oldA: DataFrame,
                                    newA: DataFrame): Array[Long] = {
    val moved = oldA.select(col("vec_id"), col("cell").as("cell0"))
      .join(newA.select(col("vec_id"), col("cell").as("cell1")), "vec_id")
      .filter(col("cell0") =!= col("cell1"))
    val touched = moved.select(col("cell0").as("cell"))
      .unionAll(moved.select(col("cell1").as("cell"))).distinct()
    byCell(newA.join(broadcast(touched), "cell")
        .select(col("vec_id"), col("emb"), col("cell")))
      .write.partitionBy("cell").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(store)
    val emptied = touched.except(newA.select(col("cell")).distinct())
      .collect().map(_.getLong(0)).sorted // ≤ C rows by construction
    emptied.foreach(c => graft.Fs.rmTree(java.nio.file.Paths.get(store, s"cell=$c")))
    emptied
  }

  // ---------------------------------------------------------------- №177 knn_serve_rebalance
  /** SERVE-DURING-REBALANCE — the consistency corner №175 and №176
    * leave open between them: №176 pins read visibility under INGEST,
    * №175 partially rewrites the store's cell partitions for a model
    * change, and a search running DURING that rewrite must see every
    * cell at exactly the old or the new layout — never a torn cell,
    * never a lost vector. A naive in-place delta rewrite CANNOT promise
    * that: a vector moving cell 5 → 9 vanishes for any reader between
    * cell 5's rewrite and cell 9's (and is doubled in the other order).
    * Reference analogue: the reads the export serves while
    * S3StreamingWriter rotates objects (app/batch/S3StreamingWriter.kt:77-175)
    * — an object is visible whole or not at all, never half-rotated.
    *
    * The protocol that closes it is ADD-THEN-REMOVE, in per-cell-atomic
    * waves over the №175 store:
    *   - gain waves (cells that receive movers, ascending, two waves):
    *     rewrite cell c to m0(c) ∪ incomers(c) — add-only;
    *   - loss waves (cells that lose movers, ascending, two waves):
    *     rewrite cell c to its final m1(c) — drops leavers, whose new
    *     copies are ALREADY live because every gain wave ran first.
    * At every intermediate point each cell is at exactly one of its
    * three layouts (old / old∪incoming / new) and every vector has ≥1
    * live copy; a mover has two during its overlap window, and because
    * both copies carry the SAME embedding, dedup by (q_id, vec_id)
    * makes the served result exact — the duplicate is a visibility
    * artifact, not an answer change. The write bill is the measured
    * PRICE of serving through the rebalance: gaining cells are written
    * twice (once per phase) where №175's offline rewrite writes each
    * touched cell once.
    *
    * The row executes the full lifecycle against the PHYSICAL store:
    * land at the stale assignment, apply the four waves as dynamic
    * partition overwrites (emptied loss cells' partitions deleted — the
    * №175 ghost discipline), and serve №172's drifted query traffic at
    * five checkpoints — stage 0 (pre-rebalance, routed by the stale
    * model) and after each wave (stages 1-4, routed by the re-trained
    * model: the router flips at rebalance start; membership catches up
    * wave by wave). Every serve READS THE FILES BACK — n_rows/n_vecs
    * come from the store, so a lost vector, ghost partition or torn
    * wave diverges the driver hash, not just a spec. The closed form
    * the DuckDB oracle rebuilds: stayers always live in their cell;
    * a mover's old copy lives until its cell0's loss wave, its new copy
    * from its cell1's gain wave — both refinements (warm seed mirrored),
    * wave numbering (ceil-half splits), all five memberships and all
    * five deduped searches recomputed relationally.
    * ServeRebalanceSpec pins the invariants the hash can't name:
    * per-cell membership equals exactly one protocol layout at every
    * stage, no vector is ever absent, the final store is assignment1,
    * and some served result genuinely changes mid-rebalance (the
    * interleaving is not vacuous). */
  def knnServeRebalance(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    // №172's drifted traffic: today's queries come from the new encoder
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), expr(rebalDriftSql("emb")).as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val base = corpus.filter(col("vec_id") % RebalArrMod =!= 0)
    val arrivals = corpus.filter(col("vec_id") % RebalArrMod === 0)
      .select(col("vec_id"), expr(rebalDriftSql("emb")).as("emb"))
    val all = graft.CacheRegistry.track(base.unionByName(arrivals).persist())
    val cent0 = refinedCentroids(spark, base, Centroids)
    val cent1 = refinedCentroidsWarm(spark, all, cent0)
    val j = graft.CacheRegistry.track(
      cellsOf(all, cent0).select(col("vec_id"), col("emb"), col("cell").as("cell0"))
        .join(cellsOf(all, cent1).select(col("vec_id"), col("cell").as("cell1")), "vec_id")
        .persist())
    // ONE bounded collect feeds every schedule decision: the mover set
    // (≤ corpus movers) plus assignment1's per-cell counts (≤ C rows) —
    // wave membership, ceil-half splits and the emptied-cell check are
    // all driver-side arithmetic after this
    val moverRows = j.filter(col("cell0") =!= col("cell1"))
      .select(col("cell0"), col("cell1")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val m1Counts: Map[Long, Long] = j.groupBy(col("cell1")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gainCells = moverRows.map(_._2).distinct.sorted
    val lossCells = moverRows.map(_._1).distinct.sorted
    val (g1, g2) = gainCells.splitAt((gainCells.length + 1) / 2)
    val (l1, l2) = lossCells.splitAt((lossCells.length + 1) / 2)

    val store = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_stores", s"graft_servereb_${dirKey(dir)}").toString
    landStore(store, j.select(col("vec_id"), col("emb"), col("cell0").as("cell")))

    def gainWave(w: Array[Long]): Unit = if (w.nonEmpty) {
      // cell c → m0(c) ∪ incomers(c): add-only, losers stay put
      byCell(j.filter(col("cell0").isin(w.map(Long.box): _*))
          .select(col("vec_id"), col("emb"), col("cell0").as("cell"))
          .unionAll(j.filter(col("cell1").isin(w.map(Long.box): _*) && col("cell0") =!= col("cell1"))
            .select(col("vec_id"), col("emb"), col("cell1").as("cell"))))
        .write.partitionBy("cell").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").parquet(store)
    }
    def lossWave(w: Array[Long]): Unit = if (w.nonEmpty) {
      byCell(j.filter(col("cell1").isin(w.map(Long.box): _*))
          .select(col("vec_id"), col("emb"), col("cell1").as("cell")))
        .write.partitionBy("cell").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").parquet(store)
      // a loss cell whose members ALL left gets no data in the dynamic
      // overwrite — delete its stale partition (№175's ghost discipline;
      // m1Counts already knows which wave cells land empty)
      w.filter(c => !m1Counts.contains(c)).foreach(c =>
        graft.Fs.rmTree(java.nio.file.Paths.get(store, s"cell=$c")))
    }

    def probesOf(cent: DataFrame): DataFrame = queries.join(broadcast(cent))
      .select(col("q_id"), col("q_emb"), col("c_id"), cosine6(col("q_emb"), col("c_emb")).as("qcos"))
      .groupBy(col("q_id"))
      .agg(first(col("q_emb")).as("q_emb"),
        graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), Probe).as("top"))
      .select(col("q_id"), col("q_emb"), explode(col("top.id")).as("cell"))
    val probes0 = graft.CacheRegistry.track(probesOf(cent0).persist())
    val probes1 = graft.CacheRegistry.track(probesOf(cent1).persist())

    val captured = scala.collection.mutable.ArrayBuffer.empty[(Int, Array[(Long, Long)])]
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long, Double)]
    def serve(stage: Int, probes: DataFrame): Unit = {
      // the files ARE the snapshot: read back, search, collect EAGERLY
      // (bounded: NQueries·K rows) before the next wave mutates the store
      // the partition column round-trips as INT (directory-name
      // inference) — normalize to the assignment's LONG
      val back = spark.read.parquet(store)
        .select(col("vec_id"), col("emb"), col("cell").cast("long").as("cell"))
      // dedup the dual copies of in-overlap movers: both carry the same
      // embedding, so distinct (q_id, vec_id, cos) is exact. Census and
      // search ride ONE job (the census agg crossJoins the ranked rows).
      val scored = back.join(broadcast(probes), "cell")
        .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
        .distinct()
      val census = back
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("vec_id")).as("n_vecs"))
      topKRanked(scored, "q_id", "cos", "vec_id", K)
        .crossJoin(broadcast(census)).collect().foreach(r =>
          out += ((stage.toLong, r.getAs[Long]("n_rows"), r.getAs[Long]("n_vecs"),
            r.getAs[Long]("q_id"), r.getAs[Number]("rank").longValue,
            r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))))
      if (captureStages)
        captured += ((stage, back.select(col("vec_id"), col("cell"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))))
    }

    serve(0, probes0)
    gainWave(g1); serve(1, probes1)
    gainWave(g2); serve(2, probes1)
    lossWave(l1); serve(3, probes1)
    lossWave(l2); serve(4, probes1)
    if (captureStages) lastStageCells = captured.toSeq

    import spark.implicits._
    out.toSeq.toDF("stage", "n_rows", "n_vecs", "q_id", "rank", "vec_id", "cos")
      .orderBy(col("stage"), col("q_id"), col("rank"))
  }

  /** Spec hook: per-stage (vec_id, cell) store snapshots of the last
    * [[knnServeRebalance]] run — collected ONLY when the spec opts in
    * (a corpus-sized collect has no place in the production path). */
  private[graft] var captureStages: Boolean = false
  private[graft] var lastStageCells: Seq[(Int, Array[(Long, Long)])] = Seq.empty

  // ---------------------------------------------------------------- №178 knn_ivf_calendar
  /** THE COMPOSED MAINTENANCE CALENDAR — №119 applies nightly arrival
    * deltas, №175 applies a model change; a real store does BOTH against
    * ONE persisted layout, interleaved. Four maintenance events against
    * the same cell-partitioned store:
    *   E1, E2  nightly drifted arrivals, assigned under the live model
    *           and APPENDED to their cells' partitions (new files only —
    *           the nightly bill is batch-sized, existing files untouched);
    *   E3      the drift having accumulated, a WARM model re-train + №175
    *           delta rewrite (touched cells rewritten wholesale, emptied
    *           cells' ghosts deleted);
    *   E4      the next night's arrivals under the NEW model.
    * What the composition measures that neither row alone can: the
    * WRITE AMPLIFICATION where the two delta kinds overlap — an arrival
    * row appended in E1/E2 whose cell the rebalance then touches is
    * written AGAIN in E3 (`rearr_rows`, with `overlap_cells` counting
    * the cells hit by both) — against the composed-vs-naive headline
    * (`composed_bill` = batch+delta rows vs `naive_bill` = a full store
    * rewrite at every event, `saved_ppm` the saving). Exactness is
    * proven FROM THE FILES (№175's discipline): the store is read back
    * after the calendar and multiset-diffed against the closed-form
    * final state — every pre-E3 vector at its warm-model assignment,
    * E4's arrivals at theirs; the oracle predicts 0, so a ghost row,
    * lost append or double-kept rewrite diverges the driver hash.
    * MaintenanceCalendarSpec additionally pins the file-level append
    * contract (E1/E2 create files, never rewrite existing ones;
    * rebalance-untouched cells' files survive the whole calendar
    * byte-identical) and the composed bill genuinely beating naive. */
  val CalMod = 6 // arrival night n = vec_id % CalMod == n, n ∈ {1,2,3}

  /** Spec hooks (spec-only collects, same discipline as
    * [[captureStages]]): store file census after events E0/E2/E3/E4
    * (relative path → (size, mtime)) and the rebalance's touched cells. */
  private[graft] var captureCalendar: Boolean = false
  private[graft] var lastCalendarFiles: Seq[(String, Map[String, (Long, Long)])] = Seq.empty
  private[graft] var lastCalendarTouched: Set[Long] = Set.empty

  private def touchedOf(j: DataFrame): Set[Long] = {
    val chg = j.filter(col("cell0") =!= col("cell1"))
    chg.select(col("cell0")).unionAll(chg.select(col("cell1"))).distinct()
      .collect().map(_.getLong(0)).toSet
  }

  def knnIvfCalendar(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val base = corpus.filter(!(col("vec_id") % CalMod).isin(1L, 2L, 3L))
    def night(n: Int): DataFrame = corpus.filter(col("vec_id") % CalMod === n)
      .select(col("vec_id"), expr(rebalDriftSql("emb")).as("emb"))
    val a1 = night(1); val a2 = night(2); val a3 = night(3)
    val cent0 = refinedCentroids(spark, base, Centroids)
    val store = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_stores", s"graft_ivfcal_${dirKey(dir)}").toString

    val snaps = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, (Long, Long)])]
    def snap(ev: String): Unit = if (captureCalendar) {
      import scala.jdk.CollectionConverters._
      val root = java.nio.file.Paths.get(store)
      snaps += ((ev, java.nio.file.Files.walk(root).iterator().asScala
        .filter { p =>
          val n = p.getFileName.toString
          // data files only: _SUCCESS markers and .crc shadows are
          // commit-protocol artifacts the append legitimately refreshes
          java.nio.file.Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")
        }
        .map(p => root.relativize(p).toString ->
          ((java.nio.file.Files.size(p), java.nio.file.Files.getLastModifiedTime(p).toMillis)))
        .toMap))
    }

    // E0: land the base at the live model's assignment
    landStore(store, cellsOf(base, cent0).select(col("vec_id"), col("emb"), col("cell")))
    snap("E0")
    // E1/E2: nightly appends — batch-sized work, new files only
    def append(batch: DataFrame, cent: DataFrame): Unit =
      byCell(cellsOf(batch, cent).select(col("vec_id"), col("emb"), col("cell")))
        .write.partitionBy("cell").mode("append").parquet(store)
    append(a1, cent0)
    append(a2, cent0)
    snap("E2")

    // E3: the model change — warm re-train over the CURRENT store, then
    // №175's delta rewrite of exactly the cells that gained/lost members
    val cur = graft.CacheRegistry.track(
      base.unionByName(a1).unionByName(a2).persist())
    val cent1 = refinedCentroidsWarm(spark, cur, cent0)
    val j = graft.CacheRegistry.track(
      cellsOf(cur, cent0).select(col("vec_id"), col("emb"), col("cell").as("cell0"))
        .join(cellsOf(cur, cent1).select(col("vec_id"), col("cell").as("cell1")), "vec_id")
        .persist())
    val emptied = deltaRewrite(store,
      j.select(col("vec_id"), col("emb"), col("cell0").as("cell")),
      j.select(col("vec_id"), col("emb"), col("cell1").as("cell")))
    snap("E3")
    // E4: the next night lands under the NEW model
    append(a3, cent1)
    snap("E4")
    if (captureCalendar) {
      lastCalendarFiles = snaps.toSeq
      lastCalendarTouched = touchedOf(j)
    }

    // the files are the proof: final store ≡ closed-form final state
    val back = spark.read.parquet(store)
      .select(col("vec_id"), col("cell").cast("long").as("cell"))
    val want = j.select(col("vec_id"), col("cell1").as("cell"))
      .unionByName(cellsOf(a3, cent1).select(col("vec_id"), col("cell")))
    val diff = storeMultisetDiff(back, want)

    val chg = j.filter(col("cell0") =!= col("cell1"))
    val touched = graft.CacheRegistry.track(
      chg.select(col("cell0").as("cell"))
        .unionAll(chg.select(col("cell1").as("cell"))).distinct().persist())
    val rebalRows = j.join(broadcast(touched.withColumnRenamed("cell", "cell1")), "cell1")
      .agg(count(lit(1)).as("rows_rebal"))
    // amplification: arrival rows written in E1/E2 then AGAIN in E3
    val arrIds = a1.select(col("vec_id")).unionAll(a2.select(col("vec_id")))
    val rearr = j.join(arrIds, "vec_id")
      .join(broadcast(touched.withColumnRenamed("cell", "cell1")), "cell1")
      .agg(count(lit(1)).as("rearr_rows"))
    val overlap = j.join(arrIds, "vec_id").select(col("cell0").as("cell")).distinct()
      .join(broadcast(touched), "cell").agg(count(lit(1)).as("overlap_cells"))
    val counts = base.agg(count(lit(1)).as("n_base"))
      .crossJoin(broadcast(a1.agg(count(lit(1)).as("n_arr1"))))
      .crossJoin(broadcast(a2.agg(count(lit(1)).as("n_arr2"))))
      .crossJoin(broadcast(a3.agg(count(lit(1)).as("n_arr3"))))
      .crossJoin(broadcast(chg.agg(count(lit(1)).as("n_moved"))))
      .crossJoin(broadcast(touched.agg(count(lit(1)).as("cells_touched"))))
      .crossJoin(broadcast(rebalRows)).crossJoin(broadcast(rearr))
      .crossJoin(broadcast(overlap)).crossJoin(broadcast(diff))
    counts.select(col("n_base"), col("n_arr1"), col("n_arr2"), col("n_arr3"),
        col("n_moved"), col("cells_touched"), lit(emptied.length.toLong).as("cells_emptied"),
        col("rows_rebal"), col("rearr_rows"), col("overlap_cells"),
        (col("n_arr1") + col("n_arr2") + col("rows_rebal") + col("n_arr3")).as("composed_bill"),
        // naive = full store rewrite at each of E1..E4: base 4×, A1 4×
        // (present from E1 on), A2 3×, A3 once
        (lit(4L) * col("n_base") + lit(4L) * col("n_arr1") + lit(3L) * col("n_arr2")
          + col("n_arr3")).as("naive_bill"),
        col("n_store_diff"))
      .select(col("*"),
        expr("(naive_bill - composed_bill) * 1000000 DIV naive_bill").as("saved_ppm"))
  }

  // ---------------------------------------------------------------- №185 knn_serve_calendar
  /** SERVING THROUGH THE FULL MAINTENANCE CALENDAR — the composition
    * №177 and №178 each stop short of: №177 serves through the
    * rebalance but with no arrivals, №178 interleaves arrivals with the
    * rebalance but never serves. A real store does all three at once:
    * queries arrive every minute of the calendar, including WHILE a
    * nightly batch lands and WHILE the model-change rewrite is mid-wave.
    * This row serves №172's drifted traffic at SIX checkpoints of №178's
    * event sequence against one persisted cell-partitioned store:
    *   S0 after E0 (base landed, routed by the live model);
    *   S1/S2 after each nightly append (appended rows must be visible
    *     the moment their batch commits — №184's contract, here on the
    *     maintenance store);
    *   S3 MID-REBALANCE, after the gain phase of №177's add-then-remove
    *     protocol (router already flipped to the re-trained model;
    *     movers double-visible, dedup by (q_id, vec_id) exact);
    *   S4 after the loss phase (final membership, ghosts deleted);
    *   S5 after the next night lands under the NEW model.
    * Every serve READS THE FILES BACK (n_rows/n_vecs from the store —
    * a torn wave, lost append or ghost partition diverges the driver
    * hash). The closed form the oracle rebuilds: memberships are
    * calendar prefixes of the A0/A1 assignments (S3 = cur@A0 ∪
    * movers@A1 — the overlap window), probes by the router live at each
    * stage; both refinements mirrored (warm seed), all six searches
    * recomputed relationally. ServeCalendarSpec pins the per-stage
    * census closed form, that arrivals are served the batch they land,
    * and that the mid-rebalance serve genuinely differs from both the
    * pre- and post-rebalance serves on some row (non-vacuous). */
  def knnServeCalendar(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), expr(rebalDriftSql("emb")).as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val base = corpus.filter(!(col("vec_id") % CalMod).isin(1L, 2L, 3L))
    def night(n: Int): DataFrame = corpus.filter(col("vec_id") % CalMod === n)
      .select(col("vec_id"), expr(rebalDriftSql("emb")).as("emb"))
    val a1 = night(1); val a2 = night(2); val a3 = night(3)
    val cent0 = refinedCentroids(spark, base, Centroids)
    val store = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_stores", s"graft_servecal_${dirKey(dir)}").toString

    def probesOf(cent: DataFrame): DataFrame = queries.join(broadcast(cent))
      .select(col("q_id"), col("q_emb"), col("c_id"), cosine6(col("q_emb"), col("c_emb")).as("qcos"))
      .groupBy(col("q_id"))
      .agg(first(col("q_emb")).as("q_emb"),
        graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), Probe).as("top"))
      .select(col("q_id"), col("q_emb"), explode(col("top.id")).as("cell"))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long, Double)]
    def serve(stage: Int, probes: DataFrame): Unit = {
      val back = spark.read.parquet(store)
        .select(col("vec_id"), col("emb"), col("cell").cast("long").as("cell"))
      val scored = back.join(broadcast(probes), "cell")
        .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
        .distinct()
      val census = back
        .agg(count(lit(1)).as("n_rows"), countDistinct(col("vec_id")).as("n_vecs"))
      topKRanked(scored, "q_id", "cos", "vec_id", K)
        .crossJoin(broadcast(census)).collect().foreach(r =>
          out += ((stage.toLong, r.getAs[Long]("n_rows"), r.getAs[Long]("n_vecs"),
            r.getAs[Long]("q_id"), r.getAs[Number]("rank").longValue,
            r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))))
    }
    def append(batch: DataFrame, cent: DataFrame): Unit =
      byCell(cellsOf(batch, cent).select(col("vec_id"), col("emb"), col("cell")))
        .write.partitionBy("cell").mode("append").parquet(store)

    // E0 + S0: the base store under the live model
    landStore(store, cellsOf(base, cent0).select(col("vec_id"), col("emb"), col("cell")))
    val probes0 = graft.CacheRegistry.track(probesOf(cent0).persist())
    serve(0, probes0)
    // E1/E2 + S1/S2: nightly appends, served the batch they land
    append(a1, cent0); serve(1, probes0)
    append(a2, cent0); serve(2, probes0)
    // E3: warm re-train, then №177's add-then-remove waves (gain phase
    // first — every mover gets its new copy before any old copy drops)
    val cur = graft.CacheRegistry.track(base.unionByName(a1).unionByName(a2).persist())
    val cent1 = refinedCentroidsWarm(spark, cur, cent0)
    val j = graft.CacheRegistry.track(
      cellsOf(cur, cent0).select(col("vec_id"), col("emb"), col("cell").as("cell0"))
        .join(cellsOf(cur, cent1).select(col("vec_id"), col("cell").as("cell1")), "vec_id")
        .persist())
    val moverRows = j.filter(col("cell0") =!= col("cell1"))
      .select(col("cell0"), col("cell1")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val m1Counts: Map[Long, Long] = j.groupBy(col("cell1")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gainCells = moverRows.map(_._2).distinct.sorted
    val lossCells = moverRows.map(_._1).distinct.sorted
    val probes1 = graft.CacheRegistry.track(probesOf(cent1).persist())
    if (gainCells.nonEmpty) {
      byCell(j.filter(col("cell0").isin(gainCells.map(Long.box): _*))
          .select(col("vec_id"), col("emb"), col("cell0").as("cell"))
          .unionAll(j.filter(col("cell1").isin(gainCells.map(Long.box): _*) && col("cell0") =!= col("cell1"))
            .select(col("vec_id"), col("emb"), col("cell1").as("cell"))))
        .write.partitionBy("cell").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").parquet(store)
    }
    serve(3, probes1) // MID-REBALANCE: movers double-visible, dedup exact
    if (lossCells.nonEmpty) {
      byCell(j.filter(col("cell1").isin(lossCells.map(Long.box): _*))
          .select(col("vec_id"), col("emb"), col("cell1").as("cell")))
        .write.partitionBy("cell").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").parquet(store)
      lossCells.filter(c => !m1Counts.contains(c)).foreach(c =>
        graft.Fs.rmTree(java.nio.file.Paths.get(store, s"cell=$c")))
    }
    serve(4, probes1)
    // E4 + S5: the next night under the NEW model
    append(a3, cent1); serve(5, probes1)

    import spark.implicits._
    out.toSeq.toDF("stage", "n_rows", "n_vecs", "q_id", "rank", "vec_id", "cos")
      .orderBy(col("stage"), col("q_id"), col("rank"))
  }

  val knnServeCalendarSql: String = {
    val drift = "list_transform(%s, x -> CAST(round(CAST(x AS DOUBLE) * " +
      s"$RebalScale + $RebalShift + 0.000000001, 6) AS FLOAT))"
    def memCte(s: Int, body: String): String = s"sc_mem$s AS ($body)"
    def probeCte(m: Int): String =
      s"""sc_p$m AS (
         |  SELECT q_id, q_emb, c_id AS cell FROM (
         |    SELECT q.q_id, q.q_emb, c.c_id,
         |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "c.c_emb")} DESC, c.c_id) AS prank
         |    FROM sc_q q, sc${m}cent c) x WHERE prank <= $Probe)""".stripMargin
    def searchCte(s: Int): String = {
      val m = if (s <= 2) 0 else 1
      s"""sc_cand$s AS (
         |  SELECT DISTINCT p.q_id, e.vec_id, ${cos6Sql("e.emb", "p.q_emb")} AS cos
         |  FROM sc_mem$s e JOIN sc_p$m p USING (cell)),
         |sc_r$s AS (
         |  SELECT q_id, vec_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
         |  FROM sc_cand$s),
         |sc_cnt$s AS (
         |  SELECT count(*) AS n_rows, count(DISTINCT vec_id) AS n_vecs FROM sc_mem$s)""".stripMargin
    }
    def stageSelect(s: Int): String =
      s"""SELECT CAST($s AS BIGINT) AS stage, c.n_rows, c.n_vecs, r.q_id, r.rank, r.vec_id, r.cos
         |FROM sc_r$s r, sc_cnt$s c WHERE r.rank <= $K""".stripMargin
    def assign(src: String, cent: String, as: String): String =
      s"""SELECT vec_id, c_id AS $as FROM (
         |    SELECT a.vec_id, c.c_id,
         |      row_number() OVER (PARTITION BY a.vec_id ORDER BY ${cos6Sql("a.emb", "c.c_emb")} DESC, c.c_id) AS r
         |    FROM $src a, $cent c) x WHERE r = 1""".stripMargin
    val mems = Seq(
      // S0: base at A0 (nights 1-3 absent)
      memCte(0, s"SELECT vec_id, emb, cell0 AS cell FROM sc_j WHERE vec_id % $CalMod NOT IN (1, 2, 3)"),
      // S1: + night 1's append (assigned under the live model)
      memCte(1, s"SELECT vec_id, emb, cell0 AS cell FROM sc_j WHERE vec_id % $CalMod NOT IN (2, 3)"),
      // S2: + night 2 — the full pre-rebalance store
      memCte(2, "SELECT vec_id, emb, cell0 AS cell FROM sc_j"),
      // S3: the overlap window — everything at A0 plus movers' new copies
      memCte(3, """SELECT vec_id, emb, cell0 AS cell FROM sc_j
        |  UNION ALL SELECT vec_id, emb, cell1 FROM sc_j WHERE cell0 <> cell1""".stripMargin),
      // S4: the rebalanced store
      memCte(4, "SELECT vec_id, emb, cell1 AS cell FROM sc_j"),
      // S5: + night 3 under the NEW model
      memCte(5, """SELECT vec_id, emb, cell1 AS cell FROM sc_j
        |  UNION ALL SELECT a.vec_id, a.emb, j3.cell3 AS cell FROM sc_a3 a JOIN sc_a3j j3 USING (vec_id)""".stripMargin))
    s"""WITH sc_v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |sc_q AS (SELECT vec_id AS q_id, ${drift.format("emb")} AS q_emb
       |  FROM sc_v WHERE vec_id < $NQueries),
       |sc_c AS (SELECT vec_id, emb FROM sc_v WHERE vec_id >= $NQueries),
       |sc_b AS (SELECT vec_id, emb FROM sc_c WHERE vec_id % $CalMod NOT IN (1, 2, 3)),
       |sc_a1 AS (SELECT vec_id, ${drift.format("emb")} AS emb FROM sc_c WHERE vec_id % $CalMod = 1),
       |sc_a2 AS (SELECT vec_id, ${drift.format("emb")} AS emb FROM sc_c WHERE vec_id % $CalMod = 2),
       |sc_a3 AS (SELECT vec_id, ${drift.format("emb")} AS emb FROM sc_c WHERE vec_id % $CalMod = 3),
       |sc_cur AS (SELECT * FROM sc_b UNION ALL SELECT * FROM sc_a1 UNION ALL SELECT * FROM sc_a2),
       |${refinedCentSql("sc_b", "sc0")},
       |${refinedCentSql("sc_cur", "sc1", Centroids, warmFrom = "sc0cent")},
       |sc_j0 AS (${assign("sc_cur", "sc0cent", "cell0")}),
       |sc_j1 AS (${assign("sc_cur", "sc1cent", "cell1")}),
       |sc_j AS (
       |  SELECT a.vec_id, a.emb, j0.cell0, j1.cell1
       |  FROM sc_cur a JOIN sc_j0 j0 USING (vec_id) JOIN sc_j1 j1 USING (vec_id)),
       |sc_a3j AS (${assign("sc_a3", "sc1cent", "cell3")}),
       |${probeCte(0)},
       |${probeCte(1)},
       |${mems.mkString(",\n")},
       |${(0 to 5).map(searchCte).mkString(",\n")}
       |${(0 to 5).map(stageSelect).mkString("\nUNION ALL\n")}
       |ORDER BY stage, q_id, rank""".stripMargin
  }

  val knnIvfCalendarSql: String = {
    val drift = "list_transform(%s, x -> CAST(round(CAST(x AS DOUBLE) * " +
      s"$RebalScale + $RebalShift + 0.000000001, 6) AS FLOAT))"
    def assign(src: String, cent: String, as: String): String =
      s"""SELECT vec_id, c_id AS $as FROM (
         |    SELECT a.vec_id, c.c_id,
         |      row_number() OVER (PARTITION BY a.vec_id ORDER BY ${cos6Sql("a.emb", "c.c_emb")} DESC, c.c_id) AS r
         |    FROM $src a, $cent c) x WHERE r = 1""".stripMargin
    s"""WITH mc_v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |mc_c AS (SELECT vec_id, emb FROM mc_v WHERE vec_id >= $NQueries),
       |mc_b AS (SELECT vec_id, emb FROM mc_c WHERE vec_id % $CalMod NOT IN (1, 2, 3)),
       |mc_a1 AS (SELECT vec_id, ${drift.format("emb")} AS emb FROM mc_c WHERE vec_id % $CalMod = 1),
       |mc_a2 AS (SELECT vec_id, ${drift.format("emb")} AS emb FROM mc_c WHERE vec_id % $CalMod = 2),
       |mc_a3 AS (SELECT vec_id, ${drift.format("emb")} AS emb FROM mc_c WHERE vec_id % $CalMod = 3),
       |mc_cur AS (SELECT * FROM mc_b UNION ALL SELECT * FROM mc_a1 UNION ALL SELECT * FROM mc_a2),
       |${refinedCentSql("mc_b", "mc0")},
       |${refinedCentSql("mc_cur", "mc1", Centroids, warmFrom = "mc0cent")},
       |mc_j0 AS (${assign("mc_cur", "mc0cent", "cell0")}),
       |mc_j1 AS (${assign("mc_cur", "mc1cent", "cell1")}),
       |mc_j AS (SELECT vec_id, cell0, cell1 FROM mc_j0 JOIN mc_j1 USING (vec_id)),
       |mc_chg AS (SELECT * FROM mc_j WHERE cell0 <> cell1),
       |mc_t AS (SELECT DISTINCT cell FROM (
       |  SELECT cell0 AS cell FROM mc_chg UNION ALL SELECT cell1 FROM mc_chg)),
       |mc_arr AS (SELECT vec_id FROM mc_a1 UNION ALL SELECT vec_id FROM mc_a2),
       |mc_s AS (
       |  SELECT
       |    (SELECT count(*) FROM mc_b) AS n_base,
       |    (SELECT count(*) FROM mc_a1) AS n_arr1,
       |    (SELECT count(*) FROM mc_a2) AS n_arr2,
       |    (SELECT count(*) FROM mc_a3) AS n_arr3,
       |    (SELECT count(*) FROM mc_chg) AS n_moved,
       |    (SELECT count(*) FROM mc_t) AS cells_touched,
       |    (SELECT count(*) FROM mc_t WHERE cell NOT IN (SELECT DISTINCT cell1 FROM mc_j)) AS cells_emptied,
       |    (SELECT count(*) FROM mc_j WHERE cell1 IN (SELECT cell FROM mc_t)) AS rows_rebal,
       |    (SELECT count(*) FROM mc_j j JOIN mc_arr a USING (vec_id) WHERE j.cell1 IN (SELECT cell FROM mc_t)) AS rearr_rows,
       |    (SELECT count(*) FROM (SELECT DISTINCT j.cell0 AS cell FROM mc_j j JOIN mc_arr a USING (vec_id)) c
       |       WHERE c.cell IN (SELECT cell FROM mc_t)) AS overlap_cells)
       |SELECT n_base, n_arr1, n_arr2, n_arr3, n_moved, cells_touched, cells_emptied,
       |  rows_rebal, rearr_rows, overlap_cells,
       |  n_arr1 + n_arr2 + rows_rebal + n_arr3 AS composed_bill,
       |  4 * n_base + 4 * n_arr1 + 3 * n_arr2 + n_arr3 AS naive_bill,
       |  CAST(0 AS BIGINT) AS n_store_diff,
       |  (4 * n_base + 4 * n_arr1 + 3 * n_arr2 + n_arr3
       |    - (n_arr1 + n_arr2 + rows_rebal + n_arr3)) * 1000000
       |    // (4 * n_base + 4 * n_arr1 + 3 * n_arr2 + n_arr3) AS saved_ppm
       |FROM mc_s""".stripMargin
  }

  // ---------------------------------------------------------------- №181 knn_res_rebalance
  /** RESIDUAL-MODEL REBALANCE — the cost №175's warm retrain hides when
    * the store adopted №169's residual encoding: residual codes are
    * RELATIVE to their cell's centroid, so ANY centroid move invalidates
    * the codes of every member — and a global warm retrain moves every
    * centroid, degenerating the delta re-encode to a full one. The
    * design that keeps the delta meaningful is LOCAL MODEL REPAIR:
    * re-center only the [[RepairTop]] arrival-hottest cells (one sample
    * M-step under the live assignment — the same md5-sample Lloyd
    * discipline as every refinement, restricted to the repaired cells;
    * codebooks stay FROZEN, the residual distribution being near
    * stationary). Then code validity is per-vector and EXACT: a code is
    * stale iff its vector's new cell is repaired (centroid moved under
    * it) or its assignment changed (it crossed a boundary a repaired
    * centroid moved) — everything else is byte-identical by the pure-
    * function argument, so incremental ≡ full re-encode is PROVABLE,
    * not approximate. The row executes it against the physical store:
    * land full codes under the live model, re-encode ONLY the stale set
    * (`n_reenc` — the compute bill), rewrite exactly the touched cell
    * partitions (`rows_written` — the IO bill; ghosts deleted), read
    * the store back and multiset-diff against a FULL re-encode under
    * the repaired model (oracle predicts 0 — the equality is proven
    * from the files), then serve №169's residual-ADC search from the
    * read-back store. `n_code_changed` publishes the honest interior:
    * how many re-encoded vectors actually changed state (the rest of
    * the bill bought certainty, not change). Oracle rebuilds the base
    * refinement, the hot-cell census, the repair M-step, frozen
    * codebooks, both code assignments and the served search;
    * ResRebalanceSpec pins delta ≡ full row-for-row, the stale-set
    * characterization (outside it, codes0 ≡ codes1), and repair
    * actually moving centroids. */
  val RepairTop = 4

  /** The shared local-repair state of №179/№186: live model + full code
    * store + the deterministic sample-M-step repair of the arrival-hot
    * cells. `modelTag` keys the persisted model table. */
  private case class ResRepair(cur: DataFrame, model0: DataFrame, codes0: DataFrame,
                               hotSet: Set[Long], cent1df: DataFrame, model1: DataFrame, d: Int)

  private def resRepairOf(spark: SparkSession, dir: String, modelTag: String): ResRepair = {
    import spark.implicits._
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val base = corpus.filter(col("vec_id") % RebalArrMod =!= 0)
    val arrivals = corpus.filter(col("vec_id") % RebalArrMod === 0)
      .select(col("vec_id"), expr(rebalDriftSql("emb")).as("emb"))
    val cur = graft.CacheRegistry.track(base.unionByName(arrivals).persist())
    val model0 = resModelOf(spark, s"${modelTag}_${dirKey(dir)}_m$PquM", base)
    val d = model0.filter(col("m") === -1).selectExpr("size(c_emb)").head().getInt(0)
    val codes0 = graft.CacheRegistry.track(encodeCellsRes(cur, model0, PquM, d).persist())

    // LOCAL REPAIR: top-RepairTop arrival-hot cells re-centered with one
    // sample M-step; all other centroids and all codebooks untouched
    val hotSet = codes0.filter(col("vec_id") % RebalArrMod === 0)
      .groupBy(col("cell")).agg(count(lit(1)).as("n_a"))
      .orderBy(col("n_a").desc, col("cell")).limit(RepairTop)
      .collect().map(_.getLong(0)).toSet
    val cent0Arr = model0.filter(col("m") === -1).select(col("c_id"), col("c_emb"))
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val samp = hashSample(cur, SampleM)
    val assigned = samp.map { e =>
      var bestCid = 0L; var bestCos = Double.NegativeInfinity
      cent0Arr.foreach { case (cid, ce) =>
        val cv = cos6Local(e, ce)
        if (cv > bestCos) { bestCos = cv; bestCid = cid }
      }
      (bestCid, e)
    }
    // groupBy preserves encounter (= sample rank) order per key — the
    // oracle's list(ORDER BY rk), same contract as lloydIter
    val means = assigned.groupBy(_._1).map { case (cid, members) =>
      val n = members.length
      cid -> Array.tabulate(members(0)._2.length) { i =>
        var s = 0.0
        members.foreach(m => s += m._2(i).toDouble)
        round6(s / n + 1e-9).toFloat
      }
    }
    val cent1df = cent0Arr.map { case (cid, ce) =>
      if (hotSet(cid) && means.contains(cid)) (cid, means(cid)) else (cid, ce)
    }.toSeq.toDF("c_id", "c_emb")
    val model1 = graft.CacheRegistry.track(
      cent1df.select(lit(-1).as("m"), col("c_id"), col("c_emb"))
        .unionByName(model0.filter(col("m") >= 0).select(col("m"), col("c_id"), col("c_emb")))
        .persist())
    ResRepair(cur, model0, codes0, hotSet, cent1df, model1, d)
  }

  def knnResRebalance(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val st = resRepairOf(spark, dir, "graft_resreb_model")
    val cur = st.cur; val model0 = st.model0; val codes0 = st.codes0
    val hotSet = st.hotSet; val cent1df = st.cent1df; val model1 = st.model1; val d = st.d
    val codeCols = (0 until PquM).map(m => s"code_$m")

    // the serving store: full residual codes under the live model
    val store = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_stores", s"graft_resreb_${dirKey(dir)}").toString
    landStore(store, codes0)

    // the stale set: new cell repaired, or assignment changed
    val cells1 = cellsOf(cur, cent1df).select(col("vec_id"), col("cell").as("cell1"))
    val j = graft.CacheRegistry.track(
      codes0.withColumnRenamed("cell", "cell0").join(cells1, "vec_id").persist())
    val isStale = col("cell1").isin(hotSet.toSeq.map(Long.box): _*) ||
      col("cell0") =!= col("cell1")
    val reenc = j.filter(isStale)
    // compute bill: re-encode ONLY the stale vectors under the repaired model
    val fresh = graft.CacheRegistry.track(
      encodeCellsRes(cur.join(reenc.select(col("vec_id")), "vec_id"), model1, PquM, d)
        .persist())
    val touchedArr = reenc.select(col("cell0").as("cell"))
      .unionAll(reenc.select(col("cell1").as("cell"))).distinct()
      .collect().map(_.getLong(0)).sorted // ≤ C
    // IO bill: touched partitions rewritten wholesale — stale rows fresh,
    // unchanged stayers carried from the live store state
    val keep = j.filter(!isStale && col("cell0").isin(touchedArr.map(Long.box): _*))
      .select((col("vec_id") +: col("cell0").as("cell") +: codeCols.map(col)): _*)
    val newContent = graft.CacheRegistry.track(
      fresh.select((col("vec_id") +: col("cell") +: codeCols.map(col)): _*)
        .unionByName(keep).persist())
    byCell(newContent).write.partitionBy("cell").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(store)
    val presentCells = newContent.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSet
    touchedArr.filterNot(presentCells).foreach(c =>
      graft.Fs.rmTree(java.nio.file.Paths.get(store, s"cell=$c")))

    // the files are the proof: read back ≡ a FULL re-encode under model1
    val back = graft.CacheRegistry.track(spark.read.parquet(store)
      .select((col("vec_id") +: col("cell").cast("long").as("cell") +: codeCols.map(col)): _*)
      .persist())
    val full = encodeCellsRes(cur, model1, PquM, d)
    val diff = multisetDiff(back,
      full.select((col("vec_id") +: col("cell") +: codeCols.map(col)): _*),
      "vec_id" +: "cell" +: codeCols)
    val changed = fresh.as("f")
      .join(codes0.withColumnRenamed("cell", "cell0").as("o"), "vec_id")
      .filter(col("f.cell") =!= col("o.cell0") ||
        codeCols.map(cc => col(s"f.$cc") =!= col(s"o.$cc")).reduce(_ || _))
      .agg(count(lit(1)).as("n_code_changed"))

    val summary = j.agg(count(lit(1)).as("n_total"),
        sum(when(col("cell0") =!= col("cell1"), 1L).otherwise(0L)).as("n_moved"),
        sum(when(isStale, 1L).otherwise(0L)).as("n_reenc"))
      .crossJoin(broadcast(newContent.agg(count(lit(1)).as("rows_written"))))
      .crossJoin(broadcast(changed)).crossJoin(broadcast(diff))
      .select(col("n_total"), lit(hotSet.size.toLong).as("n_repaired"),
        col("n_moved"), col("n_reenc"),
        expr("n_reenc * 1000000 DIV n_total").as("reenc_bill_ppm"),
        col("rows_written"),
        expr("rows_written * 1000000 DIV n_total").as("write_bill_ppm"),
        col("n_code_changed"), col("n_store_diff"))
    ivfPqResSearch(spark, back, model1, cur, queries, d)
      .crossJoin(broadcast(summary))
      .orderBy(col("q_id"), col("rank"))
  }

  /** Bench hook: drop №181's persisted residual model (the №162
    * cold-build discipline — the parquet code store re-lands every run
    * and needs no drop). */
  def dropResRebalanceCaches(spark: SparkSession, dir: String): Unit = {
    val t = s"graft_resreb_model_${dirKey(dir)}_m$PquM"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val path = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_models", t)
    if (java.nio.file.Files.exists(path)) graft.Fs.rmTree(path)
  }

  // ---------------------------------------------------------------- №186 knn_res_serve_repair
  /** SERVING THE RESIDUAL STORE THROUGH ITS LOCAL REPAIR — the
    * consistency corner raw stores don't have: №177's add-then-remove
    * waves make a raw rewrite lossless because any copy of a vector is
    * self-sufficient, but a RESIDUAL code is only decodable against the
    * centroid it was encoded under — №179's repair moves [[RepairTop]]
    * centroids AND re-encodes the stale rows, so mid-repair a cell can
    * legitimately hold old-coded and new-coded rows at once, and a
    * reader pairing codes with the wrong centroid version computes
    * silently wrong ADC distances (the TORN read). The protocol that
    * closes it: every stored row CARRIES the model version its codes
    * were encoded under (`model_v` — one tiny column; codebooks are
    * frozen by №179's argument, so only the centroid term is
    * version-sensitive), both centroid versions stay live as
    * constant-size broadcasts, and the reader decodes each row against
    * ITS version: adc(row) = q·c(cell, v_row) + Σ LUT[code]. With rows
    * self-describing, №177's add-then-remove carries over: the gain
    * phase appends the re-encoded stale rows (v1) next to their old
    * copies (v0) — a stale stayer exists twice IN THE SAME CELL at
    * different versions, both decoding correctly — and the loss phase
    * drops the old copies. Serves at S0 (pre-repair), S1 (mid-repair,
    * the overlap) and S2 (post-repair) read the FILES back; duplicate
    * copies collapse by max-adc per (q_id, vec_id) before the exact
    * rerank, so the serve is exact at every stage. The row also
    * MEASURES the torn read it prevents: S1 decoded with v0 centroids
    * for every row (the reader that never reloaded the model) computes
    * `torn_adc_diverged` wrong candidate distances and diverges the
    * RerankR shortlist by `torn_shortlist_diff` entries (measured
    * sf0.01 under №177's drifted traffic — which routes exactly into
    * the repaired hot cells: 1654 wrong distances, 336 shortlist
    * divergences) — the quantified reason the version column exists.
    * Oracle rebuilds the
    * repair chain, all three version-paired serves and the torn
    * shortlist relationally; ResServeRepairSpec pins the census closed
    * form (S1 = n_total + n_stale rows, n_vecs constant), version
    * mixing genuinely present mid-repair, and the final store equal to
    * №179's end state. */
  def knnResServeRepair(spark: SparkSession, dir: String): DataFrame = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    // №177's convention: the traffic that matters mid-repair is the
    // DRIFTED traffic — it routes into the arrival-hot (repaired) cells,
    // which is exactly where the torn decode can bite
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), expr(rebalDriftSql("emb")).as("q_emb"))
    val st = resRepairOf(spark, dir, "graft_ressrv_model")
    val cur = st.cur; val model0 = st.model0; val codes0 = st.codes0
    val cent1df = st.cent1df; val d = st.d
    val codeCols = (0 until PquM).map(m => s"code_$m")
    val cent0df = model0.filter(col("m") === -1).select(col("c_id"), col("c_emb"))

    // the stale set and its re-encode under the repaired model (№179's
    // definitions verbatim — same spec of staleness)
    val cells1 = cellsOf(cur, cent1df).select(col("vec_id"), col("cell").as("cell1"))
    val j = graft.CacheRegistry.track(
      codes0.withColumnRenamed("cell", "cell0").join(cells1, "vec_id").persist())
    val isStale = col("cell1").isin(st.hotSet.toSeq.map(Long.box): _*) ||
      col("cell0") =!= col("cell1")
    val fresh = graft.CacheRegistry.track(
      encodeCellsRes(cur.join(j.filter(isStale).select(col("vec_id")), "vec_id"),
        st.model1, PquM, d).persist())

    val store = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_stores", s"graft_ressrv_${dirKey(dir)}").toString
    val vcols = col("vec_id") +: col("cell") +: codeCols.map(col) :+ col("model_v")
    landStore(store, codes0.withColumn("model_v", lit(0)).select(vcols: _*))

    // versioned centroids: the decode pairing table (2·C rows, broadcast)
    val centV = graft.CacheRegistry.track(
      cent0df.select(lit(0).as("model_v"), col("c_id").as("cell"), col("c_emb"))
        .unionByName(cent1df.select(lit(1).as("model_v"), col("c_id").as("cell"), col("c_emb")))
        .persist())
    val luts = (0 until PquM).map { m =>
      queries.crossJoin(broadcast(model0.filter(col("m") === m).select(col("c_id"), col("c_emb"))))
        .select(col("q_id"), col("c_id").as(s"code_$m"),
          round(graft.functions.VectorOps.dot(subCol(col("q_emb"), m, PquM, d), col("c_emb")) + lit(1e-9), 6)
            .as(s"part_$m"))
    }
    def probesOf(cent: DataFrame): DataFrame = queries.join(broadcast(cent))
      .select(col("q_id"), col("q_emb"), col("c_id"), cosine6(col("q_emb"), col("c_emb")).as("qcos"))
      .groupBy(col("q_id"))
      .agg(first(col("q_emb")).as("q_emb"),
        graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), Probe).as("top"))
      .select(col("q_id"), col("q_emb"), explode(col("top.id")).as("cell"))
    val probes0 = graft.CacheRegistry.track(probesOf(cent0df).persist())
    val probes1 = graft.CacheRegistry.track(probesOf(cent1df).persist())

    /** Version-paired per-(q, vec) max-ADC frame over the store's files;
      * `torn` pairs every row with v0 instead (the stale-reader decode). */
    def adcOf(back: DataFrame, probes: DataFrame, torn: Boolean): DataFrame = {
      val qcV = probes.join(broadcast(centV), "cell")
        .select(col("q_id"), col("cell"), col("model_v"),
          round(graft.functions.VectorOps.dot(col("q_emb"), col("c_emb")) + lit(1e-9), 6).as("qc"))
      val joined = (0 until PquM).foldLeft(
        back.join(broadcast(probes.select(col("q_id"), col("cell"))), "cell")) { (df, m) =>
        df.join(broadcast(luts(m)), Seq("q_id", s"code_$m"))
      }
      val withQc =
        if (torn) joined.drop("model_v")
          .join(broadcast(qcV.filter(col("model_v") === 0).drop("model_v")), Seq("q_id", "cell"))
        else joined.join(broadcast(qcV), Seq("q_id", "cell", "model_v"))
      val adc = round(col("qc") + (0 until PquM).map(m => col(s"part_$m")).reduce(_ + _) + lit(1e-9), 6)
      // overlap copies of one vector collapse by max adc — both decode
      // correctly, the better approximation wins deterministically
      withQc.select(col("q_id"), col("vec_id"), adc.as("adc"))
        .groupBy(col("q_id"), col("vec_id")).agg(max(col("adc")).as("adc"))
    }
    def shortlistOf(adcFrame: DataFrame): DataFrame =
      topKRanked(adcFrame, "q_id", "adc", "vec_id", RerankR).select(col("q_id"), col("vec_id"))
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long, Double)]
    var tornDiff = -1L
    var tornAdcDiverged = -1L
    def serve(stage: Int, probes: DataFrame): Unit = {
      val back = graft.CacheRegistry.track(spark.read.parquet(store)
        .select((col("vec_id") +: col("cell").cast("long").as("cell") +:
          codeCols.map(col) :+ col("model_v").cast("int").as("model_v")): _*).persist())
      val paired = adcOf(back, probes, torn = false)
      val shortlist = shortlistOf(paired)
      if (stage == 1) {
        val tornAdc = adcOf(back, probes, torn = true)
        tornDiff = {
          val t = shortlistOf(tornAdc)
          shortlist.exceptAll(t).count() + t.exceptAll(shortlist).count()
        }
        // the rows whose DISTANCE is computed wrong under the torn decode
        // — nonzero whenever a probed cell holds v1 rows, whether or not
        // the error crosses the shortlist boundary at this scale
        tornAdcDiverged = paired.join(tornAdc.withColumnRenamed("adc", "adc_t"), Seq("q_id", "vec_id"))
          .filter(col("adc") =!= col("adc_t")).count()
      }
      val census = back.agg(count(lit(1)).as("n_rows"), countDistinct(col("vec_id")).as("n_vecs"))
      val rescored = cur.join(broadcast(shortlist), "vec_id")
        .join(broadcast(queries), "q_id")
        .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
      topKRanked(rescored, "q_id", "cos", "vec_id", K)
        .crossJoin(broadcast(census)).collect().foreach(r =>
          out += ((stage.toLong, r.getAs[Long]("n_rows"), r.getAs[Long]("n_vecs"),
            r.getAs[Long]("q_id"), r.getAs[Number]("rank").longValue,
            r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))))
    }

    serve(0, probes0)
    // GAIN phase: append the re-encoded stale rows (v1) into their cells
    // next to the old copies — per-cell-atomic dynamic overwrites of the
    // gaining cells, old content carried so no reader ever loses a row
    // Gain-cell content is derived from the CACHED codes0 frame (the
    // store's exact content at this point — landStore wrote codes0@v0),
    // never by reading the store path and dynamically overwriting it in
    // one job (r13 advice: that shape depends on every read task
    // finishing before the overwrite commit deletes source files —
    // fragile under task retry; knnServeCalendar set the precedent).
    val gainCells = fresh.select(col("cell")).distinct()
    byCell(codes0.withColumn("model_v", lit(0)).select(vcols: _*)
        .join(broadcast(gainCells), "cell")
        .unionByName(fresh.withColumn("model_v", lit(1)).select(vcols: _*)))
      .write.partitionBy("cell").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(store)
    serve(1, probes1)
    // LOSS phase: touched cells to their final content (keep rows v0 ∪
    // fresh rows v1); emptied cells' ghost partitions deleted
    val touchedArr = j.filter(isStale).select(col("cell0").as("cell"))
      .unionAll(fresh.select(col("cell"))).distinct()
      .collect().map(_.getLong(0)).sorted
    val finalContent = graft.CacheRegistry.track(
      j.filter(!isStale && col("cell0").isin(touchedArr.map(Long.box): _*))
        .select((col("vec_id") +: col("cell0").as("cell") +: codeCols.map(col) :+ lit(0).as("model_v")): _*)
        .unionByName(fresh.withColumn("model_v", lit(1)).select(vcols: _*))
        .persist())
    byCell(finalContent).write.partitionBy("cell").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(store)
    val presentCells = finalContent.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSet
    touchedArr.filterNot(presentCells).foreach(c =>
      graft.Fs.rmTree(java.nio.file.Paths.get(store, s"cell=$c")))
    serve(2, probes1)

    import spark.implicits._
    val summary = j.agg(count(lit(1)).as("n_total"),
        sum(when(isStale, 1L).otherwise(0L)).as("n_stale"))
      .select(col("n_total"), lit(st.hotSet.size.toLong).as("n_repaired"),
        col("n_stale"), lit(tornDiff).as("torn_shortlist_diff"),
        lit(tornAdcDiverged).as("torn_adc_diverged"))
    out.toSeq.toDF("stage", "n_rows", "n_vecs", "q_id", "rank", "vec_id", "cos")
      .crossJoin(broadcast(summary))
      .orderBy(col("stage"), col("q_id"), col("rank"))
  }

  /** Bench hook: №186's persisted model (same discipline as №181's). */
  def dropResServeRepairCaches(spark: SparkSession, dir: String): Unit = {
    val t = s"graft_ressrv_model_${dirKey(dir)}_m$PquM"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val path = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_models", t)
    if (java.nio.file.Files.exists(path)) graft.Fs.rmTree(path)
  }

  val knnResServeRepairSql: String = {
    val p = "rsv"
    val drift = "list_transform(%s, x -> CAST(round(CAST(x AS DOUBLE) * " +
      s"$RebalScale + $RebalShift + 0.000000001, 6) AS FLOAT))"
    def subOf(src: String, m: Int): String = {
      val w = s"(len($src) // $PquM)"
      if (m < PquM - 1) s"list_slice($src, $m * $w + 1, ${m + 1} * $w)"
      else s"list_slice($src, ${PquM - 1} * $w + 1, len($src))"
    }
    def residCte(name: String, src: String, cells: String, cent: String): String =
      s"""$name AS (
         |  SELECT s.vec_id, cl.cell,
         |    list_transform(range(1, len(s.emb)+1), i ->
         |      CAST(round(CAST(s.emb[i] AS DOUBLE) - CAST(ct.c_emb[i] AS DOUBLE) + 0.000000001, 6) AS FLOAT)) AS remb
         |  FROM $src s JOIN $cells cl ON cl.vec_id = s.vec_id JOIN $cent ct ON ct.c_id = cl.cell)""".stripMargin
    def assignCte(name: String, src: String, cent: String): String =
      s"""$name AS (
         |  SELECT vec_id, c_id AS cell FROM (
         |    SELECT s.vec_id, c.c_id,
         |      row_number() OVER (PARTITION BY s.vec_id ORDER BY ${cos6Sql("s.emb", "c.c_emb")} DESC, c.c_id) AS r
         |    FROM $src s, $cent c) x WHERE r = 1)""".stripMargin
    def codeCtes(tag: String, rc: String): String = (0 until PquM).map { m =>
      s"""${p}$tag$m AS (
         |  SELECT vec_id, c_id AS code_$m FROM (
         |    SELECT s.vec_id, a.c_id,
         |      row_number() OVER (PARTITION BY s.vec_id ORDER BY ${cos6Sql("s.emb", "a.c_emb")} DESC, a.c_id) AS rk
         |    FROM (SELECT vec_id, ${subOf("remb", m)} AS emb FROM $rc) s, ${p}k${m}_cent a) x WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    def codesJoin(tag: String): String =
      (1 until PquM).foldLeft(s"${p}$tag" + "0")((acc, m) => s"$acc JOIN ${p}$tag$m USING (vec_id)")
    val bsubs = (0 until PquM).map(m =>
      s"${p}s$m AS (SELECT vec_id, ${subOf("remb", m)} AS emb FROM ${p}rc0b)").mkString(",\n")
    val cents = (0 until PquM).map(m =>
      refinedCentSql(s"${p}s$m", s"${p}k${m}_", PqCodebook)).mkString(",\n")
    val lutCtes = (0 until PquM).map { m =>
      s"""${p}l$m AS (
         |  SELECT q.q_id, a.c_id AS code_$m,
         |    round(list_sum(list_transform(range(1, len(${subOf("q.q_emb", m)})+1),
         |      i -> CAST((${subOf("q.q_emb", m)})[i] AS DOUBLE) * CAST(a.c_emb[i] AS DOUBLE))) + 0.000000001, 6) AS part_$m
         |  FROM q, ${p}k${m}_cent a)""".stripMargin
    }.mkString(",\n")
    val lutJoin = (0 until PquM).map(m => s"JOIN ${p}l$m USING (q_id, code_$m)").mkString(" ")
    val adcSum = (0 until PquM).map(m => s"part_$m").mkString(" + ")
    val codeSel = (0 until PquM).map(m => s"code_$m").mkString(", ")
    def probeCte(name: String, cent: String): String =
      s"""$name AS (
         |  SELECT q_id, c_id AS cell FROM (
         |    SELECT q.q_id, c.c_id,
         |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "c.c_emb")} DESC, c.c_id) AS prank
         |    FROM q, $cent c) x WHERE prank <= $Probe)""".stripMargin
    // version-paired shortlist over a stage's content; torn forces v = 0
    def shortCte(s: Int, content: String, probes: String, torn: Boolean, name: String): String = {
      val qcJoin = if (torn) s"JOIN ${p}qcv qc ON qc.q_id = pr.q_id AND qc.cell = ct.cell AND qc.v = 0"
                   else s"JOIN ${p}qcv qc ON qc.q_id = pr.q_id AND qc.cell = ct.cell AND qc.v = ct.v"
      s"""${name}c AS MATERIALIZED (
         |  SELECT pr.q_id, ct.vec_id, max(round(qc.qc + $adcSum + 0.000000001, 6)) AS adc
         |  FROM $content ct JOIN $probes pr ON pr.cell = ct.cell $lutJoin
         |  $qcJoin
         |  GROUP BY pr.q_id, ct.vec_id),
         |$name AS MATERIALIZED (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) AS rank
         |    FROM ${name}c) x WHERE rank <= $RerankR)""".stripMargin
    }
    def serveCte(s: Int, content: String): String =
      s"""${p}rr$s AS MATERIALIZED (
         |  SELECT s.q_id, s.vec_id, ${cos6Sql("cc.emb", "qq.q_emb")} AS cos,
         |    row_number() OVER (PARTITION BY s.q_id ORDER BY ${cos6Sql("cc.emb", "qq.q_emb")} DESC, s.vec_id) AS rank
         |  FROM ${p}sl$s s JOIN cur cc ON cc.vec_id = s.vec_id JOIN q qq ON qq.q_id = s.q_id),
         |${p}cnt$s AS MATERIALIZED (
         |  SELECT count(*) AS n_rows, count(DISTINCT vec_id) AS n_vecs FROM $content)""".stripMargin
    def stageSelect(s: Int): String =
      s"""SELECT CAST($s AS BIGINT) AS stage, c.n_rows, c.n_vecs, r.q_id, r.rank, r.vec_id, r.cos,
         |  m.n_total, m.n_repaired, m.n_stale, m.torn_shortlist_diff, m.torn_adc_diverged
         |FROM ${p}rr$s r, ${p}cnt$s c, ${p}sum m WHERE r.rank <= $K""".stripMargin
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |q AS (SELECT vec_id AS q_id, ${drift.format("emb")} AS q_emb FROM v WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id, emb FROM v WHERE vec_id >= $NQueries),
       |b AS (SELECT vec_id, emb FROM c WHERE vec_id % $RebalArrMod <> 0),
       |r AS (SELECT vec_id, ${drift.format("emb")} AS emb FROM c WHERE vec_id % $RebalArrMod = 0),
       |cur AS MATERIALIZED (SELECT * FROM b UNION ALL SELECT * FROM r),
       |${refinedCentSql("b", s"${p}0")},
       |${assignCte(s"${p}cells0", "cur", s"${p}0cent")},
       |${p}hot AS MATERIALIZED (SELECT cell FROM (
       |  SELECT cell, count(*) AS n_a FROM ${p}cells0
       |  WHERE vec_id % $RebalArrMod = 0 GROUP BY cell
       |  ORDER BY n_a DESC, cell LIMIT $RepairTop)),
       |${p}samp AS (
       |  SELECT emb, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
       |  FROM cur QUALIFY rk <= $SampleM),
       |${p}sa AS (
       |  SELECT rk, emb, cid FROM (
       |    SELECT s.rk, s.emb, c.c_id AS cid,
       |      row_number() OVER (PARTITION BY s.rk ORDER BY ${cos6Sql("s.emb", "c.c_emb")} DESC, c.c_id) AS rr
       |    FROM ${p}samp s, ${p}0cent c) x WHERE rr = 1),
       |${p}sg AS (SELECT cid, list(emb ORDER BY rk) AS embs, count(*) AS n FROM ${p}sa GROUP BY cid),
       |${p}su AS (
       |  SELECT cid, list_transform(range(1, len(embs[1]) + 1), i ->
       |    CAST(round(list_sum(list_transform(embs, e -> CAST(e[i] AS DOUBLE))) / n + 0.000000001, 6) AS FLOAT)) AS cemb
       |  FROM ${p}sg),
       |cent AS MATERIALIZED (
       |  SELECT c.c_id,
       |    CASE WHEN c.c_id IN (SELECT cell FROM ${p}hot) AND u.cemb IS NOT NULL
       |      THEN u.cemb ELSE c.c_emb END AS c_emb
       |  FROM ${p}0cent c LEFT JOIN ${p}su u ON u.cid = c.c_id),
       |${assignCte(s"${p}cells1", "cur", "cent")},
       |${residCte(s"${p}rc0b", "b", s"${p}cells0", s"${p}0cent")},
       |$bsubs,
       |$cents,
       |${residCte(s"${p}rc0", "cur", s"${p}cells0", s"${p}0cent")},
       |${residCte(s"${p}rc1", "cur", s"${p}cells1", "cent")},
       |${codeCtes("o", s"${p}rc0")},
       |${codeCtes("n", s"${p}rc1")},
       |${p}codes0 AS MATERIALIZED (SELECT * FROM ${codesJoin("o")}),
       |${p}codes1 AS MATERIALIZED (SELECT * FROM ${codesJoin("n")}),
       |${p}j AS MATERIALIZED (
       |  SELECT a.vec_id, a.cell AS cell0, b.cell AS cell1,
       |    (b.cell IN (SELECT cell FROM ${p}hot) OR a.cell <> b.cell) AS stale
       |  FROM ${p}cells0 a JOIN ${p}cells1 b USING (vec_id)),
       |${probeCte(s"${p}p0", s"${p}0cent")},
       |${probeCte(s"${p}p1", "cent")},
       |$lutCtes,
       |${p}qcv AS MATERIALIZED (
       |  SELECT q.q_id, cc.c_id AS cell, 0 AS v,
       |    round(list_sum(list_transform(range(1, len(q.q_emb)+1),
       |      i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(cc.c_emb[i] AS DOUBLE))) + 0.000000001, 6) AS qc
       |  FROM q, ${p}0cent cc
       |  UNION ALL
       |  SELECT q.q_id, cc.c_id, 1,
       |    round(list_sum(list_transform(range(1, len(q.q_emb)+1),
       |      i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(cc.c_emb[i] AS DOUBLE))) + 0.000000001, 6)
       |  FROM q, cent cc),
       |${p}old AS MATERIALIZED (
       |  SELECT j.vec_id, j.cell0 AS cell, 0 AS v, $codeSel, j.stale
       |  FROM ${p}j j JOIN ${p}codes0 USING (vec_id)),
       |${p}frsh AS MATERIALIZED (
       |  SELECT j.vec_id, j.cell1 AS cell, 1 AS v, $codeSel
       |  FROM ${p}j j JOIN ${p}codes1 USING (vec_id) WHERE j.stale),
       |${p}ct0 AS (SELECT vec_id, cell, v, $codeSel FROM ${p}old),
       |${p}ct1 AS MATERIALIZED (
       |  SELECT vec_id, cell, v, $codeSel FROM ${p}old
       |  UNION ALL SELECT * FROM ${p}frsh),
       |${p}ct2 AS MATERIALIZED (
       |  SELECT vec_id, cell, v, $codeSel FROM ${p}old WHERE NOT stale
       |  UNION ALL SELECT * FROM ${p}frsh),
       |${shortCte(0, s"${p}ct0", s"${p}p0", torn = false, s"${p}sl0")},
       |${shortCte(1, s"${p}ct1", s"${p}p1", torn = false, s"${p}sl1")},
       |${shortCte(1, s"${p}ct1", s"${p}p1", torn = true, s"${p}tl1")},
       |${shortCte(2, s"${p}ct2", s"${p}p1", torn = false, s"${p}sl2")},
       |${serveCte(0, s"${p}ct0")},
       |${serveCte(1, s"${p}ct1")},
       |${serveCte(2, s"${p}ct2")},
       |${p}sum AS MATERIALIZED (
       |  SELECT
       |    (SELECT count(*) FROM ${p}j) AS n_total,
       |    (SELECT count(*) FROM ${p}hot) AS n_repaired,
       |    (SELECT count(*) FROM ${p}j WHERE stale) AS n_stale,
       |    (SELECT count(*) FROM (
       |       SELECT q_id, vec_id FROM ${p}sl1 EXCEPT SELECT q_id, vec_id FROM ${p}tl1)) +
       |    (SELECT count(*) FROM (
       |       SELECT q_id, vec_id FROM ${p}tl1 EXCEPT SELECT q_id, vec_id FROM ${p}sl1)) AS torn_shortlist_diff,
       |    (SELECT count(*) FROM ${p}sl1c a JOIN ${p}tl1c b USING (q_id, vec_id)
       |       WHERE a.adc <> b.adc) AS torn_adc_diverged)
       |${(0 to 2).map(stageSelect).mkString("\nUNION ALL\n")}
       |ORDER BY stage, q_id, rank""".stripMargin
  }

  val knnResRebalanceSql: String = {
    val p = "rrb"
    val drift = "list_transform(%s, x -> CAST(round(CAST(x AS DOUBLE) * " +
      s"$RebalScale + $RebalShift + 0.000000001, 6) AS FLOAT))"
    def subOf(src: String, m: Int): String = {
      val w = s"(len($src) // $PquM)"
      if (m < PquM - 1) s"list_slice($src, $m * $w + 1, ${m + 1} * $w)"
      else s"list_slice($src, ${PquM - 1} * $w + 1, len($src))"
    }
    def residCte(name: String, src: String, cells: String, cent: String): String =
      s"""$name AS (
         |  SELECT s.vec_id, cl.cell,
         |    list_transform(range(1, len(s.emb)+1), i ->
         |      CAST(round(CAST(s.emb[i] AS DOUBLE) - CAST(ct.c_emb[i] AS DOUBLE) + 0.000000001, 6) AS FLOAT)) AS remb
         |  FROM $src s JOIN $cells cl ON cl.vec_id = s.vec_id JOIN $cent ct ON ct.c_id = cl.cell)""".stripMargin
    def assignCte(name: String, src: String, cent: String): String =
      s"""$name AS (
         |  SELECT vec_id, c_id AS cell FROM (
         |    SELECT s.vec_id, c.c_id,
         |      row_number() OVER (PARTITION BY s.vec_id ORDER BY ${cos6Sql("s.emb", "c.c_emb")} DESC, c.c_id) AS r
         |    FROM $src s, $cent c) x WHERE r = 1)""".stripMargin
    // code assignment of residual frame `rc` against the frozen codebooks
    def codeCtes(tag: String, rc: String): String = (0 until PquM).map { m =>
      s"""${p}$tag$m AS (
         |  SELECT vec_id, c_id AS code_$m FROM (
         |    SELECT s.vec_id, a.c_id,
         |      row_number() OVER (PARTITION BY s.vec_id ORDER BY ${cos6Sql("s.emb", "a.c_emb")} DESC, a.c_id) AS rk
         |    FROM (SELECT vec_id, ${subOf("remb", m)} AS emb FROM $rc) s, ${p}k${m}_cent a) x WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    def codesJoin(tag: String): String =
      (1 until PquM).foldLeft(s"${p}$tag" + "0")((acc, m) => s"$acc JOIN ${p}$tag$m USING (vec_id)")
    val bsubs = (0 until PquM).map(m =>
      s"${p}s$m AS (SELECT vec_id, ${subOf("remb", m)} AS emb FROM ${p}rc0b)").mkString(",\n")
    val cents = (0 until PquM).map(m =>
      refinedCentSql(s"${p}s$m", s"${p}k${m}_", PqCodebook)).mkString(",\n")
    val lutCtes = (0 until PquM).map { m =>
      s"""${p}l$m AS (
         |  SELECT q.q_id, a.c_id AS code_$m,
         |    round(list_sum(list_transform(range(1, len(${subOf("q.q_emb", m)})+1),
         |      i -> CAST((${subOf("q.q_emb", m)})[i] AS DOUBLE) * CAST(a.c_emb[i] AS DOUBLE))) + 0.000000001, 6) AS part_$m
         |  FROM q, ${p}k${m}_cent a)""".stripMargin
    }.mkString(",\n")
    val lutJoin = (0 until PquM).map(m => s"JOIN ${p}l$m USING (q_id, code_$m)").mkString(" ")
    val adcSum = (0 until PquM).map(m => s"part_$m").mkString(" + ")
    val codeNe = (0 until PquM).map(m => s"c1.code_$m <> c0.code_$m").mkString(" OR ")
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |q AS (SELECT vec_id AS q_id, emb AS q_emb FROM v WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id, emb FROM v WHERE vec_id >= $NQueries),
       |b AS (SELECT vec_id, emb FROM c WHERE vec_id % $RebalArrMod <> 0),
       |r AS (SELECT vec_id, ${drift.format("emb")} AS emb FROM c WHERE vec_id % $RebalArrMod = 0),
       |cur AS (SELECT * FROM b UNION ALL SELECT * FROM r),
       |${refinedCentSql("b", s"${p}0")},
       |${assignCte(s"${p}cells0", "cur", s"${p}0cent")},
       |${p}hot AS (SELECT cell FROM (
       |  SELECT cell, count(*) AS n_a FROM ${p}cells0
       |  WHERE vec_id % $RebalArrMod = 0 GROUP BY cell
       |  ORDER BY n_a DESC, cell LIMIT $RepairTop)),
       |${p}samp AS (
       |  SELECT emb, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
       |  FROM cur QUALIFY rk <= $SampleM),
       |${p}sa AS (
       |  SELECT rk, emb, cid FROM (
       |    SELECT s.rk, s.emb, c.c_id AS cid,
       |      row_number() OVER (PARTITION BY s.rk ORDER BY ${cos6Sql("s.emb", "c.c_emb")} DESC, c.c_id) AS rr
       |    FROM ${p}samp s, ${p}0cent c) x WHERE rr = 1),
       |${p}sg AS (SELECT cid, list(emb ORDER BY rk) AS embs, count(*) AS n FROM ${p}sa GROUP BY cid),
       |${p}su AS (
       |  SELECT cid, list_transform(range(1, len(embs[1]) + 1), i ->
       |    CAST(round(list_sum(list_transform(embs, e -> CAST(e[i] AS DOUBLE))) / n + 0.000000001, 6) AS FLOAT)) AS cemb
       |  FROM ${p}sg),
       |cent AS (
       |  SELECT c.c_id,
       |    CASE WHEN c.c_id IN (SELECT cell FROM ${p}hot) AND u.cemb IS NOT NULL
       |      THEN u.cemb ELSE c.c_emb END AS c_emb
       |  FROM ${p}0cent c LEFT JOIN ${p}su u ON u.cid = c.c_id),
       |${assignCte(s"${p}cells1", "cur", "cent")},
       |${residCte(s"${p}rc0b", "b", s"${p}cells0", s"${p}0cent")},
       |$bsubs,
       |$cents,
       |${residCte(s"${p}rc0", "cur", s"${p}cells0", s"${p}0cent")},
       |${residCte(s"${p}rc1", "cur", s"${p}cells1", "cent")},
       |${codeCtes("o", s"${p}rc0")},
       |${codeCtes("n", s"${p}rc1")},
       |${p}codes0 AS (SELECT * FROM ${codesJoin("o")}),
       |${p}codes1 AS (SELECT * FROM ${codesJoin("n")}),
       |${p}j AS (
       |  SELECT a.vec_id, a.cell AS cell0, b.cell AS cell1,
       |    (b.cell IN (SELECT cell FROM ${p}hot) OR a.cell <> b.cell) AS stale
       |  FROM ${p}cells0 a JOIN ${p}cells1 b USING (vec_id)),
       |${p}tch AS (SELECT DISTINCT cell FROM (
       |  SELECT cell0 AS cell FROM ${p}j WHERE stale
       |  UNION ALL SELECT cell1 FROM ${p}j WHERE stale)),
       |${p}chg AS (
       |  SELECT count(*) AS n_code_changed
       |  FROM ${p}j j JOIN ${p}codes1 c1 USING (vec_id) JOIN ${p}codes0 c0 USING (vec_id)
       |  WHERE j.stale AND (j.cell0 <> j.cell1 OR $codeNe)),
       |probes AS (
       |  SELECT q_id, c_id AS cell FROM (
       |    SELECT q.q_id, cent.c_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "cent.c_emb")} DESC, cent.c_id) AS prank
       |    FROM q, cent) x WHERE prank <= $Probe),
       |qcell AS (
       |  SELECT pr.q_id, pr.cell,
       |    round(list_sum(list_transform(range(1, len(q.q_emb)+1),
       |      i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(cent.c_emb[i] AS DOUBLE))) + 0.000000001, 6) AS qc
       |  FROM probes pr JOIN q ON q.q_id = pr.q_id JOIN cent ON cent.c_id = pr.cell),
       |$lutCtes,
       |${p}cand AS (
       |  SELECT pr.q_id, cd.vec_id, round(qc.qc + $adcSum + 0.000000001, 6) AS adc
       |  FROM ${p}codes1 cd JOIN ${p}rc1 rc ON rc.vec_id = cd.vec_id
       |  JOIN probes pr ON pr.cell = rc.cell $lutJoin
       |  JOIN qcell qc ON qc.q_id = pr.q_id AND qc.cell = rc.cell),
       |${p}adcr AS (
       |  SELECT q_id, vec_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) AS rank
       |  FROM ${p}cand),
       |${p}short AS (SELECT q_id, vec_id FROM ${p}adcr WHERE rank <= $RerankR),
       |${p}rr AS (
       |  SELECT s.q_id, s.vec_id, ${cos6Sql("cc.emb", "qq.q_emb")} AS cos,
       |    row_number() OVER (PARTITION BY s.q_id ORDER BY ${cos6Sql("cc.emb", "qq.q_emb")} DESC, s.vec_id) AS rank
       |  FROM ${p}short s JOIN cur cc ON cc.vec_id = s.vec_id JOIN q qq ON qq.q_id = s.q_id),
       |${p}sum AS MATERIALIZED (
       |  SELECT
       |    (SELECT count(*) FROM ${p}j) AS n_total,
       |    (SELECT count(*) FROM ${p}hot) AS n_repaired,
       |    (SELECT count(*) FROM ${p}j WHERE cell0 <> cell1) AS n_moved,
       |    (SELECT count(*) FROM ${p}j WHERE stale) AS n_reenc,
       |    (SELECT count(*) FROM ${p}j WHERE cell1 IN (SELECT cell FROM ${p}tch)) AS rows_written,
       |    (SELECT n_code_changed FROM ${p}chg) AS n_code_changed)
       |SELECT rr.q_id, rr.vec_id, rr.cos, rr.rank,
       |  s.n_total, s.n_repaired, s.n_moved, s.n_reenc,
       |  s.n_reenc * 1000000 // s.n_total AS reenc_bill_ppm,
       |  s.rows_written, s.rows_written * 1000000 // s.n_total AS write_bill_ppm,
       |  s.n_code_changed, CAST(0 AS BIGINT) AS n_store_diff
       |FROM ${p}rr rr, ${p}sum s WHERE rr.rank <= $K
       |ORDER BY q_id, rank""".stripMargin
  }

  val knnServeRebalanceSql: String = {
    val drift = "list_transform(%s, x -> CAST(round(CAST(x AS DOUBLE) * " +
      s"$RebalScale + $RebalShift + 0.000000001, 6) AS FLOAT))"
    def waveCte(name: String, src: String, lo: Int): String =
      s"""$name AS (
         |  SELECT cell, CASE WHEN rn <= (cnt + 1) // 2 THEN $lo ELSE ${lo + 1} END AS w FROM (
         |    SELECT cell, row_number() OVER (ORDER BY cell) AS rn, count(*) OVER () AS cnt
         |    FROM (SELECT DISTINCT $src AS cell FROM sr_m)))""".stripMargin
    def memCte(s: Int): String =
      s"""sr_mem$s AS (
         |  SELECT vec_id, emb, cell0 AS cell FROM sr_j WHERE cell0 = cell1
         |  UNION ALL SELECT vec_id, emb, cell0 FROM sr_mw WHERE lw > $s
         |  UNION ALL SELECT vec_id, emb, cell1 FROM sr_mw WHERE gw <= $s)""".stripMargin
    def searchCte(s: Int): String = {
      val m = if (s == 0) 0 else 1
      s"""sr_cand$s AS (
         |  SELECT DISTINCT p.q_id, e.vec_id, ${cos6Sql("e.emb", "p.q_emb")} AS cos
         |  FROM sr_mem$s e JOIN sr_p$m p USING (cell)),
         |sr_r$s AS (
         |  SELECT q_id, vec_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
         |  FROM sr_cand$s),
         |sr_cnt$s AS (
         |  SELECT count(*) AS n_rows, count(DISTINCT vec_id) AS n_vecs FROM sr_mem$s)""".stripMargin
    }
    def probeCte(m: Int): String =
      s"""sr_p$m AS (
         |  SELECT q_id, q_emb, c_id AS cell FROM (
         |    SELECT q.q_id, q.q_emb, c.c_id,
         |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "c.c_emb")} DESC, c.c_id) AS prank
         |    FROM sr_q q, sr${m}cent c) x WHERE prank <= $Probe)""".stripMargin
    def stageSelect(s: Int): String =
      s"""SELECT CAST($s AS BIGINT) AS stage, c.n_rows, c.n_vecs, r.q_id, r.rank, r.vec_id, r.cos
         |FROM sr_r$s r, sr_cnt$s c WHERE r.rank <= $K""".stripMargin
    s"""WITH sr_v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |sr_q AS (SELECT vec_id AS q_id, ${drift.format("emb")} AS q_emb
       |  FROM sr_v WHERE vec_id < $NQueries),
       |sr_c AS (SELECT vec_id, emb FROM sr_v WHERE vec_id >= $NQueries),
       |sr_b AS (SELECT vec_id, emb FROM sr_c WHERE vec_id % $RebalArrMod <> 0),
       |sr_r AS (SELECT vec_id, ${drift.format("emb")} AS emb
       |  FROM sr_c WHERE vec_id % $RebalArrMod = 0),
       |sr_all AS (SELECT * FROM sr_b UNION ALL SELECT * FROM sr_r),
       |${refinedCentSql("sr_b", "sr0")},
       |${refinedCentSql("sr_all", "sr1", Centroids, warmFrom = "sr0cent")},
       |sr_a0 AS (
       |  SELECT vec_id, c_id AS cell0 FROM (
       |    SELECT a.vec_id, c.c_id,
       |      row_number() OVER (PARTITION BY a.vec_id ORDER BY ${cos6Sql("a.emb", "c.c_emb")} DESC, c.c_id) AS r
       |    FROM sr_all a, sr0cent c) x WHERE r = 1),
       |sr_a1 AS (
       |  SELECT vec_id, c_id AS cell1 FROM (
       |    SELECT a.vec_id, c.c_id,
       |      row_number() OVER (PARTITION BY a.vec_id ORDER BY ${cos6Sql("a.emb", "c.c_emb")} DESC, c.c_id) AS r
       |    FROM sr_all a, sr1cent c) x WHERE r = 1),
       |sr_j AS (
       |  SELECT a.vec_id, a.emb, a0.cell0, a1.cell1
       |  FROM sr_all a JOIN sr_a0 a0 USING (vec_id) JOIN sr_a1 a1 USING (vec_id)),
       |sr_m AS (SELECT vec_id, emb, cell0, cell1 FROM sr_j WHERE cell0 <> cell1),
       |${waveCte("sr_g", "cell1", 1)},
       |${waveCte("sr_l", "cell0", 3)},
       |sr_mw AS (
       |  SELECT m.vec_id, m.emb, m.cell0, m.cell1, l.w AS lw, g.w AS gw
       |  FROM sr_m m JOIN sr_l l ON m.cell0 = l.cell JOIN sr_g g ON m.cell1 = g.cell),
       |${probeCte(0)},
       |${probeCte(1)},
       |${(0 to 4).map(memCte).mkString(",\n")},
       |${(0 to 4).map(searchCte).mkString(",\n")}
       |${(0 to 4).map(stageSelect).mkString("\nUNION ALL\n")}
       |ORDER BY stage, q_id, rank""".stripMargin
  }

  val knnIvfRebalanceIncSql: String = {
    s"""WITH ri_v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |ri_c AS (SELECT vec_id, emb FROM ri_v WHERE vec_id >= $NQueries),
       |ri_b AS (SELECT vec_id, emb FROM ri_c WHERE vec_id % $RebalArrMod <> 0),
       |ri_r AS (SELECT vec_id, list_transform(emb, x -> CAST(round(CAST(x AS DOUBLE) * $RebalScale + $RebalShift + 0.000000001, 6) AS FLOAT)) AS emb
       |  FROM ri_c WHERE vec_id % $RebalArrMod = 0),
       |ri_all AS (SELECT * FROM ri_b UNION ALL SELECT * FROM ri_r),
       |${refinedCentSql("ri_b", "ri0")},
       |${refinedCentSql("ri_all", "ri1", Centroids, warmFrom = "ri0cent")},
       |ri_a0 AS (
       |  SELECT vec_id, c_id AS cell0 FROM (
       |    SELECT a.vec_id, c.c_id,
       |      row_number() OVER (PARTITION BY a.vec_id ORDER BY ${cos6Sql("a.emb", "c.c_emb")} DESC, c.c_id) AS r
       |    FROM ri_all a, ri0cent c) x WHERE r = 1),
       |ri_a1 AS (
       |  SELECT vec_id, c_id AS cell1 FROM (
       |    SELECT a.vec_id, c.c_id,
       |      row_number() OVER (PARTITION BY a.vec_id ORDER BY ${cos6Sql("a.emb", "c.c_emb")} DESC, c.c_id) AS r
       |    FROM ri_all a, ri1cent c) x WHERE r = 1),
       |ri_j AS (SELECT vec_id, cell0, cell1 FROM ri_a0 JOIN ri_a1 USING (vec_id)),
       |ri_chg AS (SELECT * FROM ri_j WHERE cell0 <> cell1),
       |ri_t AS (SELECT DISTINCT cell FROM (
       |  SELECT cell0 AS cell FROM ri_chg UNION ALL SELECT cell1 FROM ri_chg)),
       |ri_stats AS (
       |  SELECT
       |    (SELECT count(*) FROM ri_j) AS n_total,
       |    (SELECT count(*) FROM ri_chg) AS n_changed,
       |    (SELECT count(*) FROM ri_t) AS cells_touched,
       |    (SELECT count(*) FROM ri_t WHERE cell NOT IN (SELECT DISTINCT cell1 FROM ri_j)) AS cells_emptied,
       |    (SELECT count(*) FROM ri_j WHERE cell1 IN (SELECT cell FROM ri_t)) AS n_rows_written)
       |SELECT n_total, n_changed,
       |  n_changed * 1000000 // n_total AS moved_ppm,
       |  CAST($Centroids AS BIGINT) AS cells_total, cells_touched, cells_emptied,
       |  n_rows_written, n_rows_written * 1000000 // n_total AS write_bill_ppm,
       |  CAST(0 AS BIGINT) AS n_store_diff
       |FROM ri_stats""".stripMargin
  }

  val knnIvfRebalanceSql: String = {
    val drift = "list_transform(%s, x -> CAST(round(CAST(x AS DOUBLE) * " +
      s"$RebalScale + $RebalShift + 0.000000001, 6) AS FLOAT))"
    def cellsCte(n: Int): String =
      s"""rb_cells$n AS (
         |  SELECT vec_id, emb, c_id AS cell, cos AS ccos FROM (
         |    SELECT a.vec_id, a.emb, c.c_id, ${cos6Sql("a.emb", "c.c_emb")} AS cos,
         |      row_number() OVER (PARTITION BY a.vec_id ORDER BY ${cos6Sql("a.emb", "c.c_emb")} DESC, c.c_id) AS crank
         |    FROM rb_all a, rb${n}cent c) x WHERE crank = 1)""".stripMargin
    def phaseCtes(n: Int): String =
      s"""rb_occ$n AS (
         |  SELECT count(*) AS cells_used, max(cn) AS max_cell_n, CAST(sum(cn) AS BIGINT) AS n_store
         |  FROM (SELECT cell, count(*) AS cn FROM rb_cells$n GROUP BY cell)),
         |rb_t$n AS (
         |  SELECT CAST(sum(CAST(round(ccos * 1000000 + 0.000000001) AS BIGINT)) // count(*) AS BIGINT) AS mean_ccos_ppm
         |  FROM rb_cells$n)""".stripMargin
    def searchCtes(n: Int, p: Int): String =
      s"""rb_p${n}_$p AS (
         |  SELECT q_id, q_emb, c_id AS cell FROM (
         |    SELECT q.q_id, q.q_emb, c.c_id,
         |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "c.c_emb")} DESC, c.c_id) AS prank
         |    FROM rb_q q, rb${n}cent c) x WHERE prank <= $p),
         |rb_s${n}_$p AS (
         |  SELECT p.q_id, e.vec_id,
         |    row_number() OVER (PARTITION BY p.q_id ORDER BY ${cos6Sql("e.emb", "p.q_emb")} DESC, e.vec_id) AS rank
         |  FROM rb_cells$n e JOIN rb_p${n}_$p p USING (cell)),
         |rb_h${n}_$p AS (
         |  SELECT (SELECT count(*) FROM rb_s${n}_$p) AS n_cand,
         |    (SELECT count(*) FROM rb_gold g
         |     JOIN (SELECT q_id, vec_id FROM rb_s${n}_$p WHERE rank <= $K) a USING (q_id, vec_id)) AS n_hits)""".stripMargin
    def phaseSelect(n: Int, p: Int, name: String): String =
      s"""SELECT '$name' AS phase, CAST($p AS BIGINT) AS probe,
         |  tv.tv_ppm, tv.tv_ppm > $RebalTvThresholdPpm AS triggered,
         |  o.cells_used, o.max_cell_n,
         |  CAST(o.max_cell_n * o.cells_used * 1000000 // o.n_store AS BIGINT) AS max_over_mean_ppm,
         |  t.mean_ccos_ppm, h.n_cand, h.n_hits, CAST(${NQueries.toLong * K} AS BIGINT) AS n_gold
         |FROM rb_occ$n o, rb_t$n t, rb_h${n}_$p h, rb_tv tv""".stripMargin
    s"""WITH rb_v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |rb_q AS (SELECT vec_id AS q_id, ${drift.format("emb")} AS q_emb
       |  FROM rb_v WHERE vec_id < $NQueries),
       |rb_c AS (SELECT vec_id, emb FROM rb_v WHERE vec_id >= $NQueries),
       |rb_b AS (SELECT vec_id, emb FROM rb_c WHERE vec_id % $RebalArrMod <> 0),
       |rb_r AS (SELECT vec_id, ${drift.format("emb")} AS emb
       |  FROM rb_c WHERE vec_id % $RebalArrMod = 0),
       |rb_all AS (SELECT * FROM rb_b UNION ALL SELECT * FROM rb_r),
       |${refinedCentSql("rb_b", "rb0")},
       |${refinedCentSql("rb_all", "rb1")},
       |${cellsCte(0)},
       |${cellsCte(1)},
       |rb_pc AS (
       |  SELECT cell,
       |    CAST(sum(CASE WHEN vec_id % $RebalArrMod = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
       |    CAST(sum(CASE WHEN vec_id % $RebalArrMod = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_b
       |  FROM rb_cells0 GROUP BY cell),
       |rb_tv AS (
       |  SELECT CAST(sum(abs(CAST(n_a AS HUGEINT) * nn_b - CAST(n_b AS HUGEINT) * nn_a)) * 1000000
       |    // (2 * CAST(max(nn_a) AS HUGEINT) * max(nn_b)) AS BIGINT) AS tv_ppm
       |  FROM (SELECT cell, n_a, n_b, CAST(sum(n_a) OVER () AS BIGINT) AS nn_a, CAST(sum(n_b) OVER () AS BIGINT) AS nn_b FROM rb_pc)),
       |rb_gs AS (
       |  SELECT q.q_id, a.vec_id,
       |    row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("a.emb", "q.q_emb")} DESC, a.vec_id) AS rank
       |  FROM rb_all a, rb_q q),
       |rb_gold AS (SELECT q_id, vec_id FROM rb_gs WHERE rank <= $K),
       |${phaseCtes(0)},
       |${phaseCtes(1)},
       |${RebalProbes.flatMap(p => Seq(searchCtes(0, p), searchCtes(1, p))).mkString(",\n")}
       |${RebalProbes.flatMap(p => Seq(phaseSelect(0, p, "t0_stale"),
             phaseSelect(1, p, "t1_rebalanced"))).mkString("\nUNION ALL\n")}
       |ORDER BY phase, probe""".stripMargin
  }

  // ---------------------------------------------------------------- №189 knn_res_calendar
  /** THE RESIDUAL STORE SERVED THROUGH THE FULL MAINTENANCE CALENDAR —
    * the last unserved lifecycle (r13 verdict item 1): №185 serves the
    * RAW store through arrivals+rebalance, №186 version-pairs the
    * residual store through its LOCAL repair; this row composes them
    * against ONE persisted cell-partitioned code store. Calendar
    * (№185's event sequence, №179's repair as the model change):
    *   E0+S0  base residual-encoded under the live model (v0), landed;
    *   E1+S1, E2+S2  nightly arrivals ENCODED UNDER THE LIVE MODEL and
    *     appended as v0 the batch they land — a nightly batch never
    *     waits for a retrain;
    *   E3+S3  LOCAL REPAIR of the [[RepairTop]] arrival-hottest cells
    *     (sample M-step over the current corpus, codebooks FROZEN),
    *     then the GAIN phase: every stale row's v1 re-encode lands in
    *     its new cell NEXT TO the old v0 copies. S3 is the serve №186
    *     cannot see: a gain cell now holds v1 repair copies AND the
    *     same-night v0 arrivals — rows carry `model_v` and the reader
    *     pairs EVERY row with its own encoding centroid, so both
    *     decode exactly; movers double-visible, collapsed by max-ADC;
    *   E4+S4  LOSS phase: touched cells to final content (v0 keepers ∪
    *     v1 re-encodes), ghost partitions deleted;
    *   E5+S5  the next night encoded under the REPAIRED model, v1.
    * Every serve READS THE FILES BACK; the per-stage census
    * (n_rows/n_vecs + n_v1, the store's version composition) rides the
    * driver hash, so a torn wave, a lost append, a ghost partition or
    * a wrong-version row diverges it. Serving is №186's version-paired
    * residual ADC (frozen-codebook LUTs, 2·C versioned centroid-dot
    * table) → RerankR shortlist → exact rescore. The router flips to
    * the repaired centroids when the repair starts (S3..S5 probe under
    * v1 — №185's convention). The oracle rebuilds the whole calendar
    * relationally (both models, both code sets, the night-3 encode,
    * six version-paired serves — serve-level CTEs MATERIALIZED, the
    * №186 100-GiB lesson); ResCalendarSpec pins the per-stage census
    * closed form, the v0-arrivals-next-to-v1-copies interaction being
    * non-vacuous, version pairing at every stage (a v0-forced decode
    * diverges mid-repair), and the no-lost-candidate overlap theorem
    * top-1(S3) ≥ top-1(S4). 100 TB shape: constant-size model/LUT
    * broadcasts, the corpus never reshuffled, maintenance writes
    * bounded by the touched cells, serving consistent through every
    * event — this is the full production lifecycle of №169's store. */
  private[graft] final case class ResCalCensus(
      gainCells: Seq[Long], v0ArrivalRowsInGainCells: Long,
      nStale: Long, nArr3: Long,
      midRepairShortlist: Seq[(Long, Long)], midRepairShortlistV0Forced: Seq[(Long, Long)])

  def knnResCalendar(spark: SparkSession, dir: String): DataFrame =
    knnResCalendarWithCensus(spark, dir)._1

  private[graft] def knnResCalendarWithCensus(
      spark: SparkSession, dir: String): (DataFrame, ResCalCensus) = {
    import spark.implicits._
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), expr(rebalDriftSql("emb")).as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val base = corpus.filter(!(col("vec_id") % CalMod).isin(1L, 2L, 3L))
    def night(n: Int): DataFrame = corpus.filter(col("vec_id") % CalMod === n)
      .select(col("vec_id"), expr(rebalDriftSql("emb")).as("emb"))
    val a1 = night(1); val a2 = night(2); val a3 = night(3)
    val cur = graft.CacheRegistry.track(base.unionByName(a1).unionByName(a2).persist())
    val allVecs = graft.CacheRegistry.track(cur.unionByName(a3).persist())

    val model0 = resModelOf(spark, s"graft_rescal_model_${dirKey(dir)}_m$PquM", base)
    val d = model0.filter(col("m") === -1).selectExpr("size(c_emb)").head().getInt(0)
    val cent0df = model0.filter(col("m") === -1).select(col("c_id"), col("c_emb"))
    val codes0 = graft.CacheRegistry.track(encodeCellsRes(cur, model0, PquM, d).persist())

    // LOCAL REPAIR mid-calendar: top-RepairTop cells by (a1 ∪ a2)
    // arrival occupancy, re-centered with one sample M-step over the
    // current corpus; codebooks frozen (№179's repair on №185's
    // calendar — same deterministic sample discipline as resRepairOf)
    val hotSet = codes0.filter((col("vec_id") % CalMod).isin(1L, 2L))
      .groupBy(col("cell")).agg(count(lit(1)).as("n_a"))
      .orderBy(col("n_a").desc, col("cell")).limit(RepairTop)
      .collect().map(_.getLong(0)).toSet
    val cent0Arr = cent0df.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).sortBy(_._1)
    val samp = hashSample(cur, SampleM)
    val assigned = samp.map { e =>
      var bestCid = 0L; var bestCos = Double.NegativeInfinity
      cent0Arr.foreach { case (cid, ce) =>
        val cv = cos6Local(e, ce)
        if (cv > bestCos) { bestCos = cv; bestCid = cid }
      }
      (bestCid, e)
    }
    val means = assigned.groupBy(_._1).map { case (cid, members) =>
      val n = members.length
      cid -> Array.tabulate(members(0)._2.length) { i =>
        var s = 0.0
        members.foreach(m => s += m._2(i).toDouble)
        round6(s / n + 1e-9).toFloat
      }
    }
    val cent1df = cent0Arr.map { case (cid, ce) =>
      if (hotSet(cid) && means.contains(cid)) (cid, means(cid)) else (cid, ce)
    }.toSeq.toDF("c_id", "c_emb")
    val model1 = graft.CacheRegistry.track(
      cent1df.select(lit(-1).as("m"), col("c_id"), col("c_emb"))
        .unionByName(model0.filter(col("m") >= 0).select(col("m"), col("c_id"), col("c_emb")))
        .persist())

    val cells1 = cellsOf(cur, cent1df).select(col("vec_id"), col("cell").as("cell1"))
    val j = graft.CacheRegistry.track(
      codes0.withColumnRenamed("cell", "cell0").join(cells1, "vec_id").persist())
    val isStale = col("cell1").isin(hotSet.toSeq.map(Long.box): _*) ||
      col("cell0") =!= col("cell1")
    val fresh = graft.CacheRegistry.track(
      encodeCellsRes(cur.join(j.filter(isStale).select(col("vec_id")), "vec_id"),
        model1, PquM, d).persist())

    val store = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_stores", s"graft_rescal_${dirKey(dir)}").toString
    val codeCols = (0 until PquM).map(m => s"code_$m")
    val vcols = col("vec_id") +: col("cell") +: codeCols.map(col) :+ col("model_v")
    def v0rows(pred: Column): DataFrame =
      codes0.filter(pred).withColumn("model_v", lit(0)).select(vcols: _*)

    val centV = graft.CacheRegistry.track(
      cent0df.select(lit(0).as("model_v"), col("c_id").as("cell"), col("c_emb"))
        .unionByName(cent1df.select(lit(1).as("model_v"), col("c_id").as("cell"), col("c_emb")))
        .persist())
    val luts = (0 until PquM).map { m =>
      queries.crossJoin(broadcast(model0.filter(col("m") === m).select(col("c_id"), col("c_emb"))))
        .select(col("q_id"), col("c_id").as(s"code_$m"),
          round(graft.functions.VectorOps.dot(subCol(col("q_emb"), m, PquM, d), col("c_emb")) + lit(1e-9), 6)
            .as(s"part_$m"))
    }
    def probesOf(cent: DataFrame): DataFrame = queries.join(broadcast(cent))
      .select(col("q_id"), col("q_emb"), col("c_id"), cosine6(col("q_emb"), col("c_emb")).as("qcos"))
      .groupBy(col("q_id"))
      .agg(first(col("q_emb")).as("q_emb"),
        graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), Probe).as("top"))
      .select(col("q_id"), col("q_emb"), explode(col("top.id")).as("cell"))
    val probes0 = graft.CacheRegistry.track(probesOf(cent0df).persist())
    val probes1 = graft.CacheRegistry.track(probesOf(cent1df).persist())

    /** Version-paired per-(q, vec) max-ADC over the store's files;
      * `torn = true` forces every row through the v0 decode — the
      * stale-reader failure the spec proves diverges mid-repair. */
    def adcOf(back: DataFrame, probes: DataFrame, torn: Boolean): DataFrame = {
      val qcV = probes.join(broadcast(centV), "cell")
        .select(col("q_id"), col("cell"), col("model_v"),
          round(graft.functions.VectorOps.dot(col("q_emb"), col("c_emb")) + lit(1e-9), 6).as("qc"))
      val joined = (0 until PquM).foldLeft(
        back.join(broadcast(probes.select(col("q_id"), col("cell"))), "cell")) { (df, m) =>
        df.join(broadcast(luts(m)), Seq("q_id", s"code_$m"))
      }
      val withQc =
        if (torn) joined.drop("model_v")
          .join(broadcast(qcV.filter(col("model_v") === 0).drop("model_v")), Seq("q_id", "cell"))
        else joined.join(broadcast(qcV), Seq("q_id", "cell", "model_v"))
      val adc = round(col("qc") + (0 until PquM).map(m => col(s"part_$m")).reduce(_ + _) + lit(1e-9), 6)
      withQc.select(col("q_id"), col("vec_id"), adc.as("adc"))
        .groupBy(col("q_id"), col("vec_id")).agg(max(col("adc")).as("adc"))
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long, Long, Double)]
    /** One serve against the store files; returns the ADC shortlist it
      * served from, so S3's version-pairing proof reuses the SERVE's own
      * shortlist instead of re-running the full ADC pass a second time
      * (r14 verdict item 2 — the paired leg of midRepairShortlists was a
      * byte-identical recomputation of serve(3)'s shortlist). */
    def serve(stage: Int, probes: DataFrame): Seq[(Long, Long)] = {
      import spark.implicits._
      val back = graft.CacheRegistry.track(spark.read.parquet(store)
        .select((col("vec_id") +: col("cell").cast("long").as("cell") +:
          codeCols.map(col) :+ col("model_v").cast("int").as("model_v")): _*).persist())
      // collect the shortlist ONCE (RerankR·NQueries rows, bounded), then
      // feed the exact rescore from the local frame — the ADC subtree
      // would otherwise execute twice (once under the rescore join, once
      // for the returned pairs)
      val slRows = topKRanked(adcOf(back, probes, torn = false), "q_id", "adc", "vec_id", RerankR)
        .select(col("q_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      val shortlist = slRows.toDF("q_id", "vec_id")
      val census = back.agg(count(lit(1)).as("n_rows"), countDistinct(col("vec_id")).as("n_vecs"),
        sum(when(col("model_v") === 1, 1L).otherwise(0L)).as("n_v1"))
      val rescored = allVecs.join(broadcast(shortlist), "vec_id")
        .join(broadcast(queries), "q_id")
        .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
      topKRanked(rescored, "q_id", "cos", "vec_id", K)
        .crossJoin(broadcast(census)).collect().foreach(r =>
          out += ((stage.toLong, r.getAs[Long]("n_rows"), r.getAs[Long]("n_vecs"),
            r.getAs[Long]("n_v1"), r.getAs[Long]("q_id"), r.getAs[Number]("rank").longValue,
            r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))))
      slRows
    }
    /** S3's version-pairing proof hook for the spec: the V0-FORCED decode
      * of the mid-repair store (the stale-reader failure). The paired
      * shortlist is serve(3)'s own return value — not recomputed. */
    def midRepairShortlistV0(probes: DataFrame): Seq[(Long, Long)] = {
      val back = spark.read.parquet(store)
        .select((col("vec_id") +: col("cell").cast("long").as("cell") +:
          codeCols.map(col) :+ col("model_v").cast("int").as("model_v")): _*)
      topKRanked(adcOf(back, probes, torn = true), "q_id", "adc", "vec_id", RerankR)
        .select(col("q_id"), col("vec_id")).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    }

    // E0+S0: base codes landed under the live model
    landStore(store, v0rows(!(col("vec_id") % CalMod).isin(1L, 2L, 3L)))
    serve(0, probes0)
    // E1/E2+S1/S2: nightly arrivals encoded under the LIVE model, v0
    def append(rows: DataFrame): Unit =
      byCell(rows).write.partitionBy("cell").mode("append").parquet(store)
    append(v0rows(col("vec_id") % CalMod === 1)); serve(1, probes0)
    append(v0rows(col("vec_id") % CalMod === 2)); serve(2, probes0)
    // E3+S3: GAIN phase — v1 re-encodes land NEXT TO v0 copies (incl.
    // the same-night v0 arrivals: the interaction №186 cannot see);
    // gain-cell v0 content derived from the cached codes0 frame
    val gainCells = fresh.select(col("cell")).distinct()
    val gainArr = gainCells.collect().map(_.getLong(0)).sorted
    byCell(v0rows(lit(true)).join(broadcast(gainCells), "cell")
        .unionByName(fresh.withColumn("model_v", lit(1)).select(vcols: _*)))
      .write.partitionBy("cell").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(store)
    val slPaired = serve(3, probes1)
    val slV0 = midRepairShortlistV0(probes1)
    // E4+S4: LOSS phase — touched cells to final content, ghosts deleted
    val touchedArr = j.filter(isStale).select(col("cell0").as("cell"))
      .unionAll(fresh.select(col("cell"))).distinct()
      .collect().map(_.getLong(0)).sorted
    val finalContent = graft.CacheRegistry.track(
      j.filter(!isStale && col("cell0").isin(touchedArr.map(Long.box): _*))
        .select((col("vec_id") +: col("cell0").as("cell") +: codeCols.map(col) :+ lit(0).as("model_v")): _*)
        .unionByName(fresh.withColumn("model_v", lit(1)).select(vcols: _*))
        .persist())
    byCell(finalContent).write.partitionBy("cell").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(store)
    val presentCells = finalContent.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).toSet
    touchedArr.filterNot(presentCells).foreach(c =>
      graft.Fs.rmTree(java.nio.file.Paths.get(store, s"cell=$c")))
    serve(4, probes1)
    // E5+S5: the next night encoded under the REPAIRED model, v1
    append(encodeCellsRes(a3, model1, PquM, d)
      .withColumn("model_v", lit(1)).select(vcols: _*))
    serve(5, probes1)

    val v0ArrGain = codes0.filter((col("vec_id") % CalMod).isin(1L, 2L) &&
      col("cell").isin(gainArr.map(Long.box): _*)).count()
    val served = out.toSeq
      .toDF("stage", "n_rows", "n_vecs", "n_v1", "q_id", "rank", "vec_id", "cos")
      .orderBy(col("stage"), col("q_id"), col("rank"))
    (served, ResCalCensus(gainArr.toSeq, v0ArrGain,
      j.filter(isStale).count(), a3.count(), slPaired, slV0))
  }

  val knnResCalendarSql: String = {
    val p = "rcl"
    val drift = "list_transform(%s, x -> CAST(round(CAST(x AS DOUBLE) * " +
      s"$RebalScale + $RebalShift + 0.000000001, 6) AS FLOAT))"
    def subOf(src: String, m: Int): String = {
      val w = s"(len($src) // $PquM)"
      if (m < PquM - 1) s"list_slice($src, $m * $w + 1, ${m + 1} * $w)"
      else s"list_slice($src, ${PquM - 1} * $w + 1, len($src))"
    }
    def residCte(name: String, src: String, cells: String, cent: String): String =
      s"""$name AS (
         |  SELECT s.vec_id, cl.cell,
         |    list_transform(range(1, len(s.emb)+1), i ->
         |      CAST(round(CAST(s.emb[i] AS DOUBLE) - CAST(ct.c_emb[i] AS DOUBLE) + 0.000000001, 6) AS FLOAT)) AS remb
         |  FROM $src s JOIN $cells cl ON cl.vec_id = s.vec_id JOIN $cent ct ON ct.c_id = cl.cell)""".stripMargin
    def assignCte(name: String, src: String, cent: String): String =
      s"""$name AS (
         |  SELECT vec_id, c_id AS cell FROM (
         |    SELECT s.vec_id, c.c_id,
         |      row_number() OVER (PARTITION BY s.vec_id ORDER BY ${cos6Sql("s.emb", "c.c_emb")} DESC, c.c_id) AS r
         |    FROM $src s, $cent c) x WHERE r = 1)""".stripMargin
    def codeCtes(tag: String, rc: String): String = (0 until PquM).map { m =>
      s"""${p}$tag$m AS (
         |  SELECT vec_id, c_id AS code_$m FROM (
         |    SELECT s.vec_id, a.c_id,
         |      row_number() OVER (PARTITION BY s.vec_id ORDER BY ${cos6Sql("s.emb", "a.c_emb")} DESC, a.c_id) AS rk
         |    FROM (SELECT vec_id, ${subOf("remb", m)} AS emb FROM $rc) s, ${p}k${m}_cent a) x WHERE rk = 1)""".stripMargin
    }.mkString(",\n")
    def codesJoin(tag: String): String =
      (1 until PquM).foldLeft(s"${p}$tag" + "0")((acc, m) => s"$acc JOIN ${p}$tag$m USING (vec_id)")
    val bsubs = (0 until PquM).map(m =>
      s"${p}s$m AS (SELECT vec_id, ${subOf("remb", m)} AS emb FROM ${p}rc0b)").mkString(",\n")
    val cents = (0 until PquM).map(m =>
      refinedCentSql(s"${p}s$m", s"${p}k${m}_", PqCodebook)).mkString(",\n")
    val lutCtes = (0 until PquM).map { m =>
      s"""${p}l$m AS (
         |  SELECT q.q_id, a.c_id AS code_$m,
         |    round(list_sum(list_transform(range(1, len(${subOf("q.q_emb", m)})+1),
         |      i -> CAST((${subOf("q.q_emb", m)})[i] AS DOUBLE) * CAST(a.c_emb[i] AS DOUBLE))) + 0.000000001, 6) AS part_$m
         |  FROM q, ${p}k${m}_cent a)""".stripMargin
    }.mkString(",\n")
    val lutJoin = (0 until PquM).map(m => s"JOIN ${p}l$m USING (q_id, code_$m)").mkString(" ")
    val adcSum = (0 until PquM).map(m => s"part_$m").mkString(" + ")
    val codeSel = (0 until PquM).map(m => s"code_$m").mkString(", ")
    def probeCte(name: String, cent: String): String =
      s"""$name AS (
         |  SELECT q_id, c_id AS cell FROM (
         |    SELECT q.q_id, c.c_id,
         |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "c.c_emb")} DESC, c.c_id) AS prank
         |    FROM q, $cent c) x WHERE prank <= $Probe)""".stripMargin
    def shortCte(content: String, probes: String, name: String): String =
      s"""${name}c AS MATERIALIZED (
         |  SELECT pr.q_id, ct.vec_id, max(round(qc.qc + $adcSum + 0.000000001, 6)) AS adc
         |  FROM $content ct JOIN $probes pr ON pr.cell = ct.cell $lutJoin
         |  JOIN ${p}qcv qc ON qc.q_id = pr.q_id AND qc.cell = ct.cell AND qc.v = ct.v
         |  GROUP BY pr.q_id, ct.vec_id),
         |$name AS MATERIALIZED (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY adc DESC, vec_id) AS rank
         |    FROM ${name}c) x WHERE rank <= $RerankR)""".stripMargin
    def serveCte(s: Int, content: String): String =
      s"""${p}rr$s AS MATERIALIZED (
         |  SELECT s.q_id, s.vec_id, ${cos6Sql("cc.emb", "qq.q_emb")} AS cos,
         |    row_number() OVER (PARTITION BY s.q_id ORDER BY ${cos6Sql("cc.emb", "qq.q_emb")} DESC, s.vec_id) AS rank
         |  FROM ${p}sl$s s JOIN allv cc ON cc.vec_id = s.vec_id JOIN q qq ON qq.q_id = s.q_id),
         |${p}cnt$s AS MATERIALIZED (
         |  SELECT count(*) AS n_rows, count(DISTINCT vec_id) AS n_vecs,
         |    CAST(coalesce(sum(CASE WHEN v = 1 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_v1
         |  FROM $content)""".stripMargin
    def stageSelect(s: Int): String =
      s"""SELECT CAST($s AS BIGINT) AS stage, c.n_rows, c.n_vecs, c.n_v1, r.q_id, r.rank, r.vec_id, r.cos
         |FROM ${p}rr$s r, ${p}cnt$s c WHERE r.rank <= $K""".stripMargin
    s"""WITH v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |q AS (SELECT vec_id AS q_id, ${drift.format("emb")} AS q_emb FROM v WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id, emb FROM v WHERE vec_id >= $NQueries),
       |b AS (SELECT vec_id, emb FROM c WHERE vec_id % $CalMod NOT IN (1, 2, 3)),
       |na1 AS (SELECT vec_id, ${drift.format("emb")} AS emb FROM c WHERE vec_id % $CalMod = 1),
       |na2 AS (SELECT vec_id, ${drift.format("emb")} AS emb FROM c WHERE vec_id % $CalMod = 2),
       |na3 AS (SELECT vec_id, ${drift.format("emb")} AS emb FROM c WHERE vec_id % $CalMod = 3),
       |cur AS MATERIALIZED (SELECT * FROM b UNION ALL SELECT * FROM na1 UNION ALL SELECT * FROM na2),
       |allv AS MATERIALIZED (SELECT * FROM cur UNION ALL SELECT * FROM na3),
       |${refinedCentSql("b", s"${p}0")},
       |${assignCte(s"${p}cells0", "cur", s"${p}0cent")},
       |${p}hot AS MATERIALIZED (SELECT cell FROM (
       |  SELECT cell, count(*) AS n_a FROM ${p}cells0
       |  WHERE vec_id % $CalMod IN (1, 2) GROUP BY cell
       |  ORDER BY n_a DESC, cell LIMIT $RepairTop)),
       |${p}samp AS (
       |  SELECT emb, row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS rk
       |  FROM cur QUALIFY rk <= $SampleM),
       |${p}sa AS (
       |  SELECT rk, emb, cid FROM (
       |    SELECT s.rk, s.emb, c.c_id AS cid,
       |      row_number() OVER (PARTITION BY s.rk ORDER BY ${cos6Sql("s.emb", "c.c_emb")} DESC, c.c_id) AS rr
       |    FROM ${p}samp s, ${p}0cent c) x WHERE rr = 1),
       |${p}sg AS (SELECT cid, list(emb ORDER BY rk) AS embs, count(*) AS n FROM ${p}sa GROUP BY cid),
       |${p}su AS (
       |  SELECT cid, list_transform(range(1, len(embs[1]) + 1), i ->
       |    CAST(round(list_sum(list_transform(embs, e -> CAST(e[i] AS DOUBLE))) / n + 0.000000001, 6) AS FLOAT)) AS cemb
       |  FROM ${p}sg),
       |cent AS MATERIALIZED (
       |  SELECT c.c_id,
       |    CASE WHEN c.c_id IN (SELECT cell FROM ${p}hot) AND u.cemb IS NOT NULL
       |      THEN u.cemb ELSE c.c_emb END AS c_emb
       |  FROM ${p}0cent c LEFT JOIN ${p}su u ON u.cid = c.c_id),
       |${assignCte(s"${p}cells1", "cur", "cent")},
       |${assignCte(s"${p}cells3", "na3", "cent")},
       |${residCte(s"${p}rc0b", "b", s"${p}cells0", s"${p}0cent")},
       |$bsubs,
       |$cents,
       |${residCte(s"${p}rc0", "cur", s"${p}cells0", s"${p}0cent")},
       |${residCte(s"${p}rc1", "cur", s"${p}cells1", "cent")},
       |${residCte(s"${p}rc3", "na3", s"${p}cells3", "cent")},
       |${codeCtes("o", s"${p}rc0")},
       |${codeCtes("n", s"${p}rc1")},
       |${codeCtes("t", s"${p}rc3")},
       |${p}codes0 AS MATERIALIZED (SELECT * FROM ${codesJoin("o")}),
       |${p}codes1 AS MATERIALIZED (SELECT * FROM ${codesJoin("n")}),
       |${p}codes3 AS MATERIALIZED (SELECT * FROM ${codesJoin("t")}),
       |${p}j AS MATERIALIZED (
       |  SELECT a.vec_id, a.cell AS cell0, b.cell AS cell1,
       |    (b.cell IN (SELECT cell FROM ${p}hot) OR a.cell <> b.cell) AS stale
       |  FROM ${p}cells0 a JOIN ${p}cells1 b USING (vec_id)),
       |${probeCte(s"${p}p0", s"${p}0cent")},
       |${probeCte(s"${p}p1", "cent")},
       |$lutCtes,
       |${p}qcv AS MATERIALIZED (
       |  SELECT q.q_id, cc.c_id AS cell, 0 AS v,
       |    round(list_sum(list_transform(range(1, len(q.q_emb)+1),
       |      i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(cc.c_emb[i] AS DOUBLE))) + 0.000000001, 6) AS qc
       |  FROM q, ${p}0cent cc
       |  UNION ALL
       |  SELECT q.q_id, cc.c_id, 1,
       |    round(list_sum(list_transform(range(1, len(q.q_emb)+1),
       |      i -> CAST(q.q_emb[i] AS DOUBLE) * CAST(cc.c_emb[i] AS DOUBLE))) + 0.000000001, 6)
       |  FROM q, cent cc),
       |${p}old AS MATERIALIZED (
       |  SELECT j.vec_id, j.cell0 AS cell, 0 AS v, $codeSel, j.stale
       |  FROM ${p}j j JOIN ${p}codes0 USING (vec_id)),
       |${p}frsh AS MATERIALIZED (
       |  SELECT j.vec_id, j.cell1 AS cell, 1 AS v, $codeSel
       |  FROM ${p}j j JOIN ${p}codes1 USING (vec_id) WHERE j.stale),
       |${p}a3r AS MATERIALIZED (
       |  SELECT cl.vec_id, cl.cell, 1 AS v, $codeSel
       |  FROM ${p}cells3 cl JOIN ${p}codes3 USING (vec_id)),
       |${p}ct0 AS (SELECT vec_id, cell, v, $codeSel FROM ${p}old WHERE vec_id % $CalMod NOT IN (1, 2, 3)),
       |${p}ct1 AS (SELECT vec_id, cell, v, $codeSel FROM ${p}old WHERE vec_id % $CalMod NOT IN (2, 3)),
       |${p}ct2 AS (SELECT vec_id, cell, v, $codeSel FROM ${p}old),
       |${p}ct3 AS MATERIALIZED (
       |  SELECT vec_id, cell, v, $codeSel FROM ${p}old
       |  UNION ALL SELECT * FROM ${p}frsh),
       |${p}ct4 AS MATERIALIZED (
       |  SELECT vec_id, cell, v, $codeSel FROM ${p}old WHERE NOT stale
       |  UNION ALL SELECT * FROM ${p}frsh),
       |${p}ct5 AS MATERIALIZED (
       |  SELECT * FROM ${p}ct4 UNION ALL SELECT * FROM ${p}a3r),
       |${shortCte(s"${p}ct0", s"${p}p0", s"${p}sl0")},
       |${shortCte(s"${p}ct1", s"${p}p0", s"${p}sl1")},
       |${shortCte(s"${p}ct2", s"${p}p0", s"${p}sl2")},
       |${shortCte(s"${p}ct3", s"${p}p1", s"${p}sl3")},
       |${shortCte(s"${p}ct4", s"${p}p1", s"${p}sl4")},
       |${shortCte(s"${p}ct5", s"${p}p1", s"${p}sl5")},
       |${(0 to 5).map(s => serveCte(s, s"${p}ct$s")).mkString(",\n")}
       |${(0 to 5).map(stageSelect).mkString("\nUNION ALL\n")}
       |ORDER BY stage, q_id, rank""".stripMargin
  }

  /** Bench hook: №189's persisted residual model (№186's discipline). */
  def dropResCalendarCaches(spark: SparkSession, dir: String): Unit = {
    val t = s"graft_rescal_model_${dirKey(dir)}_m$PquM"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val path = java.nio.file.Paths.get(
      System.getProperty("java.io.tmpdir"), "graft_models", t)
    if (java.nio.file.Files.exists(path)) graft.Fs.rmTree(path)
  }

  // ---------------------------------------------------------------- №192 knn_store_delete
  /** Per-stage store diagnostics behind [[knnStoreDelete]]: deleted-row
    * counts by cell at each serve (the torn-cell proof: at the mid-delete
    * serve every even touched cell must read 0 and every odd one its full
    * pre-delete count), plus the rewrite bills. */
  private[graft] final case class StoreDeleteDetail(
      delByCell: Map[Int, Map[Long, Long]],
      touchedCells: Seq[Long],
      emptiedCells: Seq[Long],
      rewrittenRows: Long)

  val DelMod = 9L  // delete manifest: base vec_id % DelMod == DelRes (~11%)
  val DelRes = 4L

  /** DELETE FROM THE SERVING STORE — the CRUD leg the maintenance family
    * (№177 arrivals, №175/№179 model rewrites, №178 composition) doesn't
    * cover, and the one a real corpus store cannot refuse: a
    * right-to-be-forgotten manifest (an id list, never a predicate over
    * payloads) must leave the store while it serves. Reference analogue:
    * the deletes the export carries as HBase tombstones —
    * app/batch/HBaseResultProcessor.kt processes only live cells, so a
    * deleted row must vanish from every later export; here the store IS
    * the served artifact, so deletion is a physical rewrite, not a
    * filter.
    *
    * Shape: the delete bill is DELTA-sized — only the touched cells
    * (cells holding ≥1 manifest row) rewrite, in two waves (even cells,
    * then odd), each wave a dynamic partition overwrite whose content
    * derives from the CACHED assignment frame (never read-then-overwrite
    * of the live path — the r13 advice discipline); a cell whose every
    * row is deleted writes nothing under dynamic overwrite, so its stale
    * directory is dropped explicitly (№175's emptied-cell handling).
    * Serves read the FILES back at four checkpoints: S0 pre-delete (the
    * manifest rows genuinely serve — the drill is not vacuous), S1
    * MID-delete (each touched cell is atomically old or new, never torn;
    * surviving rows in rewritten cells still serve), S2 post-delete
    * (n_del_visible = 0 — and it STAYS 0), S3 after a later arrival
    * append under the frozen model (maintenance cannot resurrect a
    * deleted row). The oracle rebuilds all four store states closed-form
    * (membership is a pure function of vec_id and the frozen
    * assignment); n_rows / n_del_visible censuses ride the driver hash.
    * At 100 TB: the manifest is a broadcast id set, touched cells are
    * delta-sized, each wave rewrites only its cells' files, and serving
    * never pauses — the same add-then-remove losslessness argument as
    * №177, inverted for removal. */
  def knnStoreDelete(spark: SparkSession, dir: String): DataFrame =
    knnStoreDeleteDetail(spark, dir)._1

  private[graft] def knnStoreDeleteDetail(
      spark: SparkSession, dir: String): (DataFrame, StoreDeleteDetail) = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val arrivals = corpus.filter(col("vec_id") % CalMod === 1L)
    val base = corpus.filter(col("vec_id") % CalMod =!= 1L)
    val cent = refinedCentroids(spark, base, Centroids)
    // the manifest is an id list over the STORE's rows — an arrival whose
    // id happens to share the residue is a new row, not a deleted one
    val delPred = col("vec_id") % DelMod === DelRes && col("vec_id") % CalMod =!= 1L
    val assigned = graft.CacheRegistry.track(
      cellsOf(base, cent).select(col("vec_id"), col("emb"), col("cell")).persist())
    val store = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_stores", s"graft_storedel_${dirKey(dir)}").toString
    landStore(store, assigned)
    val probes = graft.CacheRegistry.track(queries.join(broadcast(cent))
      .select(col("q_id"), col("q_emb"), col("c_id"), cosine6(col("q_emb"), col("c_emb")).as("qcos"))
      .groupBy(col("q_id"))
      .agg(first(col("q_emb")).as("q_emb"),
        graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), Probe).as("top"))
      .select(col("q_id"), col("q_emb"), explode(col("top.id")).as("cell"))
      .persist())
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long, Double)]
    val delByCell = scala.collection.mutable.Map.empty[Int, Map[Long, Long]]
    def serve(stage: Int): Unit = {
      // ONE store scan per serve (r16, guide §6): the serve's probe join,
      // the census aggregate and the per-cell deletion meter each
      // re-scanned the store's partitioned small files — persist the
      // read-back so the files are listed and read once per serve, and
      // UNPERSIST before returning: the store mutates between serves, and
      // a live cache entry would be plan-matched into the next serve's
      // identical read as a stale file listing. Values unchanged.
      val back = spark.read.parquet(store)
        .select(col("vec_id"), col("emb"), col("cell").cast("long").as("cell")).persist()
      try {
        val scored = back.join(broadcast(probes), "cell")
          .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
          .distinct()
        val census = back.agg(count(lit(1)).as("n_rows"),
          sum(when(delPred, 1L).otherwise(0L)).as("n_del_visible"))
        topKRanked(scored, "q_id", "cos", "vec_id", K)
          .crossJoin(broadcast(census)).collect().foreach(r =>
            out += ((stage.toLong, r.getAs[Long]("n_rows"), r.getAs[Long]("n_del_visible"),
              r.getAs[Long]("q_id"), r.getAs[Number]("rank").longValue,
              r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))))
        delByCell(stage) = back.filter(delPred).groupBy(col("cell")).count()
          .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      } finally back.unpersist()
    }
    serve(0)
    // the manifest's touched cells, split into the two rewrite waves
    val touched = assigned.filter(delPred).select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted
    val emptied = scala.collection.mutable.ArrayBuffer.empty[Long]
    var rewritten = 0L
    def wave(cells: Seq[Long]): Unit = if (cells.nonEmpty) {
      val inWave = col("cell").isin(cells.map(Long.box): _*)
      val content = assigned.filter(inWave && !delPred)
      rewritten += content.count()
      byCell(content.select(col("vec_id"), col("emb"), col("cell")))
        .write.partitionBy("cell").mode("overwrite")
        .option("partitionOverwriteMode", "dynamic").parquet(store)
      // fully-deleted cells write no partition under dynamic overwrite —
      // their stale directories are dropped here
      val surviving = content.select(col("cell")).distinct()
        .collect().map(_.getLong(0)).toSet
      cells.filterNot(surviving).foreach { c =>
        graft.Fs.rmTree(java.nio.file.Paths.get(store, s"cell=$c"))
        emptied += c
      }
    }
    wave(touched.filter(_ % 2 == 0)); serve(1)
    wave(touched.filter(_ % 2 == 1)); serve(2)
    // a later night lands under the frozen model: deletion must hold
    byCell(cellsOf(arrivals, cent).select(col("vec_id"), col("emb"), col("cell")))
      .write.partitionBy("cell").mode("append").parquet(store)
    serve(3)
    import spark.implicits._
    val df = out.toSeq
      .toDF("stage", "n_rows", "n_del_visible", "q_id", "rank", "vec_id", "cos")
      .orderBy(col("stage"), col("q_id"), col("rank"))
    (df, StoreDeleteDetail(delByCell.toMap, touched.toSeq, emptied.toSeq, rewritten))
  }

  val knnStoreDeleteSql: String = {
    def memCte(s: Int, body: String): String = s"sdl_mem$s AS ($body)"
    def searchCte(s: Int): String =
      s"""sdl_cand$s AS (
         |  SELECT DISTINCT p.q_id, e.vec_id, ${cos6Sql("e.emb", "p.q_emb")} AS cos
         |  FROM sdl_mem$s e JOIN sdl_p p USING (cell)),
         |sdl_r$s AS (
         |  SELECT q_id, vec_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
         |  FROM sdl_cand$s),
         |sdl_cnt$s AS (
         |  SELECT count(*) AS n_rows,
         |    coalesce(CAST(sum(CASE WHEN vec_id % $DelMod = $DelRes AND vec_id % $CalMod <> 1 THEN 1 ELSE 0 END) AS BIGINT), 0) AS n_del_visible
         |  FROM sdl_mem$s)""".stripMargin
    def stageSelect(s: Int): String =
      s"""SELECT CAST($s AS BIGINT) AS stage, c.n_rows, c.n_del_visible, r.q_id, r.rank, r.vec_id, r.cos
         |FROM sdl_r$s r, sdl_cnt$s c WHERE r.rank <= $K""".stripMargin
    val mems = Seq(
      // S0: the full base store
      memCte(0, "SELECT vec_id, emb, cell FROM sdl_j"),
      // S1: wave A applied — manifest rows gone from EVEN cells only
      memCte(1, s"""SELECT vec_id, emb, cell FROM sdl_j
        |  WHERE NOT (vec_id % $DelMod = $DelRes AND cell % 2 = 0)""".stripMargin),
      // S2: the manifest fully applied
      memCte(2, s"SELECT vec_id, emb, cell FROM sdl_j WHERE vec_id % $DelMod <> $DelRes"),
      // S3: + arrivals under the frozen model (no resurrection)
      memCte(3, s"""SELECT vec_id, emb, cell FROM sdl_j WHERE vec_id % $DelMod <> $DelRes
        |  UNION ALL SELECT a.vec_id, a.emb, ja.cell FROM sdl_a a JOIN sdl_aj ja USING (vec_id)""".stripMargin))
    def assign(src: String, cent: String): String =
      s"""SELECT vec_id, c_id AS cell FROM (
         |    SELECT a.vec_id, c.c_id,
         |      row_number() OVER (PARTITION BY a.vec_id ORDER BY ${cos6Sql("a.emb", "c.c_emb")} DESC, c.c_id) AS r
         |    FROM $src a, $cent c) x WHERE r = 1""".stripMargin
    s"""WITH sdl_v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |sdl_q AS (SELECT vec_id AS q_id, emb AS q_emb FROM sdl_v WHERE vec_id < $NQueries),
       |sdl_c AS (SELECT vec_id, emb FROM sdl_v WHERE vec_id >= $NQueries),
       |sdl_b AS (SELECT vec_id, emb FROM sdl_c WHERE vec_id % $CalMod <> 1),
       |sdl_a AS (SELECT vec_id, emb FROM sdl_c WHERE vec_id % $CalMod = 1),
       |${refinedCentSql("sdl_b", "sdl0")},
       |sdl_ja AS (${assign("sdl_b", "sdl0cent")}),
       |sdl_j AS (
       |  SELECT b.vec_id, b.emb, ja.cell FROM sdl_b b JOIN sdl_ja ja USING (vec_id)),
       |sdl_aj AS (${assign("sdl_a", "sdl0cent")}),
       |sdl_p AS (
       |  SELECT q_id, q_emb, c_id AS cell FROM (
       |    SELECT q.q_id, q.q_emb, c.c_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "c.c_emb")} DESC, c.c_id) AS prank
       |    FROM sdl_q q, sdl0cent c) x WHERE prank <= $Probe),
       |${mems.mkString(",\n")},
       |${(0 to 3).map(searchCte).mkString(",\n")}
       |${(0 to 3).map(stageSelect).mkString("\nUNION ALL\n")}
       |ORDER BY stage, q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- №197 knn_store_retention
  /** Per-window diagnostics behind [[knnStoreRetention]]: the served
    * top-k pair set per window, generation directories after each
    * age-out, the probe bill ISSUED (lookup keys shipped into the serve
    * join — frozen routing, window-independent by construction), and the
    * probe keys actually MATCHED per window (distinct (q_id, cell)
    * lookups with ≥1 store row in the window — derived from the serve's
    * own join, r14 advice: the old probes.count() re-read the pre-serve
    * frame and could never fail). Retention saves scan work
    * (probeMatched falls with the window), never probes (probeIssued
    * constant). */
  private[graft] final case class StoreRetentionDetail(
      topk: Map[Int, Set[(Long, Long)]],
      gensAfter: Map[Int, Seq[String]],
      probeIssued: Long,
      probeMatched: Map[Int, Long])

  /** RETENTION ON THE SERVING VECTOR STORE — №193's TTL dial, mirrored
    * onto the vector side (the r14 frontier's other unmirrored twin): a
    * freshness-windowed retrieval deployment ages whole arrival
    * generations out of the cell store while queries keep serving
    * (reference analogue: the HBase column-family TTL — an aged cell
    * simply stops appearing in scans; here the store is the served
    * artifact, so aging is a generation-directory drop, the same
    * file-level wave discipline as №190/№193 pointed at the vector
    * store). Store layout: gen-THEN-cell partitioning, so an age-out
    * is one directory drop and the probe path is untouched — the probed
    * cells' directories just hold fewer generations.
    *
    * One store (base gen=0 + night-1 gen=1 + night-2 gen=2, all encoded
    * and probed under the FROZEN base model), three serves reading the
    * FILES back: window=3 (full store), window=2 (base aged out),
    * window=1 (night 1 aged out too). The probe bill is window-INDEPENDENT
    * (the query-to-cell routing is the frozen model's — retention saves
    * store rows and scan work, never probes). The aging cost is metered
    * exactly: `n_kept` = served top-k rows that are ALSO full-store top-k
    * — a full-store top-k member visible in the window always re-ranks
    * within k (the docs beating it in the window beat it in the full
    * store too), so n_kept counts precisely the full-quality results the
    * window still returns, and every loss is a member whose generation
    * aged out (StoreRetentionSpec pins that, member by member). The
    * oracle rebuilds all three windows closed-form (membership is a pure
    * function of vec_id). At 100 TB: the window is the storage-budget
    * dial a freshness deployment sets; serves stay broadcast-probe
    * equi-joins over the retained generations' files, and the drop is
    * metadata-only — no rewrite, no pause. */
  def knnStoreRetention(spark: SparkSession, dir: String): DataFrame =
    knnStoreRetentionDetail(spark, dir)._1

  private[graft] def knnStoreRetentionDetail(
      spark: SparkSession, dir: String): (DataFrame, StoreRetentionDetail) = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val base = corpus.filter(!(col("vec_id") % CalMod).isin(1L, 2L))
    val cent = refinedCentroids(spark, base, Centroids)
    val genOf: Column = when(col("vec_id") % CalMod === 1L, 1)
      .when(col("vec_id") % CalMod === 2L, 2).otherwise(0)
    val assigned = graft.CacheRegistry.track(
      cellsOf(corpus, cent).select(col("vec_id"), col("emb"), col("cell"))
        .withColumn("gen", genOf).persist())
    val store = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_stores", s"graft_storeret_${dirKey(dir)}")
    graft.Fs.rmTree(store)
    // gen-then-cell layout: the age-out is rmTree(gen=g), nothing else
    assigned.repartition(col("gen"), col("cell"))
      .write.partitionBy("gen", "cell").mode("overwrite").parquet(store.toString)
    val probes = graft.CacheRegistry.track(queries.join(broadcast(cent))
      .select(col("q_id"), col("q_emb"), col("c_id"), cosine6(col("q_emb"), col("c_emb")).as("qcos"))
      .groupBy(col("q_id"))
      .agg(first(col("q_emb")).as("q_emb"),
        graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), Probe).as("top"))
      .select(col("q_id"), col("q_emb"), explode(col("top.id")).as("cell"))
      .persist())
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long, Double)]
    val topk = scala.collection.mutable.Map.empty[Int, Set[(Long, Long)]]
    val gensAfter = scala.collection.mutable.Map.empty[Int, Seq[String]]
    val probeMatched = scala.collection.mutable.Map.empty[Int, Long]
    var full: Set[(Long, Long)] = Set.empty
    def gensOnDisk(): Seq[String] = {
      val s = java.nio.file.Files.list(store)
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
        .filter(java.nio.file.Files.isDirectory(_)).map(_.getFileName.toString).toSeq.sorted
      finally s.close()
    }
    def serve(win: Int): Unit = {
      // ONE store scan per serve, unpersisted before returning (r16,
      // guide §6) — see knnStoreDelete's serve for the rationale and the
      // stale-cache hazard; values unchanged.
      val back = spark.read.parquet(store.toString)
        .select(col("vec_id"), col("emb"), col("cell").cast("long").as("cell")).persist()
      try {
        val scored = back.join(broadcast(probes), "cell")
          .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
          .distinct()
        val served = topKRanked(scored, "q_id", "cos", "vec_id", K)
          .crossJoin(broadcast(back.agg(count(lit(1)).as("n_rows")))).collect()
        val pairs = served.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
        if (win == 3) full = pairs
        val nKept = pairs.count(full.contains).toLong
        served.foreach(r =>
          out += ((win.toLong, r.getAs[Long]("n_rows"), nKept,
            r.getAs[Long]("q_id"), r.getAs[Number]("rank").longValue,
            r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))))
        topk(win) = pairs
        gensAfter(win) = gensOnDisk()
        // the serve's OWN join, not the pre-serve probe frame: distinct
        // lookup keys that found ≥1 row in this window's store — the
        // scan-side work retention actually saves (r14 advice)
        probeMatched(win) = back.join(broadcast(probes.select(col("q_id"), col("cell"))), "cell")
          .select(col("q_id"), col("cell")).distinct().count()
      } finally back.unpersist()
    }
    serve(3)
    graft.Fs.rmTree(store.resolve("gen=0")); serve(2)
    graft.Fs.rmTree(store.resolve("gen=1")); serve(1)
    import spark.implicits._
    val df = out.toSeq
      .toDF("win", "n_rows", "n_kept", "q_id", "rank", "vec_id", "cos")
      .orderBy(col("win"), col("q_id"), col("rank"))
    (df, StoreRetentionDetail(topk.toMap, gensAfter.toMap,
      probes.select(col("q_id"), col("cell")).distinct().count(), probeMatched.toMap))
  }

  // ---------------------------------------------------------------- №199 knn_store_backfill
  /** Diagnostics behind [[knnStoreBackfill]]: served top-k pairs per
    * stage (the idempotence proof), the touched cells, the repair's
    * rewrite bill, and the per-cell file counts of UNTOUCHED cells
    * before/after the repair (the delta-bill proof at the file level). */
  private[graft] final case class StoreBackfillDetail(
      topk: Map[Int, Set[(Long, Long)]],
      touchedCells: Set[Long],
      rewrittenRows: Long,
      untouchedFilesBefore: Map[Long, Int],
      untouchedFilesAfter: Map[Long, Int])

  /** AT-LEAST-ONCE INGEST INTO THE SERVING VECTOR STORE — №194's
    * retry-storm leg mirrored onto the vector side, completing the
    * lifecycle matrix (calendar / retention / delete / backfill, each on
    * both stores): the nightly arrival append re-runs after a partial
    * failure and lands its rows A SECOND TIME into the same cell
    * partitions (new files, same directories — the duplicate a directory
    * drop cannot undo). Three serves against the FILES pin the contract:
    * S0 the clean store (base + arrivals); S1 post-storm — the served
    * top-k is IDENTICAL (the candidate frame dedups on (q_id, vec_id,
    * cos) before ranking, and the score is a pure function of the row —
    * exactly why the serving path tolerates at-least-once ingest) while
    * the censuses tell the truth (n_rows inflated by exactly the doubled
    * night, n_distinct unchanged — the drift a store monitor alarms on);
    * S2 post-repair — the TOUCHED cells (cells holding ≥1 arrival row, a
    * delta of the store) rewrite once from the CACHED assignment frames
    * (never read-then-overwrite of the live path — the r13 advice
    * discipline №194 solved with a generation swap; the cell store has
    * no generation axis, so the cache-derived rewrite IS the safe form),
    * censuses restored, top-k still identical, and the UNTOUCHED cells'
    * files are bit-for-bit untouched (the spec counts them). Reference
    * analogue: the reconciliation copy the export re-sends on retry and
    * the consumer dedups by id
    * (app/batch/JobCompletionNotificationListener.kt's rerun semantics).
    * At 100 TB: ingest is at-least-once the moment jobs retry; the serve
    * never needed exactly-once, the monitor sees the drift, and the
    * repair bill is the touched cells' rows — never the store. */
  def knnStoreBackfill(spark: SparkSession, dir: String): DataFrame =
    knnStoreBackfillDetail(spark, dir)._1

  private[graft] def knnStoreBackfillDetail(
      spark: SparkSession, dir: String): (DataFrame, StoreBackfillDetail) = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val arrivals = corpus.filter(col("vec_id") % CalMod === 1L)
    val base = corpus.filter(col("vec_id") % CalMod =!= 1L)
    val cent = refinedCentroids(spark, base, Centroids)
    val baseA = graft.CacheRegistry.track(
      cellsOf(base, cent).select(col("vec_id"), col("emb"), col("cell")).persist())
    val arrA = graft.CacheRegistry.track(
      cellsOf(arrivals, cent).select(col("vec_id"), col("emb"), col("cell")).persist())
    val store = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_stores", s"graft_storebf_${dirKey(dir)}").toString
    landStore(store, baseA)
    def append(a: DataFrame): Unit =
      byCell(a).write.partitionBy("cell").mode("append").parquet(store)
    append(arrA)
    val probes = graft.CacheRegistry.track(queries.join(broadcast(cent))
      .select(col("q_id"), col("q_emb"), col("c_id"), cosine6(col("q_emb"), col("c_emb")).as("qcos"))
      .groupBy(col("q_id"))
      .agg(first(col("q_emb")).as("q_emb"),
        graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), Probe).as("top"))
      .select(col("q_id"), col("q_emb"), explode(col("top.id")).as("cell"))
      .persist())
    val touched = arrA.select(col("cell")).distinct().collect().map(_.getLong(0)).toSet
    def filesByCell(): Map[Long, Int] = {
      val root = java.nio.file.Paths.get(store)
      val s = java.nio.file.Files.list(root)
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("cell="))
        .map { p =>
          val c = p.getFileName.toString.stripPrefix("cell=").toLong
          val l = java.nio.file.Files.list(p)
          val n = try l.filter(f => f.getFileName.toString.endsWith(".parquet")).count().toInt
          finally l.close()
          c -> n
        }.toMap
      finally s.close()
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long, Double)]
    val topk = scala.collection.mutable.Map.empty[Int, Set[(Long, Long)]]
    def serve(stage: Int): Unit = {
      // ONE store scan per serve, unpersisted before returning (r16,
      // guide §6) — see knnStoreDelete's serve for the rationale and the
      // stale-cache hazard; values unchanged.
      val back = spark.read.parquet(store)
        .select(col("vec_id"), col("emb"), col("cell").cast("long").as("cell")).persist()
      try {
        val scored = back.join(broadcast(probes), "cell")
          .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
          .distinct()
        val census = back.agg(count(lit(1)).as("n_rows"),
          countDistinct(col("vec_id")).as("n_distinct"))
        val served = topKRanked(scored, "q_id", "cos", "vec_id", K)
          .crossJoin(broadcast(census)).collect()
        served.foreach(r =>
          out += ((stage.toLong, r.getAs[Long]("n_rows"), r.getAs[Long]("n_distinct"),
            r.getAs[Long]("q_id"), r.getAs[Number]("rank").longValue,
            r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))))
        topk(stage) = served.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
      } finally back.unpersist()
    }
    serve(0)
    // the retry storm: the night lands AGAIN into the same cell dirs
    append(arrA)
    serve(1)
    val untouchedBefore = filesByCell().filter { case (c, _) => !touched(c) }
    // bounded repair: one dynamic overwrite of ONLY the touched cells,
    // content derived from the cached frames (single copy of the night)
    val repairContent = baseA.filter(col("cell").isin(touched.toSeq.map(Long.box): _*))
      .unionAll(arrA)
    val rewritten = repairContent.count()
    byCell(repairContent.select(col("vec_id"), col("emb"), col("cell")))
      .write.partitionBy("cell").mode("overwrite")
      .option("partitionOverwriteMode", "dynamic").parquet(store)
    serve(2)
    val untouchedAfter = filesByCell().filter { case (c, _) => !touched(c) }
    import spark.implicits._
    val df = out.toSeq
      .toDF("stage", "n_rows", "n_distinct", "q_id", "rank", "vec_id", "cos")
      .orderBy(col("stage"), col("q_id"), col("rank"))
    (df, StoreBackfillDetail(topk.toMap, touched, rewritten, untouchedBefore, untouchedAfter))
  }

  val knnStoreBackfillSql: String = {
    def memCte(s: Int, body: String): String = s"sbf_mem$s AS ($body)"
    def searchCte(s: Int): String =
      s"""sbf_cand$s AS (
         |  SELECT DISTINCT p.q_id, e.vec_id, ${cos6Sql("e.emb", "p.q_emb")} AS cos
         |  FROM sbf_mem$s e JOIN sbf_p p USING (cell)),
         |sbf_r$s AS (
         |  SELECT q_id, vec_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
         |  FROM sbf_cand$s),
         |sbf_cnt$s AS (
         |  SELECT count(*) AS n_rows, count(DISTINCT vec_id) AS n_distinct
         |  FROM sbf_mem$s)""".stripMargin
    def stageSelect(s: Int): String =
      s"""SELECT CAST($s AS BIGINT) AS stage, c.n_rows, c.n_distinct, r.q_id, r.rank, r.vec_id, r.cos
         |FROM sbf_r$s r, sbf_cnt$s c WHERE r.rank <= $K""".stripMargin
    val clean = """SELECT vec_id, emb, cell FROM sbf_j
      |  UNION ALL SELECT a.vec_id, a.emb, ja.cell FROM sbf_a a JOIN sbf_aj ja USING (vec_id)""".stripMargin
    val mems = Seq(
      memCte(0, clean),
      // S1: the storm — the night's rows twice (multiset membership)
      memCte(1, clean + "\n  UNION ALL SELECT a.vec_id, a.emb, ja.cell FROM sbf_a a JOIN sbf_aj ja USING (vec_id)"),
      memCte(2, clean))
    def assign(src: String, cent: String): String =
      s"""SELECT vec_id, c_id AS cell FROM (
         |    SELECT a.vec_id, c.c_id,
         |      row_number() OVER (PARTITION BY a.vec_id ORDER BY ${cos6Sql("a.emb", "c.c_emb")} DESC, c.c_id) AS r
         |    FROM $src a, $cent c) x WHERE r = 1""".stripMargin
    s"""WITH sbf_v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |sbf_q AS (SELECT vec_id AS q_id, emb AS q_emb FROM sbf_v WHERE vec_id < $NQueries),
       |sbf_c AS (SELECT vec_id, emb FROM sbf_v WHERE vec_id >= $NQueries),
       |sbf_b AS (SELECT vec_id, emb FROM sbf_c WHERE vec_id % $CalMod <> 1),
       |sbf_a AS (SELECT vec_id, emb FROM sbf_c WHERE vec_id % $CalMod = 1),
       |${refinedCentSql("sbf_b", "sbf0")},
       |sbf_jb AS (${assign("sbf_b", "sbf0cent")}),
       |sbf_j AS (
       |  SELECT b.vec_id, b.emb, jb.cell FROM sbf_b b JOIN sbf_jb jb USING (vec_id)),
       |sbf_aj AS (${assign("sbf_a", "sbf0cent")}),
       |sbf_p AS (
       |  SELECT q_id, q_emb, c_id AS cell FROM (
       |    SELECT q.q_id, q.q_emb, c.c_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "c.c_emb")} DESC, c.c_id) AS prank
       |    FROM sbf_q q, sbf0cent c) x WHERE prank <= $Probe),
       |${mems.mkString(",\n")},
       |${(0 to 2).map(searchCte).mkString(",\n")}
       |${(0 to 2).map(stageSelect).mkString("\nUNION ALL\n")}
       |ORDER BY stage, q_id, rank""".stripMargin
  }

  // ---------------------------------------------------------------- №216 knn_store_compact
  /** Diagnostics behind [[knnStoreCompact]]: served top-k pairs per
    * stage, the touched cells, the consolidation bill, per-cell parquet
    * file counts at each checkpoint, and the untouched cells' (name,
    * size) file evidence before/after. */
  private[graft] final case class StoreCompactDetail(
      topk: Map[Int, Set[(Long, Long)]],
      touchedCells: Set[Long],
      rewrittenRows: Long,
      filesByCell: Map[Int, Map[Long, Int]],
      untouchedBefore: Set[(String, Long)],
      untouchedAfter: Set[(String, Long)])

  /** COMPACT THE SERVING VECTOR STORE — the fifth file-lifecycle leg
    * (calendar / retention / delete / backfill / COMPACTION) mirrored
    * onto the vector side, closing the matrix on both stores: nightly
    * appends leave each touched CELL as a spray of small parquet files
    * (№184's streaming ingest writes one file per micro-batch per cell),
    * and at 100 TB a serve's cost goes footer-bound before it goes
    * byte-bound. Compaction consolidates each touched cell's files into
    * one, in the OBJECT-STORE-SAFE commit order — append the
    * consolidated file FIRST (content derived from the CACHED assignment
    * frames, never read-then-overwrite of the live path), serve through
    * the overlap, THEN delete the snapshotted old files:
    *   S0  pre-compaction — the arrival night landed as 3 small appends;
    *       baseline serve
    *   S1  MID-compaction — old and consolidated files both visible:
    *       `n_rows` inflates by exactly the touched cells' content while
    *       `n_distinct` and the served top-k DO NOT MOVE (the candidate
    *       frame dedups on (q_id, vec_id, cos) before ranking — №199's
    *       at-least-once tolerance is precisely what makes lock-free
    *       write-then-delete compaction safe for readers)
    *   S2  post-delete — censuses restored, each touched cell is ONE
    *       file, untouched cells' files BIT-IDENTICAL ((name, size)
    *       evidence in the spec), top-k still identical
    * Reference analogue: HBase minor compaction under scan-consistent
    * reads (app/batch/HBaseReader.kt never sees a half-compacted row).
    * Oracle: closed-form multiset memberships (S1 = store ∪ touched
    * cells' content again). At 100 TB: the consolidation job reads
    * exactly the touched cells' rows, the delete is metadata, probes
    * never change, and the serve never pauses. */
  def knnStoreCompact(spark: SparkSession, dir: String): DataFrame =
    knnStoreCompactDetail(spark, dir)._1

  private[graft] def knnStoreCompactDetail(
      spark: SparkSession, dir: String): (DataFrame, StoreCompactDetail) = {
    val v = Tables(spark, dir).embeddings.select(col("vec_id"), col("embedding").as("emb"))
    val queries = v.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
    val corpus = v.filter(col("vec_id") >= NQueries)
    val arrivals = corpus.filter(col("vec_id") % CalMod === 1L)
    val base = corpus.filter(col("vec_id") % CalMod =!= 1L)
    val cent = refinedCentroids(spark, base, Centroids)
    val baseA = graft.CacheRegistry.track(
      cellsOf(base, cent).select(col("vec_id"), col("emb"), col("cell")).persist())
    val arrA = graft.CacheRegistry.track(
      cellsOf(arrivals, cent).select(col("vec_id"), col("emb"), col("cell")).persist())
    val store = java.nio.file.Paths.get(System.getProperty("java.io.tmpdir"),
      "graft_stores", s"graft_storecmp_${dirKey(dir)}").toString
    landStore(store, baseA)
    // the small-files storm: the night lands as 3 micro-batch-shaped
    // appends — each touched cell accumulates one file per append
    (0L to 2L).foreach { slice =>
      byCell(arrA.filter(expr(s"(vec_id DIV $CalMod) % 3") === slice))
        .write.partitionBy("cell").mode("append").parquet(store)
    }
    val probes = graft.CacheRegistry.track(queries.join(broadcast(cent))
      .select(col("q_id"), col("q_emb"), col("c_id"), cosine6(col("q_emb"), col("c_emb")).as("qcos"))
      .groupBy(col("q_id"))
      .agg(first(col("q_emb")).as("q_emb"),
        graft.functions.TopKByScore.topK(col("qcos"), col("c_id"), Probe).as("top"))
      .select(col("q_id"), col("q_emb"), explode(col("top.id")).as("cell"))
      .persist())
    val touched = arrA.select(col("cell")).distinct().collect().map(_.getLong(0)).toSet
    def cellFiles(c: Long): Seq[java.nio.file.Path] = {
      val d = java.nio.file.Paths.get(store, s"cell=$c")
      if (!java.nio.file.Files.isDirectory(d)) return Seq.empty
      val l = java.nio.file.Files.list(d)
      try scala.jdk.CollectionConverters.IteratorHasAsScala(l.iterator()).asScala
        .filter(_.getFileName.toString.endsWith(".parquet")).toVector
      finally l.close()
    }
    def allCells(): Seq[Long] = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(store))
      try scala.jdk.CollectionConverters.IteratorHasAsScala(s.iterator()).asScala
        .filter(p => java.nio.file.Files.isDirectory(p) &&
          p.getFileName.toString.startsWith("cell="))
        .map(_.getFileName.toString.stripPrefix("cell=").toLong).toVector
      finally s.close()
    }
    def filesByCell(): Map[Long, Int] = allCells().map(c => c -> cellFiles(c).size).toMap
    def untouchedEvidence(): Set[(String, Long)] =
      allCells().filterNot(touched).flatMap(c => cellFiles(c).map(p =>
        (s"cell=$c/${p.getFileName}", java.nio.file.Files.size(p)))).toSet
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long, Long, Long, Long, Double)]
    val topk = scala.collection.mutable.Map.empty[Int, Set[(Long, Long)]]
    val filesAt = scala.collection.mutable.Map.empty[Int, Map[Long, Int]]
    def serve(stage: Int): Unit = {
      // ONE store scan per serve, unpersisted before returning (r16,
      // guide §6) — see knnStoreDelete's serve for the rationale and the
      // stale-cache hazard; values unchanged.
      val back = spark.read.parquet(store)
        .select(col("vec_id"), col("emb"), col("cell").cast("long").as("cell")).persist()
      try {
        val scored = back.join(broadcast(probes), "cell")
          .select(col("q_id"), col("vec_id"), cosine6(col("emb"), col("q_emb")).as("cos"))
          .distinct()
        val census = back.agg(count(lit(1)).as("n_rows"),
          countDistinct(col("vec_id")).as("n_distinct"))
        val served = topKRanked(scored, "q_id", "cos", "vec_id", K)
          .crossJoin(broadcast(census)).collect()
        served.foreach(r =>
          out += ((stage.toLong, r.getAs[Long]("n_rows"), r.getAs[Long]("n_distinct"),
            r.getAs[Long]("q_id"), r.getAs[Number]("rank").longValue,
            r.getAs[Long]("vec_id"), r.getAs[Double]("cos"))))
        topk(stage) = served.map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id"))).toSet
        filesAt(stage) = filesByCell()
      } finally back.unpersist()
    }
    serve(0)
    val untouchedBefore = untouchedEvidence()
    // snapshot the doomed files BEFORE the consolidated append lands
    val oldFiles = touched.toSeq.flatMap(cellFiles)
    // WRITE-then-delete: the consolidated per-cell files land while the
    // old ones still serve — content from the CACHED frames
    val consolidated = baseA.filter(col("cell").isin(touched.toSeq.map(Long.box): _*))
      .unionAll(arrA)
    val rewritten = consolidated.count()
    byCell(consolidated).write.partitionBy("cell").mode("append").parquet(store)
    serve(1)
    oldFiles.foreach(java.nio.file.Files.delete)
    serve(2)
    val untouchedAfter = untouchedEvidence()
    import spark.implicits._
    val df = out.toSeq
      .toDF("stage", "n_rows", "n_distinct", "q_id", "rank", "vec_id", "cos")
      .orderBy(col("stage"), col("q_id"), col("rank"))
    (df, StoreCompactDetail(topk.toMap, touched, rewritten, filesAt.toMap,
      untouchedBefore, untouchedAfter))
  }

  val knnStoreCompactSql: String = {
    def assign(src: String, cent: String): String =
      s"""SELECT vec_id, c_id AS cell FROM (
         |    SELECT a.vec_id, c.c_id,
         |      row_number() OVER (PARTITION BY a.vec_id ORDER BY ${cos6Sql("a.emb", "c.c_emb")} DESC, c.c_id) AS r
         |    FROM $src a, $cent c) x WHERE r = 1""".stripMargin
    def searchCte(s: Int): String =
      s"""scp_cand$s AS (
         |  SELECT DISTINCT p.q_id, e.vec_id, ${cos6Sql("e.emb", "p.q_emb")} AS cos
         |  FROM scp_mem$s e JOIN scp_p p USING (cell)),
         |scp_r$s AS (
         |  SELECT q_id, vec_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
         |  FROM scp_cand$s),
         |scp_cnt$s AS (
         |  SELECT count(*) AS n_rows, count(DISTINCT vec_id) AS n_distinct
         |  FROM scp_mem$s)""".stripMargin
    def stageSelect(s: Int): String =
      s"""SELECT CAST($s AS BIGINT) AS stage, c.n_rows, c.n_distinct, r.q_id, r.rank, r.vec_id, r.cos
         |FROM scp_r$s r, scp_cnt$s c WHERE r.rank <= $K""".stripMargin
    val clean = """SELECT vec_id, emb, cell FROM scp_j
      |  UNION ALL SELECT a.vec_id, a.emb, ja.cell FROM scp_a a JOIN scp_aj ja USING (vec_id)""".stripMargin
    // S1: the consolidated files next to the old ones — the touched
    // cells' FULL content appears twice (multiset membership)
    val mems = Seq(
      s"scp_mem0 AS ($clean)",
      s"""scp_mem1 AS ($clean
         |  UNION ALL SELECT m.* FROM ($clean) m
         |  WHERE m.cell IN (SELECT DISTINCT cell FROM scp_aj))""".stripMargin,
      s"scp_mem2 AS ($clean)")
    s"""WITH scp_v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |scp_q AS (SELECT vec_id AS q_id, emb AS q_emb FROM scp_v WHERE vec_id < $NQueries),
       |scp_c AS (SELECT vec_id, emb FROM scp_v WHERE vec_id >= $NQueries),
       |scp_b AS (SELECT vec_id, emb FROM scp_c WHERE vec_id % $CalMod <> 1),
       |scp_a AS (SELECT vec_id, emb FROM scp_c WHERE vec_id % $CalMod = 1),
       |${refinedCentSql("scp_b", "scp0")},
       |scp_jb AS (${assign("scp_b", "scp0cent")}),
       |scp_j AS (
       |  SELECT b.vec_id, b.emb, jb.cell FROM scp_b b JOIN scp_jb jb USING (vec_id)),
       |scp_aj AS (${assign("scp_a", "scp0cent")}),
       |scp_p AS (
       |  SELECT q_id, q_emb, c_id AS cell FROM (
       |    SELECT q.q_id, q.q_emb, c.c_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "c.c_emb")} DESC, c.c_id) AS prank
       |    FROM scp_q q, scp0cent c) x WHERE prank <= $Probe),
       |${mems.mkString(",\n")},
       |${(0 to 2).map(searchCte).mkString(",\n")}
       |${(0 to 2).map(stageSelect).mkString("\nUNION ALL\n")}
       |ORDER BY stage, q_id, rank""".stripMargin
  }

  val knnStoreRetentionSql: String = {
    def member(w: Int): String = w match {
      case 3 => "TRUE"
      case 2 => s"vec_id % $CalMod IN (1, 2)"
      case 1 => s"vec_id % $CalMod = 2"
    }
    def winCtes(w: Int): String =
      s"""srt_cand$w AS (
         |  SELECT DISTINCT p.q_id, e.vec_id, ${cos6Sql("e.emb", "p.q_emb")} AS cos
         |  FROM srt_j e JOIN srt_p p USING (cell) WHERE ${member(w)}),
         |srt_r$w AS MATERIALIZED (
         |  SELECT q_id, vec_id, cos,
         |    row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
         |  FROM srt_cand$w),
         |srt_cnt$w AS (
         |  SELECT (SELECT count(*) FROM srt_j WHERE ${member(w)}) AS n_rows,
         |    (SELECT count(*) FROM srt_r$w w JOIN srt_r3 f
         |       ON f.q_id = w.q_id AND f.vec_id = w.vec_id
         |     WHERE w.rank <= $K AND f.rank <= $K) AS n_kept)""".stripMargin
    def winSelect(w: Int): String =
      s"""SELECT CAST($w AS BIGINT) AS win, c.n_rows, c.n_kept, r.q_id, r.rank, r.vec_id, r.cos
         |FROM srt_r$w r, srt_cnt$w c WHERE r.rank <= $K""".stripMargin
    s"""WITH srt_v AS (SELECT vec_id, embedding AS emb FROM embeddings),
       |srt_q AS (SELECT vec_id AS q_id, emb AS q_emb FROM srt_v WHERE vec_id < $NQueries),
       |srt_c AS (SELECT vec_id, emb FROM srt_v WHERE vec_id >= $NQueries),
       |srt_b AS (SELECT vec_id, emb FROM srt_c WHERE vec_id % $CalMod NOT IN (1, 2)),
       |${refinedCentSql("srt_b", "srt0")},
       |srt_j AS MATERIALIZED (
       |  SELECT vec_id, emb, cell FROM (
       |    SELECT a.vec_id, a.emb, c.c_id AS cell,
       |      row_number() OVER (PARTITION BY a.vec_id ORDER BY ${cos6Sql("a.emb", "c.c_emb")} DESC, c.c_id) AS r
       |    FROM srt_c a, srt0cent c) x WHERE r = 1),
       |srt_p AS (
       |  SELECT q_id, q_emb, c_id AS cell FROM (
       |    SELECT q.q_id, q.q_emb, c.c_id,
       |      row_number() OVER (PARTITION BY q.q_id ORDER BY ${cos6Sql("q.q_emb", "c.c_emb")} DESC, c.c_id) AS prank
       |    FROM srt_q q, srt0cent c) x WHERE prank <= $Probe),
       |${Seq(3, 2, 1).map(winCtes).mkString(",\n")}
       |${Seq(3, 2, 1).map(winSelect).mkString("\nUNION ALL\n")}
       |ORDER BY win, q_id, rank""".stripMargin
  }
}
