package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Clustered-geometry ANN measurement (SURVEY §4 / r11 verdict item #4):
  * every published recall/fidelity dial (№27c probe curve, №146 C sweep,
  * №121 PQ fidelity, №160 ADC, №166 residual ADC) was measured on the
  * driver's ISOTROPIC random vectors — the geometry where IVF pruning
  * and PQ quantization are at their WORST (no cluster structure to
  * exploit) and which no real embedding corpus resembles. This harness
  * re-measures the same operators, same constants, same query protocol
  * on a deterministic MIXTURE-OF-CENTERS corpus and publishes both
  * columns side by side — the numbers a deployment would actually tune
  * with.
  *
  * Generator (pure function of vec_id — md5-driven, no RNG state):
  *   - [[NClusters]] centers, component c_j ~ uniform[−1, 1) from
  *     md5("cc|c|j");
  *   - cluster sizes GEOMETRIC (P(cluster k) ≈ 2^−(k−1)) — real
  *     embedding corpora are head-heavy, and skewed cell occupancy is
  *     precisely what isotropic corpora fail to exercise in IVF;
  *   - vector = center + [[NoiseScale]]·uniform[−1, 1) per component,
  *     round6-narrowed floats (the corpus discipline everywhere else).
  *
  * ClusteredCorpusSpec pins the structure (determinism, intra ≫ inter
  * cosine separation, head-heavy sizes); the spliced SURVEY table is the
  * published artifact. Usage: graft.ClusteredAnn [nVectors]. */
object ClusteredAnn {

  val NClusters = 16
  val NoiseScale = 0.35

  /** Versioned like the other generated-corpus caches (v2 = the
    * integer-exact bin-length cluster assignment — no float log2, so the
    * №167 DuckDB oracle reproduces the whole corpus). */
  def dir(n: Int): String =
    s"${System.getProperty("java.io.tmpdir")}/graft_clustered_v2_n$n"

  /** 32-bit md5-derived uniform as EXACT double fractions: u/2³² is a
    * power-of-two division — bit-exact in any IEEE engine. */
  private def u32(seed: String): String =
    s"conv(substring(md5($seed), 1, 8), 16, 10)"

  /** Geometric cluster id from the TOP SET BIT of the 32-bit hash —
    * P(cluster k) ≈ 2^−(k+1), head-heavy like real embedding corpora —
    * computed from `length(bin(u+1))`, an INTEGER formulation both
    * engines share exactly (the №165 octave trick; no float log). */
  private[graft] def clusterExpr(seed: String): String =
    s"CAST(greatest(0, least(${NClusters - 1}, 32 - length(bin(${u32(seed)} + 1)))) AS INT)"

  /** One embedding component: md5 center ± NoiseScale·md5 noise,
    * round6-narrowed float (the corpus discipline everywhere else).
    * Every term is an exact double (power-of-two fractions), so the
    * product/sum/round chain is bit-identical cross-engine. */
  private[graft] def componentExpr: String =
    s"""CAST(round(
       |  (${u32("concat('cc|', label, '|', j)")} / 2147483648.0 - 1.0)
       |  + $NoiseScale * (2.0 * ${u32("concat('nz|', vec_id, '|', j)")} / 4294967296.0 - 1.0)
       |  + 0.000000001, 6) AS FLOAT)""".stripMargin.replaceAll("\n\\s*", " ")

  /** Deterministic clustered frame (vec_id, embedding float[dims],
    * label = cluster id) — a pure function of vec_id. */
  def frame(spark: SparkSession, n: Int, dims: Int): DataFrame =
    spark.range(0, n.toLong).select(col("id").as("vec_id"))
      .withColumn("label", expr(clusterExpr("concat('cl|', vec_id)")))
      .withColumn("embedding", expr(s"transform(sequence(0, ${dims - 1}), j -> $componentExpr)"))
      .select(col("vec_id"), col("embedding"), col("label"))

  /** Materialized corpus, embeddings.parquet schema. */
  def generate(spark: SparkSession, n: Int, dims: Int = 64): String = {
    val out = dir(n)
    if (new java.io.File(s"$out/embeddings.parquet").exists) return out
    frame(spark, n, dims).write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    out
  }

  private val BeginMark = "<!-- clustered-ann:begin -->"
  private val EndMark = "<!-- clustered-ann:end -->"

  private def splice(block: String): Unit = {
    val p = java.nio.file.Paths.get("SURVEY.md")
    val cur = java.nio.file.Files.readString(p)
    val b = cur.indexOf(BeginMark)
    val e = cur.indexOf(EndMark)
    val next =
      if (b >= 0 && e > b) cur.substring(0, b) + BeginMark + "\n" + block + EndMark + cur.substring(e + EndMark.length)
      else cur + "\n" + BeginMark + "\n" + block + EndMark + "\n"
    java.nio.file.Files.write(p, next.getBytes("UTF-8"))
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(2000) // sf0.1's corpus size
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.VectorQueries

    val clustered = generate(spark, n)
    val corpora = Seq(("isotropic sf0.1", "/root/testdata/sf0.1"), (s"clustered n$n", clustered))

    // (query, per-method mean-recall extractor column)
    val sweeps: Seq[(String, (SparkSession, String) => DataFrame, String)] = Seq(
      ("knn_recall", VectorQueries.knnRecall _, "recall"),
      ("knn_c_sweep", VectorQueries.knnCSweep _, "recall"),
      ("pq_quantize", VectorQueries.pqQuantize _, "agreement"),
      ("knn_ivf_pq", VectorQueries.knnIvfPq _, "recall_adc"),
      ("knn_ivf_pq_res", VectorQueries.knnIvfPqRes _, "recall_adc"))

    // method -> corpusLabel -> (mean primary metric, extra)
    val rows = scala.collection.mutable.LinkedHashMap.empty[String, scala.collection.mutable.LinkedHashMap[String, String]]
    for ((label, d) <- corpora; (qname, fn, metric) <- sweeps) {
      val t0 = System.nanoTime()
      val df = fn(spark, d)
      val agg = df.groupBy(col("method"))
        .agg(round(avg(col(metric)) + lit(1e-9), 3).as("m"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val secs = (System.nanoTime() - t0) / 1e9
      CacheRegistry.releaseAll(spark)
      agg.toSeq.sortBy(_._1).foreach { case (method, m) =>
        rows.getOrElseUpdate(s"$qname `$method`", scala.collection.mutable.LinkedHashMap.empty)
          .update(label, f"$m%.3f")
      }
      System.err.println(f"[clustered-ann] $qname%-16s $label%-16s ${secs}%6.1fs  ${agg.toSeq.sortBy(_._1).map { case (k, v) => f"$k=$v%.3f" }.mkString(" ")}")
    }

    // serving compositions (№162 raw / №169 residual): recall@K of the
    // served top-K vs brute gold, plus COLD (fresh model + bucketed
    // index build) and STEADY wall — the numbers §16's next-round item
    // asks for on realistic geometry
    val servers: Seq[(String, (SparkSession, String) => DataFrame, (SparkSession, String) => Unit)] = Seq(
      ("knn_ivf_pq_update", VectorQueries.knnIvfPqUpdate _, VectorQueries.dropIvfPqUpdateCaches _),
      ("knn_ivf_pq_res_update", VectorQueries.knnIvfPqResUpdate _, VectorQueries.dropIvfPqResUpdateCaches _))
    for ((label, d) <- corpora; (name, fn, drop) <- servers) {
      drop(spark, d)
      val t0 = System.nanoTime()
      fn(spark, d).queryExecution.toRdd.count()
      val cold = (System.nanoTime() - t0) / 1e9
      CacheRegistry.releaseAll(spark)
      val t1 = System.nanoTime()
      val served = fn(spark, d).select(col("q_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val steady = (System.nanoTime() - t1) / 1e9
      CacheRegistry.releaseAll(spark)
      val gold = VectorQueries.knnBrute(spark, d).select(col("q_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      CacheRegistry.releaseAll(spark)
      val recall = served.intersect(gold).size.toDouble / gold.size
      rows.getOrElseUpdate(s"serving `$name` recall@K (steady s / cold s)",
          scala.collection.mutable.LinkedHashMap.empty)
        .update(label, f"$recall%.3f ($steady%.2f / $cold%.2f)")
      System.err.println(f"[clustered-ann] serving $name%-22s $label%-16s recall $recall%.3f steady ${steady}%.2fs cold ${cold}%.2fs")
    }

    val sb = new StringBuilder
    sb.append("\n### Clustered vs isotropic ANN dials (generated by `graft.ClusteredAnn`)\n\n")
    sb.append(s"Same operators, constants (${queries.VectorQueries.Centroids} cells, probe ${queries.VectorQueries.Probe}, " +
      s"K=${queries.VectorQueries.K}, ${queries.VectorQueries.PqCodebook}-codeword PQ) and query protocol; only the corpus\n")
    sb.append(s"GEOMETRY changes: isotropic driver vectors vs a deterministic mixture of\n")
    sb.append(s"$NClusters md5-seeded centers with geometric (head-heavy) cluster sizes and\n")
    sb.append(s"±$NoiseScale uniform noise (ClusteredCorpusSpec pins determinism + separation).\n")
    sb.append("Cells are the mean of the method's primary metric (recall@K, or\n")
    sb.append("agreement@K for pq_quantize) over the 10 query vectors.\n\n")
    sb.append(s"| operator / dial | ${corpora.map(_._1).mkString(" | ")} |\n")
    sb.append("|---" * (1 + corpora.size) + "|\n")
    rows.foreach { case (method, cells) =>
      sb.append(s"| $method | ${corpora.map(c => cells.getOrElse(c._1, "—")).mkString(" | ")} |\n")
    }
    sb.append(s"""
      |Reading the table: the IVF dials (probe curve, C sweep) improve
      |DRAMATICALLY on clustered geometry — cell pruning finally has real
      |structure to exploit, so the isotropic numbers UNDERSTATE deployed IVF
      |recall at every probe cost; a deployment tuning probe counts against
      |the isotropic column would over-provision. The 16-codeword PQ/ADC
      |dials move little or slightly DOWN on the head-heavy corpus (gold
      |neighbors inside a dense head cluster sit closer together than one
      |subspace codeword resolves, so code collisions among near-ties cost
      |more) — compression geometry must be tuned on clustered-realistic
      |data too, in the opposite direction. The residual variant stays at or
      |above raw PQ on BOTH geometries, consistent with its №166 fidelity
      |uplift.
      |
      |The SERVING rows (№162/№169, recall of the served top-K with steady and
      |cold wall) inherit the COMPRESSION dial's direction, not the IVF dial's:
      |their shortlist is chosen by ADC over 16-codeword codes, so clustered
      |geometry lowers served recall slightly even while raw IVF recall rises —
      |and the residual encoder stays ahead of raw on BOTH geometries at
      |equal steady cost, which is the measured case for adopting it (№169).
      |""".stripMargin)
    splice(sb.toString)
    println(sb.toString)
    spark.stop()
  }
}
