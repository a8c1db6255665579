package graft

import org.apache.spark.SparkConf
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

/** Flagship queries through a REAL two-host cluster — the evidence leg
  * local[32] cannot give: every bench/correctness run to date is one JVM,
  * so network shuffle (SASL-framed block fetches between executor
  * processes), multi-JVM broadcast distribution, and the scheduler's
  * cross-host task placement were inferred from the plans, never
  * executed. This drill runs the three flagship rows — `export_records`
  * (the reference's whole pipeline: kv decode → AES → sanitise →
  * manifest), `dedup_pipeline` (tokenize → pair-find → verify →
  * transitive closure → keeper), `knn_graph_indexed` (bucketed IVF store
  * build + MERGE-pinned co-located search) — on
  * [[org.apache.spark.deploy.graftbridge.ClusterBridge]]'s standalone
  * cluster (two Workers on distinct loopback hosts, REAL forked executor
  * JVMs, real netty shuffle between them), then re-runs them on
  * `local[8]` in the same JVM and asserts canonical row equality.
  *
  * What this proves that the plans alone could not: closures and custom
  * kryo/java-serialized state (Catalyst expressions like AesCtrExpr,
  * TopKByScore heap buffers, broadcast centroid maps) survive
  * serialization to foreign JVMs; partial aggregation merges across a
  * network boundary; the bucketed table's co-located MERGE join holds
  * off-local[N]; and the results are bit-identical either way. Hosts are
  * captured per TASK (the verdict requires both 127.0.0.1 and 127.0.0.2
  * to have executed tasks — a one-host run would prove nothing), and the
  * executed plan of the indexed search ships to stderr for the committed
  * artifact (CLUSTER_DRILL.md).
  *
  * Launched by ClusterFlagshipSpec in a fresh JVM (the
  * SpeculationSchedulerSpec harness precedent: SPARK_SCALA_VERSION set,
  * both pipes drained on background threads, one-line JSON verdict). */
object ClusterDrill {

  /** The three flagship batch rows plus one STATEFUL STREAMING row —
    * stream_dedup runs its replay (file source → dropDuplicates state →
    * per-batch output) with executor-side state stores in the forked
    * JVMs, the leg local[N] shares with no other evidence. */
  val Flagships: Seq[String] = sys.env.get("SPARK_GRAFT_CLUSTER_QUERIES")
    .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    .filter(_.nonEmpty) // blank/commas-only override → defaults, not a zero-query run
    .getOrElse(Seq("export_records", "dedup_pipeline", "knn_graph_indexed", "stream_dedup"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val scratch = java.nio.file.Files.createTempDirectory("graft_cluster_drill_")
    val opens = Seq("java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io", "java.base/java.net",
      "java.base/java.nio", "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic", "java.base/sun.nio.ch",
      "java.base/sun.nio.cs", "java.base/sun.security.action",
      "java.base/sun.util.calendar").map(p => s"--add-opens $p=ALL-UNNAMED").mkString(" ")

    val (masterUrl, clusterEnvs) = org.apache.spark.deploy.graftbridge.ClusterBridge.start(
      new SparkConf(false), Seq("127.0.0.1", "127.0.0.2"),
      coresPerWorker = 4, memoryPerWorkerMb = 2048,
      workDirOf = i => scratch.resolve(s"work$i").toString)

    var ok = true
    def check(cond: Boolean, what: String): Unit =
      if (!cond) { ok = false; System.err.println(s"DRILL FAIL: $what") }

    /** Canonical form: rows as strings, sorted — order-free, same JVM so
      * double/array formatting is identical across the two sessions. */
    def canon(df: org.apache.spark.sql.DataFrame): Vector[String] =
      df.collect().map(_.toString).sorted.toVector

    try {
      // ---------------- leg 1: the real cluster ----------------
      val cluster = GraftSession.builder(masterUrl, 8)
        .config("spark.driver.host", "127.0.0.1")
        .config("spark.executor.memory", "1g")
        .config("spark.executor.extraClassPath", sys.props("java.class.path"))
        .config("spark.executor.extraJavaOptions", opens)
        .getOrCreate()
      cluster.sparkContext.setLogLevel("WARN")
      val taskHosts = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
      cluster.sparkContext.addSparkListener(new SparkListener {
        override def onTaskStart(e: SparkListenerTaskStart): Unit =
          taskHosts.add(e.taskInfo.host)
      })

      val clusterSecs = scala.collection.mutable.LinkedHashMap.empty[String, Double]
      val clusterRows = Flagships.map { name =>
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(cluster, sfDir)
        val rows = canon(df)
        clusterSecs(name) = (System.nanoTime() - t0) / 1e9
        // the executed plan AFTER the action: AQE has re-planned, so the
        // Exchange count is the real shuffle count the cluster paid
        if (name == "knn_graph_indexed") {
          System.err.println("=== multi-host executed plan: knn_graph_indexed ===")
          System.err.println(df.queryExecution.executedPlan.toString.take(8000))
        }
        CacheRegistry.releaseAll(cluster)
        name -> rows
      }.toMap
      val hosts = { import scala.jdk.CollectionConverters._; taskHosts.asScala.toVector.sorted }
      check(hosts.contains("127.0.0.1") && hosts.contains("127.0.0.2"),
        s"tasks did not span both hosts (saw: ${hosts.mkString(",")}) — no network shuffle was exercised")
      cluster.stop()

      // ---------------- leg 2: local[8] in the same JVM ----------------
      val local = GraftSession.builder("local[8]", 8).getOrCreate()
      local.sparkContext.setLogLevel("WARN")
      val equal = Flagships.map { name =>
        val t0 = System.nanoTime()
        val rows = canon(SparkEntry.queries(name)(local, sfDir))
        val localSec = (System.nanoTime() - t0) / 1e9
        CacheRegistry.releaseAll(local)
        val same = rows == clusterRows(name)
        check(rows.nonEmpty, s"$name returned zero rows")
        check(same, s"$name: cluster result diverged from local[8] " +
          s"(${clusterRows(name).size} vs ${rows.size} rows; first cluster row: " +
          s"${clusterRows(name).headOption.getOrElse("-")})")
        name -> (same, rows.size, localSec)
      }.toMap
      local.stop()

      def f(d: Double): String = BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
      // timing is EVIDENCE of the executed shuffle, not a benchmark: one
      // run each, same JVM, cluster leg pays real network fetch + 2
      // forked-executor startup; local leg reuses the warm driver JVM
      val perQuery = Flagships.map { n =>
        s""""$n":{"rows":${equal(n)._2},"equal":${equal(n)._1},""" +
          s""""cluster_s":${f(clusterSecs(n))},"local_s":${f(equal(n)._3)}}""" }.mkString(",")
      println(s"""{"hosts":[${hosts.map("\"" + _ + "\"").mkString(",")}],$perQuery,"ok":$ok}""")
    } finally {
      org.apache.spark.deploy.graftbridge.ClusterBridge.stop(clusterEnvs)
      graft.Fs.rmTree(scratch)
    }
    if (!ok) sys.exit(1)
  }
}
