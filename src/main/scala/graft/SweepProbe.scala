package graft

/** Diagnostic: run a comma-separated list of registry queries IN ORDER in
  * one session, timing each (same toRdd.count action and cache/conf reset
  * discipline as Bench), to expose cross-query session-state accumulation
  * — the r16 investigation tool for the "streaming rows bench 10-20× their
  * isolated floors mid-sweep" effect. Also prints the scheduler's
  * all-jobs count and listener-bus queue sizes after each query.
  *
  * Usage: graft.SweepProbe q1,q2,q3 [sfDir]
  */
object SweepProbe {
  def main(args: Array[String]): Unit = {
    if (args(0) == "@order") { // print Bench's run order (Map iteration order)
      SparkEntry.queries.keys.foreach(println); return
    }
    val names = args(0).split(",").toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]", cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val baselineConf = spark.conf.getAll
    def resetConfs(): Unit = {
      val cur = spark.conf.getAll
      for ((k, v) <- baselineConf if !cur.get(k).contains(v))
        try spark.conf.set(k, v) catch { case _: Throwable => () }
      for (k <- cur.keySet -- baselineConf.keySet)
        try spark.conf.unset(k) catch { case _: Throwable => () }
    }
    names.foreach { n =>
      val fn = SparkEntry.queries.getOrElse(n, sys.error(s"unknown query $n"))
      val t0 = System.nanoTime()
      try fn(spark, sfDir).queryExecution.toRdd.count()
      catch { case e: Throwable => System.err.println(s"[probe] $n FAILED: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      CacheRegistry.releaseAll(spark)
      resetConfs()
      val sc = spark.sparkContext
      val nJobs = sc.statusTracker.getJobIdsForGroup(null).length
      println(f"[probe] $n%-28s ${dt}%8.2fs  cumJobs=$nJobs")
    }
    spark.stop()
  }
}
