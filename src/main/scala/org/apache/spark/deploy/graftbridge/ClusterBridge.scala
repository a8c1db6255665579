package org.apache.spark.deploy.graftbridge

import org.apache.spark.SparkConf
import org.apache.spark.deploy.master.Master
import org.apache.spark.deploy.worker.Worker
import org.apache.spark.rpc.RpcEnv

/** A TWO-HOST standalone mini-cluster on one machine — the piece
  * `local-cluster[n,c,m]` cannot give: it binds every Worker to the same
  * hostname, and the speculation scheduler refuses to launch a
  * speculative copy on any host that already has a live attempt
  * (`TaskSetManager.dequeueSpeculativeTask` filters on
  * `hasAttemptOnHost`), so single-host clusters can MARK a task
  * speculatable but never actually run the duplicate. Binding the two
  * Workers to distinct loopback addresses (127.0.0.1 / 127.0.0.2 — all
  * of 127/8 is the loopback interface on Linux) makes them distinct
  * hosts to the scheduler while executors still share the local
  * filesystem, which is exactly what the sinks' commit-race drill
  * ([[graft.sources.SpeculationDrill]]) needs.
  *
  * Lives in Spark's namespace for the same reason as
  * [[org.apache.spark.sql.graftbridge.StateStoreBridge]]:
  * `Master.startRpcEnvAndEndpoint` / `Worker.startRpcEnvAndEndpoint` are
  * `private[deploy]` — this is the public LocalSparkCluster recipe
  * (core/src/main/scala/org/apache/spark/deploy/LocalSparkCluster.scala)
  * with per-worker hosts and work dirs. */
object ClusterBridge {

  /** Start a Master on `hosts.head` and one Worker per host; returns
    * (masterUrl, rpcEnvs to stop). `workDirOf` keeps executor logs under
    * the caller's scratch instead of $SPARK_HOME/work. */
  def start(conf: SparkConf, hosts: Seq[String], coresPerWorker: Int,
            memoryPerWorkerMb: Int, workDirOf: Int => String): (String, Seq[RpcEnv]) = {
    val c = conf.clone()
      .set("spark.ui.enabled", "false")
      .set("spark.worker.timeout", "30")
    // tuple is (rpcEnv, webUiPort, restPort) — the RPC port the workers
    // and the app must dial lives on the env's own address
    val (masterEnv, _, _) = Master.startRpcEnvAndEndpoint(hosts.head, 0, 0, c)
    val masterUrl = s"spark://${hosts.head}:${masterEnv.address.port}"
    val workerEnvs = hosts.zipWithIndex.map { case (h, i) =>
      Worker.startRpcEnvAndEndpoint(h, 0, 0, coresPerWorker, memoryPerWorkerMb,
        Array(masterUrl), workDirOf(i), Some(i + 1), c, None)
    }
    (masterUrl, masterEnv +: workerEnvs)
  }

  def stop(envs: Seq[RpcEnv]): Unit = {
    envs.reverse.foreach(_.shutdown())
    envs.reverse.foreach(_.awaitTermination())
  }
}
