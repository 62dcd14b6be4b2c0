package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executor-LOSS exercise for [[Materialize]] — the strategy switch's
  * cluster paths (ReplicatedPersist / ReliableCheckpoint) never execute
  * under plain local[n], so this spec runs them for real under
  * `local-cluster[2,1,1024]`: two separate executor JVMs whose blocks
  * actually disappear when one is killed.
  *
  * Runs by DEFAULT under `sbt test`: build.sbt forks this suite into
  * its own JVM group (SparkContext is process-global) and injects
  * GRAFT_CLUSTER_SPEC=1 plus SPARK_SCALA_VERSION=2.13 (the standalone
  * worker builds executor commands via the launcher, whose
  * scala-version probe otherwise expects a source-tree SPARK_HOME and
  * dies with "Cannot find any build directories"). Opt out on hosts
  * that cannot spawn worker JVMs with GRAFT_CLUSTER_SPEC=0.
  */
class ClusterMaterializeSpec extends AnyFunSuite {

  private val enabled = sys.env.get("GRAFT_CLUSTER_SPEC").contains("1")

  /** Spin up the two-executor cluster, run `body`, always stop. The
    * sbt test classpath (graft classes + scalatest) is handed to the
    * executor JVMs explicitly — they are separate processes and see
    * none of the driver's classes otherwise. */
  private def withCluster(body: SparkSession => Unit): Unit = {
    val spark = SparkSession.builder()
      .master("local-cluster[2,1,1024]")
      .config("spark.executor.memory", "1g")
      .config("spark.executor.extraClassPath",
        System.getProperty("java.class.path"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // one attempt would still pass (replication means no task ever
      // fails), but don't let an unrelated flake fail the gate
      .config("spark.task.maxFailures", "4")
      .getOrCreate()
    try {
      // wait for both executor JVMs to register before placing blocks
      val deadline = System.currentTimeMillis() + 60000
      while (nExecutors(spark) < 2
        && System.currentTimeMillis() < deadline) Thread.sleep(200)
      assert(nExecutors(spark) == 2, "two executors must register")
      body(spark)
    } finally spark.stop()
  }

  /** Live executor count — block managers minus the driver's. */
  private def nExecutors(spark: SparkSession): Int =
    spark.sparkContext.getExecutorMemoryStatus.size - 1

  /** Kill one executor JVM (standalone ids are "0"/"1" under
    * local-cluster) and wait until its block manager deregisters —
    * from that point its non-replicated blocks are unreachable. */
  private def killOneExecutor(spark: SparkSession): Unit = {
    val sc = spark.sparkContext
    assert(sc.killExecutors(Seq("0")) || sc.killExecutors(Seq("1")),
      "no executor accepted the kill")
    val deadline = System.currentTimeMillis() + 60000
    while (nExecutors(spark) > 1
      && System.currentTimeMillis() < deadline) Thread.sleep(200)
    assert(nExecutors(spark) == 1, "executor did not die")
  }

  test("ReplicatedPersist survives killing an executor mid-operator") {
    assume(enabled, "set GRAFT_CLUSTER_SPEC=1 to run the local-cluster spec")
    withCluster { spark =>
      val sc = spark.sparkContext
      assert(Materialize.strategy(sc.master, hasCheckpointDir = false)
        == Materialize.ReplicatedPersist)
      val df = spark.range(0, 50000, 1, 8)
        .select(col("id"), (col("id") % 97).as("k"))
      val mat = Materialize.eager(df) // MEMORY_AND_DISK_2 + eager count
      assert(mat.count() == 50000)
      killOneExecutor(spark)
      // the killed executor's replica blocks are gone; the surviving
      // replica (or lineage recompute) must serve every consumer
      assert(mat.groupBy(col("k")).count().count() == 97)
      assert(mat.count() == 50000)
    }
  }

  test("ReliableCheckpoint survives killing an executor mid-operator") {
    assume(enabled, "set GRAFT_CLUSTER_SPEC=1 to run the local-cluster spec")
    withCluster { spark =>
      val sc = spark.sparkContext
      val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt")
      try {
        sc.setCheckpointDir(ckpt.toString)
        assert(Materialize.strategy(sc.master, hasCheckpointDir = true)
          == Materialize.ReliableCheckpoint)
        val df = spark.range(0, 50000, 1, 8)
          .select(col("id"), (col("id") % 89).as("k"))
        val mat = Materialize.eager(df) // blocks on the checkpoint FS
        assert(mat.count() == 50000)
        killOneExecutor(spark)
        // checkpointed data lives outside any executor — full result
        // from the survivor alone
        assert(mat.groupBy(col("k")).count().count() == 89)
      } finally
        org.apache.commons.io.FileUtils.deleteDirectory(ckpt.toFile)
    }
  }
}
