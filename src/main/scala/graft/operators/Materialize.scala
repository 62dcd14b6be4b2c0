package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Cluster-safe eager materialization with lineage truncation.
  *
  * Several operators materialize a narrow intermediate once because two
  * or more consumers read it (minHashLshPairs candidates, t57 bigram
  * instances, t59 token/quality base, bpeMergeRules round state).
  * `localCheckpoint` is the cheapest way to do that on local[n], but it
  * stores NON-REPLICATED executor-local blocks with truncated lineage:
  * on a real cluster, losing one executor mid-operator loses blocks
  * that can no longer be recomputed and fails the job. This helper
  * picks the materialization strategy by master:
  *
  *  - local[n] (single JVM — an "executor loss" is a driver loss
  *    anyway): `localCheckpoint`, the fast path, unchanged semantics.
  *  - cluster master WITH a checkpoint dir configured: reliable
  *    `checkpoint` — blocks live on the checkpoint filesystem (HDFS/
  *    object store), surviving any executor loss.
  *  - cluster master WITHOUT a checkpoint dir: replicated persist
  *    (MEMORY_AND_DISK_2) + eager count. Lineage is kept, so even a
  *    double loss recomputes instead of failing; one replica loss
  *    doesn't even trigger recompute.
  *
  * The strategy decision is a pure function of (master, checkpoint dir)
  * so the switch itself is unit-testable without spinning up a cluster.
  */
object Materialize {
  sealed trait Strategy
  case object LocalCheckpoint extends Strategy
  case object ReliableCheckpoint extends Strategy
  case object ReplicatedPersist extends Strategy

  /** Pure strategy choice — see object doc for the rationale.
    * `local-cluster[...]` is NOT local: it runs real multi-process
    * executors (the test harness for executor loss), so it takes the
    * cluster paths — `startsWith("local")` alone would hand it
    * non-replicated local blocks, the exact failure mode this object
    * exists to avoid. */
  def strategy(master: String, hasCheckpointDir: Boolean): Strategy =
    if (master.startsWith("local") && !master.startsWith("local-cluster"))
      LocalCheckpoint
    else if (hasCheckpointDir) ReliableCheckpoint
    else ReplicatedPersist

  /** Eagerly materialize `df` once, truncating lineage where safe.
    * Drop-in replacement for `df.localCheckpoint(true)` at every
    * multi-consumer materialization point. */
  def eager(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    strategy(sc.master, sc.getCheckpointDir.isDefined) match {
      case LocalCheckpoint    => df.localCheckpoint(true)
      case ReliableCheckpoint => df.checkpoint(true)
      case ReplicatedPersist  =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK_2)
        p.count() // force materialization now, like the checkpoint paths
        p
    }
  }
}
