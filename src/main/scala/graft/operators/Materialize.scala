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
    * multi-consumer materialization point.
    *
    * Lifecycle: each call registers a release thunk with the innermost
    * [[scoped]] block on the CALLING thread (if any), so the blocks die
    * when their query finishes instead of waiting on the ContextCleaner
    * to notice the RDD reference is gone. Unscoped callers keep today's
    * GC-driven lifetime — the ContextCleaner eventually reclaims the
    * blocks, but in a long-running tip-follow pipeline (or a 336-query
    * bench suite) "eventually" means accumulated heap pressure taxing
    * every later stage: the round-13/14 bench drift forensics measured
    * exactly that mechanism. */
  def eager(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    strategy(sc.master, sc.getCheckpointDir.isDefined) match {
      case LocalCheckpoint =>
        val out = df.localCheckpoint(true)
        // the checkpointed RDD is the LogicalRDD's payload — unpersist
        // THAT id, never a getPersistentRDDs diff (concurrent lanes
        // checkpoint interleaved; a diff would release a neighbor's
        // blocks mid-query and fail it, lineage being truncated)
        out.queryExecution.analyzed match {
          case lr: org.apache.spark.sql.execution.LogicalRDD =>
            register(() => { lr.rdd.unpersist(blocking = false); () })
          case _ => () // plan shape changed upstream: fall back to GC
        }
        out
      case ReliableCheckpoint =>
        // checkpoint FILES outlive any scope by contract (they are the
        // recovery story); nothing to release here
        df.checkpoint(true)
      case ReplicatedPersist =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK_2)
        p.count() // force materialization now, like the checkpoint paths
        // Dataset-level unpersist keeps the CacheManager catalog
        // consistent (a bare RDD unpersist would leave a stale
        // InMemoryRelation entry behind)
        register(() => { p.unpersist(blocking = false); () })
        p
    }
  }

  // ---- scoped release ------------------------------------------------
  // One buffer of release thunks per active scope, thread-local: every
  // operator materializes on the thread that runs the query (no
  // foreachBatch / executor-side eager calls exist in this codebase),
  // while the cross-query shared caches (TextOps.pairsCache et al) are
  // built on their own CompletableFuture threads and therefore NEVER
  // land in a query's scope — exactly the split we want. A plain (non-
  // inheritable) ThreadLocal is deliberate: an inheritable one would
  // leak a live scope into pooled worker threads, and a query on thread
  // B could then register into thread A's scope and lose its blocks
  // when A's query exits.
  private val currentScope =
    new ThreadLocal[scala.collection.mutable.ArrayBuffer[() => Unit]]

  private def register(release: () => Unit): Unit = {
    val buf = currentScope.get()
    if (buf != null) buf.synchronized { buf += release }
  }

  /** Run `body` in a release scope: every [[eager]] materialization it
    * performs (on this thread) is freed when the block exits, success
    * or failure. Nests — an inner scope releases only its own
    * checkpoints. Wrap a whole query (build + consume): the released
    * blocks have truncated lineage, so a DataFrame that escapes the
    * scope and is executed later would recompute from nothing and
    * fail. Bench/Verify wrap each query's build+write in one scope. */
  def scoped[T](body: => T): T = {
    val prev = currentScope.get()
    val buf = scala.collection.mutable.ArrayBuffer.empty[() => Unit]
    currentScope.set(buf)
    try body
    finally {
      currentScope.set(prev)
      buf.foreach { f =>
        try f() catch { case scala.util.control.NonFatal(_) => () }
      }
    }
  }
}
