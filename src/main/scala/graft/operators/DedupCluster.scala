package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Duplicate-cluster resolution: near-dup PAIRS → connected components →
  * one canonical document per component. The missing last step of every
  * dedup pipeline (pairs alone don't say which docs to drop).
  *
  * Components via iterative min-label propagation — each iteration is a
  * self-contained shuffle-on-key round (scales to any pair count; the
  * iteration count is O(diameter) — a label moves one hop per round —
  * and dup clusters in practice have tiny diameters). Non-convergence
  * within maxIter throws rather than returning split clusters. No
  * driver-side union-find.
  */
object DedupCluster {

  /** (doc_a, doc_b) pairs → (doc_id, cluster_id) with cluster_id = min
    * doc id in the component. Docs not in any pair are omitted (they are
    * their own cluster trivially). */
  def components(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // undirected adjacency
    val adj = edges.select(col("doc_a").as("x"), col("doc_b").as("y"))
      .unionByName(edges.select(col("doc_b").as("x"), col("doc_a").as("y")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = adj.groupBy(col("x"))
      .agg(min(col("y")).as("m"))
      .select(col("x").as("doc_id"), least(col("x"), col("m")).as("cluster_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // propagate: my new label = min(my label, neighbors' labels)
      val next = adj
        .join(labels.withColumnRenamed("doc_id", "y")
          .withColumnRenamed("cluster_id", "y_label"), Seq("y"))
        .groupBy(col("x").as("doc_id"))
        .agg(min(col("y_label")).as("neighbor_min"))
        .join(labels, Seq("doc_id"))
        .select(col("doc_id"),
          least(col("cluster_id"), col("neighbor_min")).as("cluster_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = next.join(labels.withColumnRenamed("cluster_id", "old"),
          Seq("doc_id"))
        .filter(col("cluster_id") < col("old")).limit(1).count()
      labels.unpersist(blocking = false)
      labels = next
      converged = changed == 0
      iter += 1
    }
    if (!converged)
      // a component with diameter > maxIter would be returned SPLIT;
      // surface it instead of silently emitting wrong clusters
      throw new IllegalStateException(
        s"label propagation did not converge after $maxIter iterations; " +
          "raise maxIter (components with diameter > maxIter exist)")
    // hand the result off through an eager materialization (scope-
    // released at query exit) and free EVERYTHING the loop persisted —
    // returning the persisted `labels` itself leaked one cached RDD
    // per call with no owner to unpersist it (round-16 bench leak
    // assert caught it)
    val out = Materialize.eager(labels)
    adj.unpersist(blocking = false)
    edges.unpersist(blocking = false)
    labels.unpersist(blocking = false)
    out
  }

  /** Full dedup resolution: docs + near-dup pairs + a quality score →
    * each doc tagged with its cluster and whether it is the keeper
    * (highest quality, ties broken by lowest doc id). Singleton docs
    * keep themselves. */
  def resolve(docs: DataFrame, pairs: DataFrame, idCol: String,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val comp = components(pairs)
    val labeled = docs
      .join(comp.withColumnRenamed("doc_id", idCol), Seq(idCol), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col(idCol)))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    labeled
      .withColumn("keep", row_number().over(w) === 1)
      .select(col(idCol), col("cluster_id"), col(scoreCol), col("keep"))
  }
}
