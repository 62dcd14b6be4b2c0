package graft.operators
// (operators package for BpeMerger access; lives with the diag tools)

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._



/** Round-17 BPE induction split (guide §1: measure first): times the
  * two halves of each batched-induction round — the corpus-wide pair
  * COUNT (posexplode + hash agg + bounded head collect) and the
  * map-only kernel REWRITE + eager materialization — so an
  * optimization of the t64/t68/t70/t71 family (the suite's largest
  * isolated costs) targets the measured half. Re-implements the
  * bpeMergeRulesBatched loop with timers; the learned rule list is
  * asserted equal to the library's so the diag can't drift from the
  * real operator.
  *
  * Usage: DiagBpe [merges] [iters]
  */
object DiagBpe {
  def main(args: Array[String]): Unit = {
    val merges = args.headOption.filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(64)
    val iters = args.lift(1).filter(_.forall(_.isDigit))
      .map(_.toInt).getOrElse(2)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.queries.Util.t(spark, dir, "documents")

    /** Kernel count — the PRODUCTION kernel itself (round 18: a local
      * copy here had drifted to a 1<<21 flush bound vs the library's
      * 1<<20, so the diag timed a slightly different kernel; calling
      * TextAnalysis.adjacentPairHead directly makes drift impossible). */
    def kernelPairHead(cur: org.apache.spark.sql.DataFrame,
        k: Int): Array[org.apache.spark.sql.Row] =
      TextAnalysis.adjacentPairHead(cur, k)

    // `explain` mode: print the formatted plans of BOTH count shapes
    // over the raw corpus (the declared BPE queries run the induction
    // at construction time, so their final plans never contain this
    // subtree — plans/r17 captures it from here instead)
    if (args.contains("explain")) {
      val cur = docs.select(col("text"))
      val tk = split(col("text"), " ")
      val explodeShape = cur
        .select(posexplode(slice(tk, lit(1), greatest(size(tk) - 1, lit(0))))
          .as(Seq("i", "a")), tk.as("_tk"))
        .select(col("a"), element_at(col("_tk"), col("i") + 2).as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("a"), col("b")).limit(224)
      println("========== bpe_count_subtree (explode shape) ==========")
      println(explodeShape.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      import spark.implicits._
      val kernelShape = cur.select(col("text")).as[String].mapPartitions { it =>
        val m = new java.util.HashMap[String, Array[Long]]()
        it.foreach { text =>
          if (text != null) {
            val t = text.split(" ", -1)
            var i = 0
            while (i + 1 < t.length) {
              val key = t(i) + " " + t(i + 1)
              val v = m.get(key)
              if (v eq null) m.put(key, Array(1L)) else v(0) += 1L
              i += 1
            }
          }
        }
        val out = Iterator.newBuilder[(String, String, Long)]
        m.forEach { (k, v) =>
          val sp = k.indexOf(' ')
          out += ((k.substring(0, sp), k.substring(sp + 1), v(0)))
        }
        out.result()
      }.toDF("a", "b", "n")
        .groupBy(col("a"), col("b")).agg(sum(col("n")).as("n"))
        .orderBy(col("n").desc, col("a"), col("b")).limit(224)
      println("========== bpe_count_subtree (kernel shape) ==========")
      println(kernelShape.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      spark.stop()
      return
    }

    (1 to iters).foreach { it =>
      println(s"[diag] ==== bpe batched merges=$merges iter $it ====")
      val t0 = System.nanoTime()
      Materialize.scoped {
      var cur = docs.select(col("text"))
      var got = 0
      var round = 0
      var tCount = 0.0; var tRewrite = 0.0
      val learned = Seq.newBuilder[(String, String)]
      while (got < merges) {
        round += 1
        val remaining = merges - got
        val tk = split(col("text"), " ")
        val c0 = System.nanoTime()
        val head = cur
          .select(posexplode(slice(tk, lit(1), greatest(size(tk) - 1, lit(0))))
            .as(Seq("i", "a")), tk.as("_tk"))
          .select(col("a"), element_at(col("_tk"), col("i") + 2).as("b"))
          .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("a"), col("b"))
          .limit(remaining * 3 + 32).collect()
        val cSec = (System.nanoTime() - c0) / 1e9
        tCount += cSec
        val k0 = System.nanoTime()
        val headK = kernelPairHead(cur, remaining * 3 + 32)
        val kSec = (System.nanoTime() - k0) / 1e9
        require(headK.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
          .sameElements(head.map(r => (r.getString(0), r.getString(1), r.getLong(2)))),
          s"kernel head diverges at round $round")
        println(f"[diag]   round $round%2d kernel-count $kSec%6.3f s (parity OK)")
        val used = scala.collection.mutable.HashSet.empty[String]
        val batch = Seq.newBuilder[(String, String)]
        var picked = 0
        head.iterator.takeWhile(_ => picked < remaining).foreach { r =>
          val a = r.getString(0); val b = r.getString(1)
          if (!used(a) && !used(b)) {
            used += a; used += b; batch += ((a, b)); picked += 1
          }
        }
        val rules = batch.result()
        learned ++= rules
        got += rules.size
        var rSec = 0.0
        if (got < merges) {
          val r0 = System.nanoTime()
          val bc = spark.sparkContext.broadcast(
            new BpeMerger(rules.toArray))
          val applyBatch = udf((text: String) => bc.value(text))
          cur = Materialize.eager(cur.select(applyBatch(col("text")).as("text")))
          rSec = (System.nanoTime() - r0) / 1e9
          tRewrite += rSec
        }
        println(f"[diag]   round $round%2d picked $picked%3d  count $cSec%6.3f s  rewrite $rSec%6.3f s")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[diag] ==== total $wall%6.3f s  (count $tCount%6.3f  rewrite $tRewrite%6.3f  rounds $round) ====")
      // drift guard: same rules as the library operator
      if (it == 1) {
        val lib = TextAnalysis.bpeMergeRulesBatched(docs, "text", merges)
          .orderBy(col("iter")).collect()
          .map(r => (r.getString(2), r.getString(3))).toSeq
        require(lib == learned.result(),
          "diag loop diverged from bpeMergeRulesBatched")
        println("[diag] rule-list parity with bpeMergeRulesBatched: OK")
      }
      }
    }
    spark.stop()
  }
}
