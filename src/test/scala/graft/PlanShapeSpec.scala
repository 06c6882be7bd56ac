package graft

import graft.queries.DataPipelineQueries
import org.apache.spark.sql.DataFrame

/**
 * Physical-plan regression guard: the queries whose joins must stay
 * equi-keyed (SMJ/ShuffledHash/BroadcastHash) may never silently degrade
 * to a cartesian-class join — e.g. by a condition reordering that drops
 * the equi conjunct, or a bucket key becoming non-deterministic. The two
 * INTENTIONAL BroadcastNestedLoopJoins (brute-force top-k's broadcast
 * query set, IVF's broadcast centroid probe) are excluded by design —
 * see graft.Explain's scaladoc.
 */
class PlanShapeSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def finalPlan(df: DataFrame): String = {
    // collect() executes df's OWN QueryExecution (count() would build and
    // run a different one), finalizing the AdaptiveSparkPlanExec in place
    // so the string below is AQE's FINAL plan, not the initial guess
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  // every node of AQE's FINAL plan (same caveats as finalPlan): query
  // stages are leaves wrapping their real plan, so recurse by hand;
  // cache-build plans (InMemoryTableScan) stay excluded
  private def finalPlanNodes(df: DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val through = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: through.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan)
  }

  /** Window-family nodes with an EMPTY partition spec — every distinct
    * key moves to ONE task (Spark's own "No Partition Defined" warning),
    * the single-task-sort cliff the r19 verdict caught in the AUC eval. */
  private def globalWindowNodes(
      nodes: Seq[org.apache.spark.sql.execution.SparkPlan]): Seq[String] =
    nodes.collect {
      case w: org.apache.spark.sql.execution.window.WindowExecBase
          if w.partitionSpec.isEmpty => w.nodeName
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
          if w.partitionSpec.isEmpty => w.nodeName
    }

  /** GLOBAL SortExec nodes — a total ordering of the whole frame (range
    * exchange + full sort), the same 100×-scale smell as a global
    * window: top-k must plan TakeOrderedAndProject, rankings must
    * partition. (Window-feeding sorts are local, global=false.) */
  private def globalSortNodes(
      nodes: Seq[org.apache.spark.sql.execution.SparkPlan]): Seq[String] =
    nodes.collect {
      case s: org.apache.spark.sql.execution.SortExec if s.global =>
        s.nodeName
    }

  private def assertNoCartesian(name: String, plan: String): Unit = {
    assert(!plan.contains("CartesianProduct"),
      s"$name plan contains a CartesianProduct:\n$plan")
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"$name plan contains a BroadcastNestedLoopJoin:\n$plan")
  }

  /** The queries whose broadcast nested-loop join is the DESIGN:
    * brute-force top-k broadcasts the query set against everything, and
    * the k-NN label audit votes over exactly that neighbor frame.
    * similarity_ivf left the whitelist in r7: its deterministic centroids
    * are plan literals, so assignment is map-side and the probe join is a
    * broadcast EQUI join on the cell key.
    * dsir_weights attaches its two SINGLE-ROW corpus totals (T, R) to the
    * bucket-grain model via cross joins — a broadcast of one row over
    * ≤ nBuckets rows, O(model) work, kept relational so the build needs
    * no driver action. rp_distortion pairs the nSample (8) projected
    * vectors under `vec_a < vec_b` — an inequality self-join over a
    * constant-size sample, never the corpus. hybrid_rrf nests the
    * brute-force list as its vector side, inheriting exactly that
    * broadcast-8-queries BNLJ; its own fusion joins are equi.
    * similarity_pq_batchq is the LUT-TABLE ADC form: its entire design is
    * a broadcast cross join of the small standing-query LUT frame against
    * the codes scan (so the plan stays codebook-bounded however many
    * queries stand) — the dedicated test below asserts the broadcast.
    * ann_recall_audit (r11) nests the brute-force list as its exact side
    * — the same inherited broadcast-8-queries BNLJ as hybrid_rrf; the
    * audit's own recall joins are equi on (query_id, neighbor_id). */
  private val intentionalBnlj =
    Set("similarity_topk", "knn_label_audit", "dsir_weights",
      "rp_distortion", "hybrid_rrf", "similarity_pq_batchq",
      "ann_recall_audit",
      // r14: the AUC receipt attaches its SINGLE-ROW class-mean frame to
      // the single-row rank aggregate via a cross join (the dsir_weights
      // totals pattern — one row broadcast over one row); r15: the LR
      // model's receipt is the same classifierEval plan over different
      // weights
      "quality_classifier_eval", "quality_classifier_lr_eval",
      // r19: dsir_select consumes the dsirWeights frame and inherits its
      // single-row totals cross joins (one row broadcast over one row);
      // the admission itself adds only equi joins + windows
      "dsir_select")

  test("EVERY registered query stays cartesian-free (whitelist: brute-force) " +
    "and global-window-free (NO whitelist)") {
    // one sweep, two audits, so new queries are checked automatically:
    // (a) a forgotten equi conjunct or non-deterministic bucket key
    //     degrades to a cartesian-class join silently (whitelist: the
    //     intentional broadcast forms above);
    // (b) a Window node with an empty partition spec serializes every
    //     distinct key into ONE task — correct at every tested scale,
    //     wrong shape for 100× (the r19 AUC-eval finding: the global
    //     running-count window shipped in r14 and scrolled "No Partition
    //     Defined" warnings past every Verify run since). NO whitelist:
    //     a legitimately-global prefix sum must use the two-pass
    //     partition-rollup discipline (packShards / classifierEval).
    for ((name, fn) <- SparkEntry.queries) {
      val df = fn(spark, sf)
      val nodes = finalPlanNodes(df)
      if (!intentionalBnlj(name))
        assertNoCartesian(name, df.queryExecution.executedPlan.toString)
      val gw = globalWindowNodes(nodes)
      assert(gw.isEmpty,
        s"$name plans ${gw.size} partition-less window node(s) (${gw.mkString(", ")}):\n" +
          df.queryExecution.executedPlan.toString)
      // (c) a GLOBAL SortExec totally orders the frame through one
      //     range exchange — same cliff class; top-k shapes must plan
      //     TakeOrderedAndProject instead. NO whitelist (r20: the sweep
      //     found the registry already clean — this pins it).
      val gs = globalSortNodes(nodes)
      assert(gs.isEmpty,
        s"$name plans ${gs.size} global sort node(s):\n" +
          df.queryExecution.executedPlan.toString)
    }
  }

  test("the global-sort detector fires on a planted orderBy") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = (1 to 100).toDF("x").orderBy(col("x"))
    assert(globalSortNodes(finalPlanNodes(df)).nonEmpty,
      "planted global sort not detected — sweep is blind")
  }

  test("the global-window detector fires on a planted partition-less window") {
    // negative control for the sweep above: a deliberate
    // Window.orderBy-with-no-partitionBy must be detected, else the
    // sweep is vacuous
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, sum}
    val df = (1 to 100).toDF("x").withColumn("r",
      sum(col("x")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("x"))))
    assert(globalWindowNodes(finalPlanNodes(df)).nonEmpty,
      "planted global window not detected — sweep is blind")
  }

  test("similarity_pq plans join-free: ADC scoring is a map-side projection") {
    // the LUTs are plan literals and the codes carry everything needed —
    // any Join node means the scan stopped being the O(corpus·m) lookup
    // pass that justifies PQ at scale (the only shuffle is the top-k
    // window's, the same shape as brute-force)
    val plan = finalPlan(DataPipelineQueries.similarityPq(spark, sf))
    assert(!plan.contains("Join"), s"ADC scan acquired a join:\n$plan")
  }

  test("similarity_pq_batchq: the LUT table joins as a BROADCAST — the " +
    "codes scan is never shuffled for scoring") {
    // the LUT-table ADC form must keep the literal form's scale shape:
    // the corpus-side codes stream map-side through a broadcast of the
    // standing-query LUT frame; a shuffle-side join here would repartition
    // the whole codes table per query batch
    val plan = finalPlan(DataPipelineQueries.similarityPqBatchq(spark, sf))
    assert(plan.contains("BroadcastNestedLoopJoin BuildRight, Cross"),
      s"LUT join lost its broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"batchq scoring acquired a shuffle join:\n$plan")
  }

  test("bm25 broadcasts the query-term table; corpus never token-shuffled") {
    // candidate generation must be a broadcast hash join of the tiny
    // (query, term, idf) table into the token-frame scan — a sort-merge
    // join keyed on `token` would sort the corpus by token and
    // concentrate stopword posting lists. (The dfreq aggregation's own
    // token-keyed exchange is fine: map-side partials absorb hot tokens
    // before it, the vocab-table build every consumer shares.)
    val plan = finalPlan(DataPipelineQueries.bm25TopkQ(spark, sf))
    assert(plan.contains("BroadcastHashJoin [token"),
      s"query-term join lost its broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin [token"),
      s"corpus sort-merge-joined by token:\n$plan")
  }

  test("decontaminate_semantic broadcasts the eval side, never shuffles it") {
    val plan = finalPlan(DataPipelineQueries.decontaminateSemantic(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"eval bucket/vector join lost its broadcast:\n$plan")
  }

  test("vocab top-k plans as TakeOrdered, never a global sort") {
    val plan = finalPlan(DataPipelineQueries.vocabTopKQ(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k lost its TakeOrdered plan:\n$plan")
    // a Sort node would mean the full vocabulary is globally sorted just
    // to keep k rows — the exact shape the operator exists to avoid
    assert(!plan.contains("Sort ["), s"unexpected global sort:\n$plan")
  }

  test("span_boilerplate plans as TakeOrdered, never a global sort") {
    val plan = finalPlan(DataPipelineQueries.spanBoilerplate(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k lost its TakeOrdered plan:\n$plan")
    assert(!plan.contains("Sort ["), s"unexpected global sort:\n$plan")
  }

  // walk AQE's FINAL plan tree (the toString would double-count: it
  // appends the initial plan as text). Query stages are LEAF nodes
  // wrapping their real plan, so the walk must recurse through
  // QueryStageExec.plan by hand; cache-build plans (InMemoryTableScan)
  // stay excluded — only the query's own shuffles are counted.
  private def hashShuffleCount(df: DataFrame): Int = {
    import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    df.collect()
    def walk(p: SparkPlan): Seq[SparkPlan] = {
      val through = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: through.flatMap(walk)
    }
    walk(df.queryExecution.executedPlan).count {
      case e: ShuffleExchangeLike => e.outputPartitioning.isInstanceOf[HashPartitioning]
      case _ => false
    }
  }

  test("z-score and seasonal detectors plan exactly one hash shuffle each") {
    import spark.implicits._
    val series = (1 to 50).map(i =>
      (new java.sql.Timestamp(i * 3600000L), s"c${i % 3}", (i % 7).toDouble))
      .toDF("window_end", "campaign_id", "v")
    // rolling: one exchange on campaign_id feeds the ordered frame
    assert(hashShuffleCount(
      graft.ops.AnomalyDetect.zscoreAlerts(series, valueCol = "v")) == 1)
    // seasonal: one exchange on (campaign_id, hour-of-day), no sort frame
    assert(hashShuffleCount(
      graft.ops.AnomalyDetect.seasonalAlerts(series, valueCol = "v")) == 1)
  }

  test("audience overlap attaches segment sizes by broadcast, joins members equi") {
    val plan = finalPlan(graft.queries.EventQueries.audienceOverlapQ(spark, sf))
    assert(plan.contains("BroadcastHashJoin"),
      s"segment-size attach lost its broadcast:\n$plan")
  }

  test("label centroids shuffle once on the (label, dim) key") {
    val n = hashShuffleCount(DataPipelineQueries.embeddingCentroids(spark, sf))
    assert(n == 1,
      s"expected exactly 1 hash shuffle (the (label, dim) agg), got $n")
  }

  test("grouped top-k pushes the rank filter into a map-side WindowGroupLimit") {
    // the window+filter shape is only scale-right because Catalyst
    // rewrites it: each input partition keeps <= k rows per group BEFORE
    // the exchange. If the rewrite breaks (Spark upgrade, ordering expr
    // change), the plan degrades to a full per-group sort silently.
    val plan = finalPlan(DataPipelineQueries.topDocsPerSource(spark, sf))
    assert(plan.contains("WindowGroupLimit"),
      s"rank<=k filter lost its WindowGroupLimit pushdown:\n$plan")
  }

  test("quantile profile shuffles once on the group key") {
    // count + mean + every percentile are one aggregation over the same
    // grouping — a second exchange would mean the percentiles stopped
    // sharing the count/mean pass
    val n = hashShuffleCount(DataPipelineQueries.docLengthQuantiles(spark, sf))
    assert(n == 1,
      s"expected exactly 1 hash shuffle (the source-key agg), got $n")
  }

  test("cluster-balanced sample shuffles once on the cell key") {
    // assignment is map-side over plan-literal centroids; the rank and
    // occupancy windows share the single cell-key exchange
    val n = hashShuffleCount(
      graft.similarity.Similarity.clusterBalancedSample(
        spark.read.parquet(s"$sf/embeddings.parquet"), nCells = 16, perCell = 10))
    assert(n == 1,
      s"expected exactly 1 hash shuffle (the shared cell windows), got $n")
  }

  test("stateless semantic decontamination plans join- and shuffle-free") {
    import org.apache.spark.sql.functions.col
    val embs = spark.read.parquet(s"$sf/embeddings.parquet")
    val isEval = col("vec_id") % 11 === 0
    val df = graft.similarity.Similarity.semanticDecontaminateStateless(
      embs.filter(!isEval), embs.filter(isEval), threshold = 0.25)
    val n = hashShuffleCount(df)
    val plan = df.queryExecution.executedPlan.toString
    assert(n == 0, s"stateless decontamination acquired a shuffle ($n):\n$plan")
    assert(!plan.contains("Join"),
      s"stateless decontamination acquired a join:\n$plan")
  }
}
