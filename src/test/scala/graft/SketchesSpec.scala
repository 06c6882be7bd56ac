package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** Count-min sketch: cell construction, estimate guarantees, the
  * additive-merge property that makes it streamable, and agreement with
  * a plain-Scala re-derivation of the salted-md5 hash family. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  private def hex8(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
  }
  private def bucket(r: Int, item: Long, width: Int): Long =
    hex8(s"$r:$item") % width

  // skewed traffic: item 7 dominates, then 3, then a tail
  private val traffic: Seq[Long] =
    Seq.fill(30)(7L) ++ Seq.fill(12)(3L) ++ (100L to 119L)

  test("heavyHittersAudit matches a Scala re-derivation of the sketch") {
    val depth = 4; val width = 8 // tiny width forces collisions
    val cells = traffic.flatMap(i => (0 until depth).map(r =>
      (r, bucket(r, i, width)))).groupBy(identity).view.mapValues(_.size)
    val exact = traffic.groupBy(identity).view.mapValues(_.size)
    def est(i: Long): Long = (0 until depth)
      .map(r => cells((r, bucket(r, i, width)))).min.toLong
    val want = exact.toSeq
      .map { case (i, n) => (i, n.toLong, est(i), est(i) - n) }
      .sortBy { case (i, n, _, _) => (-n, i) }.take(5).toSet
    val got = Sketches.heavyHittersAudit(
      traffic.toDF("user_id"), col("user_id"), k = 5,
      depth = depth, width = width)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == want, s"got $got want $want")
    // CMS invariant: estimate never undercounts
    assert(got.forall { case (_, n, e, _) => e >= n })
    // the dominant items must surface
    assert(got.map(_._1).intersect(Set(7L, 3L)) == Set(7L, 3L))
  }

  test("cells merge by addition: sketch(A ++ B) == sketch(A) + sketch(B)") {
    // the property that makes the sketch a mergeable aggregation state —
    // per-partition partial sketches combine to the global one
    val (a, b) = traffic.splitAt(25)
    def cellMap(xs: Seq[Long]) = Sketches
      .countMinCells(xs.toDF("user_id"), col("user_id"), width = 8)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = (cellMap(a).keySet ++ cellMap(b).keySet).map(k =>
      k -> (cellMap(a).getOrElse(k, 0L) + cellMap(b).getOrElse(k, 0L))).toMap
    assert(cellMap(traffic) == merged)
  }

  test("late-r8 operators tolerate empty inputs (schema kept, no crash)") {
    import org.apache.spark.sql.functions.col
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    val noSrcDocs = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    val noEvents = Seq.empty[(Long, java.sql.Timestamp, String)]
      .toDF("user_id", "ts", "event_type")
    val noEmbs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    val noPairs = Seq.empty[(Long, Long, Double)]
      .toDF("doc_a", "doc_b", "jaccard")
    assert(Sketches.heavyHittersAudit(noEvents, col("user_id")).count() == 0)
    assert(graft.ops.Retention.cohortMatrix(noEvents).count() == 0)
    assert(graft.text.Dedup.bloomDedupAudit(noDocs,
      col("doc_id") % 10 === 0).count() == 0)
    assert(graft.text.Dedup.crossSourceLeakage(noPairs, noSrcDocs).count() == 0)
    assert(graft.similarity.Similarity.randomProjection(noEmbs).count() == 0)
    assert(graft.similarity.Similarity.rpDistortionAudit(noEmbs).count() == 0)
    assert(graft.text.TextAnalysis.dsirWeights(noDocs,
      noDocs.select(col("doc_id"))).count() == 0)
    // aggregation-rooted reports emit their report rows even on empty
    // input — one per stage/column, zero counts — not zero rows
    val funnel = graft.ops.Funnel.stages(noEvents, Seq("view", "click"))
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSet
    assert(funnel == Set((1, 0L), (2, 0L)))
    val prof = graft.ops.Profile.columns(noEvents, Seq("user_id"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(3))).toSet
    assert(prof == Set(("user_id", 0L, 0L)))
    // groupBy-rooted reports yield zero rows on empty input
    val noIdEvents = Seq.empty[(Long, java.sql.Timestamp, Long, String)]
      .toDF("user_id", "ts", "event_id", "event_type")
    assert(graft.ops.Transitions.matrix(noIdEvents).count() == 0)
    assert(graft.ops.Profile.quantiles(noEvents, "user_id", "event_type")
      .count() == 0)
    assert(graft.text.Dedup.ngramNovelty(
      graft.text.Dedup.shingleArrays(noDocs, n = 3)).count() == 0)
  }

  test("grouped top-k: deterministic k rows per group under ties") {
    val df = Seq((1L, "a", 10L), (2L, "a", 10L), (3L, "a", 5L), (4L, "a", 20L),
      (5L, "b", 1L)).toDF("doc_id", "source", "n_chars")
    val out = graft.ops.TopK.perGroup(df, "source",
      Seq(col("n_chars").desc, col("doc_id").asc), k = 2)
      .collect()
      .map(r => (r.getAs[String]("source"), r.getAs[Int]("rank"),
        r.getAs[Long]("doc_id"))).toSet
    // the 10-char tie resolves to the smaller doc_id (1, not 2)
    assert(out == Set(("a", 1, 4L), ("a", 2, 1L), ("b", 1, 5L)))
  }

  test("quantile profile: exact linear-interpolated percentiles per group") {
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"), (10L, "b"))
      .toDF("v", "g")
    val out = graft.ops.Profile.quantiles(df, "v", "g", Seq(0.25, 0.5))
      .collect()
      .map(r => (r.getAs[String]("g"), r.getAs[Long]("n_rows"),
        r.getAs[Double]("mean"), r.getAs[Double]("p25"),
        r.getAs[Double]("p50")))
      .sortBy(_._1)
    // [1,2,3,4]: p25 = 1 + 0.25*3 = 1.75, p50 = 2.5 (interpolated)
    assert(out.toSeq == Seq(("a", 4L, 2.5, 1.75, 2.5), ("b", 1L, 10.0, 10.0, 10.0)))
  }

  test("quantile profile approx switch: same report shape, values within " +
    "the sketch's rank-error tolerance of exact") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val exact = graft.ops.Profile.quantiles(docs, "n_chars", "source")
    val approx = graft.ops.Profile.quantiles(docs, "n_chars", "source",
      exact = false)
    assert(exact.columns.toSeq == approx.columns.toSeq)
    val e = exact.collect().map(r => r.getAs[String]("source") -> r).toMap
    val a = approx.collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(e.keySet == a.keySet && e.nonEmpty)
    // percentile_approx is NEAREST-RANK (returns an actual sample) while
    // the exact form interpolates, so value distance is unbounded on
    // sparse data — the sketch's contract is about RANK: the returned
    // sample's rank must be within the GK error (<= n/accuracy, i.e.
    // rounding slack at this scale) of p·n. Verify against the true
    // sorted values per group.
    val byGroup = docs.select("source", "n_chars").collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getAs[Long]("n_chars")).sorted.toIndexedSeq)
      .toMap
    for (g <- e.keySet; (c, p) <- Seq("p10" -> 0.1, "p25" -> 0.25,
      "p50" -> 0.5, "p75" -> 0.75, "p90" -> 0.9, "p99" -> 0.99)) {
      val av = a(g).getAs[Double](c)
      val vs = byGroup(g)
      val n = vs.size
      // rank interval occupied by the returned value in the true order
      val lo = vs.count(_ < av)
      val hi = vs.count(_ <= av)
      assert(hi > lo, s"group $g $c: approx $av is not a sample value")
      val target = p * n
      val slack = 1.0 + n.toDouble / 10000
      assert(target >= lo - slack && target <= hi + slack,
        s"group $g $c: approx $av occupies ranks ($lo, $hi] of $n, " +
          s"target ${target}")
    }
    // n_rows and mean are exact in both forms
    for (g <- e.keySet) {
      assert(e(g).getAs[Long]("n_rows") == a(g).getAs[Long]("n_rows"))
      assert(e(g).getAs[Double]("mean") == a(g).getAs[Double]("mean"))
    }
  }

  test("estimate lookup broadcasts the cell table") {
    val plan = Sketches.heavyHittersAudit(
      traffic.toDF("user_id"), col("user_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"cell lookup must broadcast:\n$plan")
  }
}
