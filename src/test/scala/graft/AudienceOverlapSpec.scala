package graft

import graft.ops.AudienceOverlap

/** Pairwise segment overlap: distinct-first counting, ordered pairs,
  * Jaccard arithmetic, absent empty intersections. */
class AudienceOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def overlap(rows: Seq[(String, Long)]) =
    AudienceOverlap.jaccard(rows.toDF("seg", "member"), "seg", "member")
      .collect()
      .map(r => (r.getAs[String]("seg_a"), r.getAs[String]("seg_b"),
        r.getAs[Long]("size_a"), r.getAs[Long]("size_b"),
        r.getAs[Long]("n_common"), r.getAs[Double]("jaccard")))
      .sortBy(t => (t._1, t._2)).toSeq

  test("shared members counted once each; Jaccard = inter / union") {
    // a = {1,2,3}, b = {2,3,4,5} → inter 2, union 5
    val got = overlap(Seq("a" -> 1L, "a" -> 2L, "a" -> 3L,
      "b" -> 2L, "b" -> 3L, "b" -> 4L, "b" -> 5L))
    assert(got == Seq(("a", "b", 3L, 4L, 2L, 0.4)))
  }

  test("duplicate incidence rows don't inflate counts") {
    val got = overlap(Seq("a" -> 1L, "a" -> 1L, "a" -> 1L, "b" -> 1L, "b" -> 1L))
    assert(got == Seq(("a", "b", 1L, 1L, 1L, 1.0)))
  }

  test("pairs are unordered and emitted once (seg_a < seg_b)") {
    val got = overlap(Seq("b" -> 1L, "a" -> 1L, "c" -> 1L))
    assert(got.map(t => (t._1, t._2)) == Seq(("a", "b"), ("a", "c"), ("b", "c")))
    assert(got.forall(_._6 == 1.0))
  }

  test("disjoint segments emit no row") {
    assert(overlap(Seq("a" -> 1L, "b" -> 2L)) == Seq.empty)
  }

  test("three-way member contributes one row to each of its C(3,2) pairs") {
    val got = overlap(Seq("a" -> 7L, "b" -> 7L, "c" -> 7L, "a" -> 8L))
    // a={7,8} b={7} c={7}: ab inter 1 union 2; ac same; bc inter 1 union 1
    assert(got == Seq(("a", "b", 2L, 1L, 1L, 0.5),
      ("a", "c", 2L, 1L, 1L, 0.5), ("b", "c", 1L, 1L, 1L, 1.0)))
  }
}
