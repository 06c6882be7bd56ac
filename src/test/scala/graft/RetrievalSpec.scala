package graft

import graft.text.Retrieval
import org.apache.spark.sql.DataFrame

class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  /** Spark round()'s HALF_UP, then the shared /1e6 — the engine's exact
    * micro-unit arithmetic, so expectations are formula-derived, not
    * magic decimals. */
  private def micro(x: Double): Double =
    BigDecimal(x * 1e6).setScale(0, BigDecimal.RoundingMode.HALF_UP)
      .toLong / 1e6

  // the four-doc corpus used by the bm25 tests:
  //   doc 0 (query): "apple banana"; doc 1 has apple x2, doc 2 banana x1,
  //   doc 3 shares no query term. N=4, lens 2/3/2/2, avglen 2.25,
  //   df(apple)=2 df(banana)=2 df(cherry)=3.
  private def corpus: DataFrame = docsDF(
    0L -> "apple banana",
    1L -> "apple apple cherry",
    2L -> "banana cherry",
    3L -> "cherry cherry")

  private def bm25Kernel(idf: Double, tf: Long, len: Long,
                         avg: Double): Double =
    micro(idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len / avg)))

  test("bm25: hand-computed scores; self and no-term docs excluded") {
    val idf = math.log(1.0 + (4.0 - 2 + 0.5) / (2 + 0.5)) // ln 2, df=2
    val out = Retrieval.bm25MoreLikeThis(corpus, nQueries = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getInt(3))).sortBy(_._4)
    assert(out === Seq(
      (0L, 1L, bm25Kernel(idf, 2L, 3L, 2.25), 1),
      (0L, 2L, bm25Kernel(idf, 1L, 2L, 2.25), 2)))
  }

  test("bm25: nTerms cutoff keeps top TF-IDF terms, ties lexicographic") {
    // both query tokens tie on tfidf (tf=1, df=2) -> 'apple' wins the
    // nTerms=1 cut; doc 2 (banana only) must then be unscored
    val out = Retrieval.bm25MoreLikeThis(corpus, nQueries = 1, nTerms = 1)
      .collect().map(r => r.getLong(1)).toSet
    assert(out === Set(1L))
  }

  test("bm25: k truncates per query; identical under repartition") {
    val a = Retrieval.bm25MoreLikeThis(corpus, nQueries = 1, k = 1)
    assert(a.collect().map(r => (r.getLong(1), r.getInt(3))).toSeq
      === Seq((1L, 1)))
    val b = Retrieval.bm25MoreLikeThis(corpus.repartition(7), nQueries = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sortBy(_._4)
    val c = Retrieval.bm25MoreLikeThis(corpus, nQueries = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getInt(3))).sortBy(_._4)
    assert(b === c)
  }

  test("bm25: empty corpus yields empty frame with the contract schema") {
    val out = Retrieval.bm25MoreLikeThis(docsDF())
    assert(out.columns.toSeq ===
      Seq("query_id", "neighbor_id", "bm25", "rank"))
    assert(out.count() === 0L)
  }

  test("bm25 stateless scorer matches the aggregated batch scores exactly") {
    // the ingest-time router's per-row fold must reproduce the batch
    // operator's micro-unit arithmetic bit-for-bit on the real corpus
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val model = Retrieval.bm25Model(docs)
    assert(model.terms.nonEmpty && model.avgLen > 0.0)
    val want = Retrieval.bm25MoreLikeThis(docs, k = Int.MaxValue)
      .select("query_id", "neighbor_id", "bm25")
      .collect().map(_.toSeq).toSet
    val got = Retrieval.bm25ScoreStateless(docs, model)
      .collect().map(_.toSeq).toSet
    assert(want.nonEmpty)
    assert(got === want,
      s"only-stateless=${(got -- want).take(3)} only-batch=${(want -- got).take(3)}")
  }

  test("bm25 stateless scorer: empty model yields an empty typed frame") {
    val out = Retrieval.bm25ScoreStateless(corpus,
      Retrieval.Bm25Model(0.0, Seq.empty))
    assert(out.columns.toSeq === Seq("query_id", "neighbor_id", "bm25"))
    assert(out.count() === 0L)
  }

  test("rrf: both-list docs outrank single-list docs; exact micro terms") {
    val listA = Seq((0L, 1L, 1), (0L, 2L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val listB = Seq((0L, 2L, 1), (0L, 3L, 2))
      .toDF("query_id", "neighbor_id", "rank")
    val out = Retrieval.rrfFuse(listA, listB, k = 3)
      .collect().map(r => (r.getLong(1), r.getDouble(2), r.getInt(3)))
      .sortBy(_._3)
    // per-list term = round(1e6/(60+rank))/1e6, i.e. micro(1/(60+rank))
    assert(out === Seq(
      (2L, micro(1.0 / 62) + micro(1.0 / 61), 1),
      (1L, micro(1.0 / 61), 2),
      (3L, micro(1.0 / 62), 3)))
    assert(out.head._2 > micro(1.0 / 61)) // fusion beats any single list
  }

  test("rrf: equal scores break ties by neighbor_id") {
    val listA = Seq((0L, 9L, 1), (0L, 4L, 1))
      .toDF("query_id", "neighbor_id", "rank")
    val empty = Seq.empty[(Long, Long, Int)]
      .toDF("query_id", "neighbor_id", "rank")
    val out = Retrieval.rrfFuse(listA, empty, k = 2)
      .collect().map(r => (r.getLong(1), r.getInt(3))).sortBy(_._2)
    assert(out === Seq((4L, 1), (9L, 2)))
  }
}
