package graft

import graft.text.{TextAnalysis, TextOps}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{ArrayCharCount, ArrayCountIn, CharTrigrams, ColumnShim}

/**
 * Value-equivalence pins for the r21 codegen'd text expressions
 * (graftshim.ShingleExpressions) against the CodegenFallback HOF forms
 * they replaced. Every registered oracle replays the HOF arithmetic in
 * DuckDB, so the codegen'd forms must be VALUE-IDENTICAL on every edge
 * the corpus can produce: NULL text, empty string, multi-space runs
 * (empty tokens), sub-width documents, unicode (multi-byte codepoints,
 * combining marks), and duplicate n-grams.
 */
class TextOpsShimSpec extends SparkSpec {
  import spark.implicits._

  private val texts: Seq[(java.lang.Long, String)] = Seq(
    (1L, "alpha beta gamma delta alpha beta gamma"),
    (2L, "a"),
    (3L, ""),
    (4L, null),
    (5L, "x  y   z"), // multi-space runs → empty tokens
    (6L, "héllo wörld héllo wörld naïve"), // multi-byte codepoints
    (7L, "éclair éclair"), // combining mark (NFD é)
    (8L, " lead and trail "),
    (9L, "one two"),
    (10L, "汉字 漢字 汉字 test 漢字"),
    (11L, "the a and of to in is the the"),
    (12L, (1 to 200).map(i => s"t${i % 13}").mkString(" ")))

  private def df = texts.toDF("doc_id", "text")

  private def hofTrigrams(c: Column): Column =
    when(length(c) >= 3,
      transform(sequence(lit(1), length(c) - 2), i => c.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))

  private def hofCharCount(toks: Column): Column =
    aggregate(transform(toks, t => length(t)), lit(0), (acc, x) => acc + x)

  private def hofCountIn(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => array_contains(array(words.map(lit): _*), t)))

  private def col2(e: org.apache.spark.sql.catalyst.expressions.Expression) =
    ColumnShim.column(e)

  test("WordShingles ≡ HOF shingles for widths 1, 2, 3 on every edge") {
    for (n <- Seq(1, 2, 3)) {
      val toks = TextOps.tokens(col("text"))
      val rows = df.select(col("doc_id"),
        TextOps.shingles(toks, n).as("fast"),
        TextOps.shinglesHof(toks, n).as("slow")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1).toList == r.getSeq[String](2).toList,
          s"width $n doc ${r.get(0)}")
      }
    }
  }

  test("WordShingles over unicode tokenizer matches HOF form") {
    val toks = TextOps.unicodeTokens(col("text"))
    val rows = df.select(col("doc_id"),
      TextOps.shingles(toks, 2).as("fast"),
      TextOps.shinglesHof(toks, 2).as("slow")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1).toList == r.getSeq[String](2).toList) }
  }

  test("CharTrigrams ≡ HOF substr lattice (codepoint grid, null → empty)") {
    val rows = df.select(col("doc_id"),
      col2(CharTrigrams(ColumnShim.expression(col("text")))).as("fast"),
      hofTrigrams(col("text")).as("slow")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1).toList == r.getSeq[String](2).toList,
        s"doc ${r.get(0)}")
    }
  }

  test("ArrayCharCount ≡ aggregate(transform(length)) incl. null array") {
    val toks = TextOps.tokens(col("text"))
    val rows = df.select(col("doc_id"),
      col2(ArrayCharCount(ColumnShim.expression(toks))).as("fast"),
      hofCharCount(toks).as("slow")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null split on doc ${r.get(0)}")
      if (!r.isNullAt(1)) assert(r.getInt(1) == r.getInt(2), s"doc ${r.get(0)}")
    }
  }

  test("ArrayCountIn ≡ size(filter(array_contains)) incl. null array") {
    val words = Seq("the", "a", "and", "of", "to", "in", "is")
    val toks = TextOps.tokens(col("text"))
    val rows = df.select(col("doc_id"),
      col2(ArrayCountIn(ColumnShim.expression(toks), words)).as("fast"),
      hofCountIn(toks, words).as("slow")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null split on doc ${r.get(0)}")
      if (!r.isNullAt(1)) assert(r.getInt(1) == r.getInt(2), s"doc ${r.get(0)}")
    }
  }

  test("BucketWeightSums ≡ per-table aggregate(element_at(md5-bucket)) fold") {
    val rnd = new scala.util.Random(7)
    val nBuckets = 64
    val tables = Array.fill(3)(Array.fill(nBuckets)(rnd.nextLong() % 1000L))
    val toks = TextOps.tokens(col("text"))
    def hofSum(w: Array[Long]): Column =
      aggregate(toks, lit(0L), (acc, t) =>
        acc + element_at(typedLit(w.toVector),
          (conv(substring(md5(t), 1, 8), 16, 10).cast("long") % nBuckets + 1)
            .cast("int")))
    val fast = ColumnShim.column(org.apache.spark.sql.graftshim
      .BucketWeightSums(ColumnShim.expression(toks), tables))
    val cols = Seq(col("doc_id")) ++
      (0 until 3).map(t => element_at(fast, t + 1).as(s"f$t")) ++
      (0 until 3).map(t => hofSum(tables(t)).as(s"s$t"))
    val rows = df.select(cols: _*).collect()
    rows.foreach { r =>
      for (t <- 0 until 3) {
        assert(r.isNullAt(1 + t) == r.isNullAt(4 + t),
          s"null split doc ${r.get(0)} table $t")
        if (!r.isNullAt(1 + t))
          assert(r.getLong(1 + t) == r.getLong(4 + t),
            s"doc ${r.get(0)} table $t")
      }
    }
  }

  test("MinHashLanes ≡ HOF per-base transform + per-lane array_min lattice") {
    val sh = graft.text.Dedup.shingleArrays(df, 3)
    for (k <- Seq(3, 8)) {
      val fast = graft.text.Dedup.minhashSignature(sh, k)
        .collect().map(r => r.getLong(0) ->
          (1 to k).map(i => r.getString(i)).toList).toMap
      val slow = graft.text.Dedup.minhashSignatureHof(sh, k)
        .collect().map(r => r.getLong(0) ->
          (1 to k).map(i => r.getString(i)).toList).toMap
      assert(fast == slow, s"k=$k")
    }
  }

  test("WinnowMins ≡ HOF nested window-min lattice (order + distinct)") {
    for ((sw, w) <- Seq((3, 4), (2, 2), (3, 1))) {
      val fast = graft.text.TextAnalysis.winnowingPickArrays(df, sw, w)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      val slow = graft.text.TextAnalysis.winnowingPickArraysHof(df, sw, w)
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toList).toMap
      assert(fast == slow, s"shingleWidth=$sw window=$w")
    }
  }

  test("CharNgrams ≡ HOF substr lattice for n = 1, 2, 4 on every edge") {
    def hofNgrams(c: Column, n: Int): Column =
      when(length(c) >= n,
        transform(sequence(lit(1), length(c) - (n - 1)),
          i => c.substr(i, lit(n))))
        .otherwise(array().cast("array<string>"))
    for (n <- Seq(1, 2, 4)) {
      val rows = df.select(col("doc_id"),
        col2(org.apache.spark.sql.graftshim.CharNgrams(
          ColumnShim.expression(col("text")), n)).as("fast"),
        hofNgrams(col("text"), n).as("slow")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1).toList == r.getSeq[String](2).toList,
          s"n=$n doc ${r.get(0)}")
      }
    }
  }

  test("BpeApplyMerges ≡ nested per-merge aggregate folds") {
    // merge lists exercising: chained merges whose concat feeds the next,
    // self-merge non-overlap ((a,a) over runs), and no-op rules
    val mergeLists = Seq(
      Seq("a" -> "l", "al" -> "p", "alp" -> "h", "alph" -> "a"),
      Seq("t" -> "t", "h" -> "é"),
      Seq("汉" -> "字", "x" -> "y"),
      Seq("q" -> "q"))
    val syms = graft.text.TextAnalysis.charSymsHof(col("text"))
    for (ms <- mergeLists) {
      val slow = ms.foldLeft(syms) { case (s, (a, b)) =>
        graft.text.TextAnalysis.applyMergeColHof(s, a, b) }
      val rows = df.select(col("doc_id"),
        col2(org.apache.spark.sql.graftshim.BpeApplyMerges(
          ColumnShim.expression(syms), ms)).as("fast"),
        slow.as("slow")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1).toList == r.getSeq[String](2).toList,
          s"merges=$ms doc ${r.get(0)}")
      }
    }
  }

  test("BpeApplyMerges non-overlap rule: 5×a under (a,a) → [aa, aa, a]") {
    val arr = typedLit(Seq("a", "a", "a", "a", "a"))
    val out = spark.range(1).select(
      col2(org.apache.spark.sql.graftshim.BpeApplyMerges(
        ColumnShim.expression(arr), Seq("a" -> "a"))).as("m"))
      .collect().head
    assert(out.getSeq[String](0).toList == List("aa", "aa", "a"))
  }

  test("AdjacentPairs ≡ HOF struct lattice (incl. null elements)") {
    val symCols = Seq(
      graft.text.TextAnalysis.charSymsHof(col("text")),
      TextOps.tokens(col("text")),
      typedLit(Seq[String]("a", null, "bb", null)))
    for ((syms, i) <- symCols.zipWithIndex) {
      val rows = df.select(col("doc_id"),
        col2(org.apache.spark.sql.graftshim.AdjacentPairs(
          ColumnShim.expression(syms))).as("fast"),
        when(size(syms) >= 2,
          graft.text.TextAnalysis.adjacentPairsHof(syms))
          .otherwise(array().cast("array<struct<a:string,b:string>>"))
          .as("slow")).collect()
      rows.foreach { r =>
        val f = r.getSeq[org.apache.spark.sql.Row](1)
          .map(p => (Option(p.getString(0)), Option(p.getString(1)))).toList
        val s = r.getSeq[org.apache.spark.sql.Row](2)
          .map(p => (Option(p.getString(0)), Option(p.getString(1)))).toList
        assert(f == s, s"input $i doc ${r.get(0)}")
      }
    }
  }

  test("ArrayDropEmpty ≡ filter(t =!= \"\") — unicodeTokens on every edge") {
    val rows = df.select(col("doc_id"),
      TextOps.unicodeTokens(col("text")).as("fast"),
      TextOps.unicodeTokensHof(col("text")).as("slow")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null split doc ${r.get(0)}")
      if (!r.isNullAt(1))
        assert(r.getSeq[String](1).toList == r.getSeq[String](2).toList,
          s"doc ${r.get(0)}")
    }
    // null elements are dropped like the filter's three-valued predicate
    val arr = typedLit(Seq[String]("a", null, "", "bb"))
    val out = spark.range(1).select(
      col2(org.apache.spark.sql.graftshim.ArrayDropEmpty(
        ColumnShim.expression(arr))).as("d")).collect().head
    assert(out.getSeq[String](0).toList == List("a", "bb"))
  }

  test("ArrayMd5 ∘ WordShingles ≡ nested transform(md5(concat_ws(slice)))") {
    val k = 4
    val toks = TextOps.tokens(col("text"))
    val hof = transform(sequence(lit(0), size(toks) - k),
      i => md5(concat_ws(" ", slice(toks, i + 1, lit(k)))))
    val rows = df.filter(col("text").isNotNull && size(toks) >= k)
      .select(col("doc_id"),
        col2(org.apache.spark.sql.graftshim.ArrayMd5(
          ColumnShim.expression(TextOps.shingles(toks, k)))).as("fast"),
        hof.as("slow")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](1).toList == r.getSeq[String](2).toList,
        s"doc ${r.get(0)}")
    }
  }

  test("TokenChunkStats ≡ HOF chunk lattice (count incl. nulls, md5 join)") {
    for (cs <- Seq(3, 32)) {
      val toks = TextOps.tokens(col("text"))
      val rows = df.filter(col("text").isNotNull)
        .select(col("doc_id"),
          col2(org.apache.spark.sql.graftshim.TokenChunkStats(
            ColumnShim.expression(toks), cs)).as("fast"),
          graft.text.TextAnalysis.tokenChunksHof(toks, cs).as("slow"))
        .collect()
      rows.foreach { r =>
        def norm(i: Int) = r.getSeq[org.apache.spark.sql.Row](i)
          .map(c => (c.getInt(0), c.getInt(1), c.getString(2))).toList
        assert(norm(1) == norm(2), s"cs=$cs doc ${r.get(0)}")
      }
    }
  }

  test("PosTokenJoin ≡ concat_ws(transform(array_sort(collect_list)))") {
    val toks = df.filter(col("text").isNotNull)
      .select(col("doc_id"),
        posexplode(TextOps.tokens(col("text"))).as(Seq("pos", "token")))
    val agg = toks.groupBy(col("doc_id")).agg(
      col2(org.apache.spark.sql.graftshim.PosTokenJoin(
        ColumnShim.expression(
          collect_list(struct(col("pos"), col("token")))))).as("fast"),
      concat_ws(" ", transform(
        array_sort(collect_list(struct(col("pos"), col("token")))),
        s => s.getField("token"))).as("slow")).collect()
    assert(agg.nonEmpty)
    agg.foreach { r =>
      assert(r.getString(1) == r.getString(2), s"doc ${r.get(0)}")
    }
  }

  test("AdjacentPairInSet ≡ coalesce(overlap && exists(element_at map))") {
    val pairs = Seq("a" -> "l", "l" -> "p", "汉" -> "字", "t" -> "t")
    val abMap = pairs.toMap
    val syms = graft.text.TextAnalysis.charSymsHof(col("text"))
    val hof = coalesce(
      size(syms) >= 2 &&
        arrays_overlap(syms, typedlit(pairs.map(_._1))) &&
        exists(sequence(lit(1), size(syms) - 1), i =>
          element_at(typedlit(abMap), element_at(syms, i)) ===
            element_at(syms, (i + lit(1)).cast("int"))),
      lit(false))
    val rows = df.select(col("doc_id"),
      col2(org.apache.spark.sql.graftshim.AdjacentPairInSet(
        ColumnShim.expression(syms), pairs)).as("fast"),
      hof.as("slow")).collect()
    rows.foreach { r =>
      assert(r.getBoolean(1) == r.getBoolean(2), s"doc ${r.get(0)}")
    }
  }

  test("ScalarQuantizeStats ≡ HOF quantization lattice on real vectors") {
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val dims = e.select(posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("dim"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
      .orderBy(col("dim")).collect()
    val mns = dims.map(_.getAs[Double]("mn"))
    val mxs = dims.map(_.getAs[Double]("mx"))
    for (levels <- Seq(255, 3)) {
      val rows = e.select(col("vec_id"),
        col2(org.apache.spark.sql.graftshim.ScalarQuantizeStats(
          ColumnShim.expression(col("v")), mns, mxs, levels)).as("fast"),
        graft.similarity.Similarity.scalarQuantizeHof(
          col("v"), mns, mxs, levels).as("slow")).collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val f = r.getStruct(1); val s = r.getStruct(2)
        assert(f.getString(0) == s.getString(0),
          s"checksum levels=$levels vec ${r.get(0)}")
        assert(f.getDouble(1) == s.getDouble(1),
          s"mean_abs_err levels=$levels vec ${r.get(0)}")
      }
    }
  }

  test("ArrayCountMatching ≡ size(filter(rlike)) — latin count on every edge") {
    val utoks = TextOps.unicodeTokens(col("text"))
    val rows = df.select(col("doc_id"),
      TextAnalysis.latinCount(utoks).as("fast"),
      TextAnalysis.latinCountHof(utoks).as("slow")).collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"null doc ${r.get(0)}")
      if (!r.isNullAt(1))
        assert(r.getInt(1) == r.getInt(2), s"doc ${r.get(0)}")
    }
    // null elements excluded, like the filter predicate's null → dropped;
    // find(0) semantics: the anchor-free pattern matches substrings
    val arr = typedLit(Seq[String]("ab1", null, "", "É", "x y", "9"))
    val out = spark.range(1).select(
      col2(org.apache.spark.sql.graftshim.ArrayCountMatching(
        ColumnShim.expression(arr), "^[a-z0-9]+$")).as("c"),
      col2(org.apache.spark.sql.graftshim.ArrayCountMatching(
        ColumnShim.expression(arr), "[a-z]")).as("sub")).collect().head
    assert(out.getInt(0) == 2) // "ab1", "9"
    assert(out.getInt(1) == 2) // "ab1", "x y" — unanchored find
  }

  test("interpreted eval path agrees with codegen (null-element poison)") {
    // a null ELEMENT (never produced by split, but part of the contract)
    val arr = typedLit(Seq[String]("a", null, "bb"))
    val out = spark.range(1).select(
      col2(ArrayCharCount(ColumnShim.expression(arr))).as("cc"),
      col2(ArrayCountIn(ColumnShim.expression(arr), Seq("a"))).as("ci"),
      TextOps.shingles(arr, 2).as("sh")).collect().head
    assert(out.isNullAt(0)) // charcount poisons like the fold
    assert(out.getInt(1) == 1) // null element not counted, like filter
    // concat_ws skips nulls: ["a", "bb"] joined pairwise
    assert(out.getSeq[String](2).toList == List("a", "bb"))
  }
}
