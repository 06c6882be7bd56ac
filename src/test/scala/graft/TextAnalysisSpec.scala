package graft

import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docsDF(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("simhash: identical docs get identical 32-bit signatures") {
    val out = TextAnalysis.simhash(docsDF(
      1L -> "alpha beta gamma delta", 2L -> "alpha beta gamma delta"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("simhash")).toMap
    assert(out(1L) == out(2L))
    assert(out(1L).length == 32 && out(1L).forall(c => c == '0' || c == '1'))
  }

  test("simhash: near-dup docs are closer in Hamming space than random docs") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = base.replace("tok40", "changed")
    val far = (1 to 40).map(i => s"other$i").mkString(" ")
    val df = TextAnalysis.simhash(docsDF(1L -> base, 2L -> near, 3L -> far))
    val sig = df.collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("simhash")).toMap
    def ham(a: String, b: String) = a.zip(b).count { case (x, y) => x != y }
    assert(ham(sig(1L), sig(2L)) < ham(sig(1L), sig(3L)))
  }

  test("hammingDistance column helper agrees with scala impl") {
    val df = Seq(("1010", "1001"), ("1111", "1111")).toDF("a", "b")
      .select(TextAnalysis.hammingDistance(col("a"), col("b")).as("d"))
    assert(df.collect().map(_.getAs[Int]("d")).toSeq == Seq(2, 0))
  }

  test("unigramLogProb: hand-computed scores on a tiny corpus") {
    // corpus: a a b (total 3) → p(a)=2/3, p(b)=1/3
    val out = TextAnalysis.unigramLogProb(docsDF(1L -> "a a", 2L -> "b"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("avg_logprob"))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(1L) == ((2L, r6(math.log(2.0 / 3)))))
    assert(out(2L) == ((1L, r6(math.log(1.0 / 3)))))
    // rarer-token doc scores lower (higher perplexity)
    assert(out(2L)._2 < out(1L)._2)
  }

  test("repetitionStats: hand-computed fractions; sub-bigram docs survive") {
    // "a a a b": 4 tokens 2 types; bigrams [a a, a a, a b] → nb=3 ndb=2 top=2
    // "x y": nb=1 ndb=1 top=1 → top_frac 1.0 (degenerate short doc)
    // "z": no bigrams → zero fractions, not repetitive
    val out = TextAnalysis.repetitionStats(
      docsDF(1L -> "a a a b", 2L -> "x y", 3L -> "z"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_tokens"), r.getAs[Double]("dup_word_frac"),
          r.getAs[Double]("dup_bigram_frac"), r.getAs[Double]("top_bigram_frac"),
          r.getAs[Boolean]("repetitive")))).toMap
    assert(out(1L) == ((4, 0.5, 0.333333, 0.666667, true)))
    assert(out(2L) == ((2, 0.0, 0.0, 1.0, true)))
    assert(out(3L) == ((1, 0.0, 0.0, 0.0, false)))
  }

  test("bpeMergeCandidates: vocab-weighted pair counts; 1-char words inert") {
    // words: ab×3, cd×1, x×1 → pairs: ab→3, cd→1; 'x' has no pairs
    val out = TextAnalysis.bpeMergeCandidates(
      docsDF(1L -> "ab ab cd", 2L -> "x ab"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(out == Seq("ab" -> 3L, "cd" -> 1L))
    // overlapping pairs within one word: "abc" → ab, bc
    val ov = TextAnalysis.bpeMergeCandidates(docsDF(1L -> "abc"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(ov == Seq("ab" -> 1L, "bc" -> 1L))
  }

  test("bpeTrain: learns the textbook merge sequence on a hand corpus; " +
    "greedy non-overlapping application; encode counts under the vocab") {
    // corpus: "abab"×3 "ab"×2 "aaaa"×1. Round 1 raw adjacent pairs:
    //   (a,b): 2×3 + 1×2 = 8; (b,a): 1×3 = 3; (a,a): 3×1 = 3
    //   → winner (a,b) c=8; apply → [ab,ab]×3, [ab]×2, [a,a,a,a]
    // Round 2: (ab,ab)=3 vs (a,a)=3 — COUNT tie, lexicographic (a, b)
    //   break → ("a","a") wins (pair counting is raw adjacent; only the
    //   APPLICATION is non-overlapping) → aaaa becomes [aa,aa]
    // Round 3: (ab,ab)=3 vs (aa,aa)=1 → ("ab","ab") wins c=3
    val docs = Seq((1L, "abab abab abab ab ab aaaa")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeTrain(docs, nMerges = 3)
    assert(merges.map(m => (m.rank, m.symA, m.symB, m.nOccurrences)) == Seq(
      (1, "a", "b", 8L), (2, "a", "a", 3L), (3, "ab", "ab", 3L)),
      s"got $merges")
    // dictionary after the merges: greedy non-overlap application
    val dict = TextAnalysis.bpeDictionary(docs, merges).collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList).toMap
    assert(dict("abab") == List("abab"))
    assert(dict("ab") == List("ab"))
    assert(dict("aaaa") == List("aa", "aa")) // greedy (a,a) twice
    // encode: doc-grain symbol occurrences under the trained vocab
    val enc = TextAnalysis.bpeEncode(docs, TextAnalysis.bpeDictionary(docs, merges))
      .groupBy("sym").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(enc == Map("abab" -> 3L, "ab" -> 2L, "aa" -> 2L), s"got $enc")
    // the vocabulary-grain rollup (the registered query's path) must
    // equal the doc-grain encode rolled up
    val roll = TextAnalysis.bpeSymbolCounts(docs, merges).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(roll == enc, s"rollup $roll != doc-grain $enc")
    // minWordCount prunes the training vocabulary: at floor 2 the
    // singleton "aaaa" leaves, so round 2's (a,a)-vs-(ab,ab) count tie
    // disappears and (ab,ab) wins outright
    val pruned = TextAnalysis.bpeTrain(docs, nMerges = 2, minWordCount = 2)
    assert(pruned.map(m => (m.rank, m.symA, m.symB, m.nOccurrences)) ==
      Seq((1, "a", "b", 8L), (2, "ab", "ab", 3L)), s"got $pruned")
  }

  test("bpeTrain batched: conflicting-pair hand trace — the tie cases " +
    "that force prefix-stop and the strict c_stop trim") {
    // Corpus {azy×5, cd×5}: round-1 pairs (a,z)=5, (c,d)=5, (z,y)=5 all
    // TIED. Sequential: r1 (a,z) on the lexicographic break; the merge
    // CREATES ("az", y)=5, which at r2 ties (c,d) and sorts FIRST; r3
    // (c,d). A batcher that admitted the disjoint (c,d) alongside (a,z)
    // in round 1 would emit the WRONG rank order — the strict c_stop
    // trim must hold (c,d) back because the conflicting (z,y) ties it.
    val docs = Seq((1L, "azy azy azy azy azy cd cd cd cd cd"))
      .toDF("doc_id", "text")
    val want = Seq((1, "a", "z", 5L), (2, "az", "y", 5L), (3, "c", "d", 5L))
    for (b <- Seq(1, 2, 3, 8)) {
      val got = TextAnalysis.bpeTrain(docs, nMerges = 3, batch = b)
        .map(m => (m.rank, m.symA, m.symB, m.nOccurrences))
      assert(got == want, s"batch=$b: $got != $want")
    }
    // admitBatch unit trace on that round-1 window: (a,z) admitted;
    // (c,d) disjoint → provisionally admitted; (z,y) shares z → STOP
    // with c_stop=5; trim drops (c,d) (5 > 5 fails) → one merge only.
    assert(TextAnalysis.admitBatch(
      Seq(("a", "z", 5L), ("c", "d", 5L), ("z", "y", 5L)), want = 3) ==
      Seq(("a", "z", 5L)))
    // Concat-collision rule: a candidate naming an earlier admitted
    // pair's concatenation ("ab" after (a,b)) must stop the prefix —
    // its count is NOT invariant under the earlier merge.
    assert(TextAnalysis.admitBatch(
      Seq(("a", "b", 9L), ("ab", "q", 4L), ("x", "y", 3L)), want = 3) ==
      Seq(("a", "b", 9L)))
    // Rule-4 concat-collision truncation: symbol "aba" pre-exists (two
    // merge derivations — priorConcats carries it), so admitting
    // ("ab","a") AUGMENTS any pre-existing (x,"aba") pair by up to
    // c_stop: post-count ≤ 2·c_stop = 10 can overtake the kept tail
    // (q,r)=6 in its sequential round. The batch must cut right after
    // the colliding pair.
    assert(TextAnalysis.admitBatch(
      Seq(("ab", "a", 10L), ("q", "r", 6L), ("x", "aba", 5L)), want = 3,
      priorConcats = Set("ab", "ba", "aba")) ==
      Seq(("ab", "a", 10L)))
    // Same-batch collision: two disjoint kept pairs with EQUAL concats
    // ("x"+"yz" and "xy"+"z" both → "xyz") — the first creates the
    // symbol mid-fold, so the second collides and cuts the batch after
    // itself, holding back the tail (p,q).
    assert(TextAnalysis.admitBatch(
      Seq(("x", "yz", 9L), ("xy", "z", 8L), ("p", "q", 7L), ("m", "n", 1L)),
      want = 4) ==
      Seq(("x", "yz", 9L), ("xy", "z", 8L)))
    // No collision when the concat is fresh: priorConcats that do NOT
    // contain the concat leave the clean path untouched.
    assert(TextAnalysis.admitBatch(
      Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "f", 5L)), want = 3,
      priorConcats = Set("zz", "qq")) ==
      Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "f", 5L)))
    // Clean window: disjoint, concat-safe, strictly separated counts →
    // the whole budget admits (the sub-linear path).
    assert(TextAnalysis.admitBatch(
      Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "f", 5L), ("g", "h", 4L)),
      want = 3) == Seq(("a", "b", 9L), ("c", "d", 7L), ("e", "f", 5L)))
    // Exhausted window (fewer rows than the budget, no conflict): admit
    // everything — no unseen tail exists to tie against.
    assert(TextAnalysis.admitBatch(
      Seq(("a", "b", 5L), ("c", "d", 5L)), want = 3) ==
      Seq(("a", "b", 5L), ("c", "d", 5L)))
  }

  test("bpeFertility: hand-traced chars/token and tokens/word per source " +
    "under a trained dictionary") {
    // trained on the textbook corpus: merges (a,b), (a,a), (ab,ab) —
    // dict: abab→[abab], ab→[ab], aaaa→[aa,aa]
    val train = docsDF(1L -> "abab abab abab ab ab aaaa")
    val merges = TextAnalysis.bpeTrain(train, nMerges = 3)
    // scored corpus: srcA doc1 "abab ab" (7 chars, 2 words → 2 subwords),
    // srcA doc2 "aaaa" (4 chars, 1 word → 2 subwords);
    // srcB doc3 "ab" (2 chars, 1 word → 1 subword)
    val docs = Seq(
      (1L, "abab ab", "srcA", 7L),
      (2L, "aaaa", "srcA", 4L),
      (3L, "ab", "srcB", 2L))
      .toDF("doc_id", "text", "source", "n_chars")
    val dict = TextAnalysis.bpeDictionary(docs, merges)
    val out = TextAnalysis.bpeFertility(docs, dict).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_subword_tokens"),
          r.getAs[Double]("chars_per_token"),
          r.getAs[Double]("tokens_per_word"))).toMap
    // srcA: 11 chars / 4 subwords = 2.75; 4 subwords / 3 words = 1.333333
    assert(out("srcA") == ((2L, 4L, 2.75, 1.333333)), s"got ${out("srcA")}")
    assert(out("srcB") == ((1L, 1L, 2.0, 1.0)), s"got ${out("srcB")}")
  }

  test("unicodeTokens: NFC folds composed/decomposed accents; casefold; " +
    "category split on mixed-script text; unicodeStats hand values") {
    import graft.text.TextOps
    // "café" composed (U+00E9) vs decomposed ("e" + U+0301): byte-different,
    // canonically EQUAL — the whitespace tokenizer sees two types, the
    // Unicode tokenizer one
    val composed = "café"
    val decomposed = "café"
    val mixed = s"$composed $decomposed МОСКВА, " +
      "東京! Tokyo-2025 élève"
    val df = docsDF(1L -> mixed)
    val utoks = df.select(TextOps.unicodeTokens(col("text")).as("t"))
      .collect()(0).getSeq[String](0).toList
    // NFC+casefold: both cafés → "café"; МОСКВА casefolds to москва with
    // the comma split off; 東京 keeps its Han letters, '!' splits;
    // "Tokyo-2025" splits at the hyphen; "élève" normalizes+casefolds
    assert(utoks == List("café", "café", "москва",
      "東京", "tokyo", "2025", "élève"), s"got $utoks")
    val st = TextAnalysis.unicodeStats(df).collect()(0)
    assert(st.getAs[Int]("n_tokens") == 7)
    assert(st.getAs[Int]("n_unique_tokens") == 6) // café deduped
    // NFC length: decomposed café (5 chars) folds to 4, and élève's
    // decomposed leading é folds too — two combining marks disappear
    assert(st.getAs[Int]("n_chars_nfc") == mixed.length - 2)
    // latin_ratio: tokyo + 2025 of 7 tokens (café/élève carry accents)
    assert(st.getAs[Double]("latin_ratio") ==
      math.rint(2.0 / 7 * 1e6) / 1e6)
    // whitespace tokenizer on the same text: no fold, no split — the
    // statistics the knob exists to fix
    val wtoks = df.select(TextOps.tokens(col("text")).as("t"))
      .collect()(0).getSeq[String](0).toList
    assert(wtoks.contains("МОСКВА,") &&
      composed != decomposed && wtoks.count(_.startsWith("caf")) == 2)
    // all-punctuation doc: zero tokens, NULL ratios (no 0/0 NaN leak)
    val empty = TextAnalysis.unicodeStats(docsDF(2L -> "!!! ... ---")).collect()(0)
    assert(empty.getAs[Int]("n_tokens") == 0 &&
      empty.isNullAt(empty.fieldIndex("mean_token_len")) &&
      empty.isNullAt(empty.fieldIndex("latin_ratio")))
    // the shared-token-frame knob: unicode=true folds the two cafés into
    // one (doc, token) row of count 2; default stays byte-faithful
    val tf = TextAnalysis.docTokenCounts(df, unicode = true)
      .filter(col("token") === "café").collect()
    assert(tf.length == 1 && tf(0).getAs[Long]("__k") == 2L)
    assert(TextAnalysis.docTokenCounts(df)
      .filter(col("token").startsWith("caf")).count() == 2L)
  }

  test("unicodeTokens: parity with the whitespace tokenizer on pure-ASCII " +
    "space-separated lowercase corpora (fuzz)") {
    import graft.text.TextOps
    val rnd = new scala.util.Random(1502L)
    val corpora = (1 to 8).map { d =>
      (d.toLong, (0 until 3 + rnd.nextInt(20)).map(_ =>
        (0 until 1 + rnd.nextInt(8)).map(_ =>
          ('a' + rnd.nextInt(26)).toChar).mkString +
          (if (rnd.nextBoolean()) rnd.nextInt(100).toString else ""))
        .mkString(" "))
    }
    val df = corpora.toDF("doc_id", "text")
    val both = df.select(col("doc_id"),
      TextOps.tokens(col("text")).as("w"),
      TextOps.unicodeTokens(col("text")).as("u")).collect()
    both.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"doc ${r.getLong(0)}: whitespace ${r.getSeq[String](1)} != " +
          s"unicode ${r.getSeq[String](2)}")
    }
  }

  test("uniformSourceMix: exact per-source quota, deterministic hash ranks") {
    // srcA has 3 docs, srcB has 2 → quota 2: every source keeps exactly 2
    val docs = Seq(
      (1L, "aaa", "srcA"), (2L, "bbb", "srcA"), (3L, "ccc", "srcA"),
      (4L, "ddd", "srcB"), (5L, "eee", "srcB"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.uniformSourceMix(docs).collect()
    val bySrc = out.groupBy(_.getAs[String]("source"))
    assert(bySrc("srcA").length == 2 && bySrc("srcB").length == 2)
    assert(out.forall(_.getAs[Int]("mix_rank") <= 2))
    // deterministic: a second run keeps the identical doc set
    val again = TextAnalysis.uniformSourceMix(docs).collect()
      .map(_.getAs[Long]("doc_id")).sorted
    assert(again.toSeq == out.map(_.getAs[Long]("doc_id")).sorted.toSeq)
    // the kept srcA docs are the 2 with the smallest salted hashes
    val keys = docs.select(col("doc_id"),
      md5(concat(lit("mix:"), col("text"))).as("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expectA = Seq(1L, 2L, 3L).sortBy(keys).take(2).toSet
    assert(bySrc("srcA").map(_.getAs[Long]("doc_id")).toSet == expectA)
    // fraction scales the quota: floor(2 · 0.5) = 1 per source
    assert(TextAnalysis.uniformSourceMix(docs, fraction = 0.5).count() == 2)
  }

  test("vocabBySource: exact per-source token/type counts and TTR") {
    val docs = Seq(
      (1L, "a b a", "s1"), (2L, "a c", "s1"),   // s1: 5 tokens, types {a,b,c}
      (3L, "x x x x", "s2"))                    // s2: 4 tokens, 1 type
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.vocabBySource(docs).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("n_types"), r.getAs[Double]("type_token_ratio")))).toMap
    assert(out("s1") == ((2L, 5L, 3L, 0.6)))
    assert(out("s2") == ((1L, 4L, 1L, 0.25)))
    // empty corpus: empty result, no NPE from the min/quota paths
    assert(TextAnalysis.vocabBySource(docs.filter(col("doc_id") < 0)).count() == 0)
    assert(TextAnalysis.temperatureSourceMix(docs.filter(col("doc_id") < 0)).count() == 0)
  }

  test("temperatureSourceMix: geometric quotas between uniform and natural") {
    // srcA 9 docs, srcB 4 docs (min); α=0.5 → quotas floor(sqrt(n·4)): A=6, B=4
    val docs = ((1 to 9).map(i => (i.toLong, s"a$i", "srcA")) ++
      (10 to 13).map(i => (i.toLong, s"b$i", "srcB"))).toDF("doc_id", "text", "source")
    val out = TextAnalysis.temperatureSourceMix(docs).collect()
    val bySrc = out.groupBy(_.getAs[String]("source"))
    assert(bySrc("srcA").length == 6 && bySrc("srcB").length == 4)
    assert(out.forall(r => r.getAs[Long]("quota") ==
      (if (r.getAs[String]("source") == "srcA") 6L else 4L)))
    // α=1 is the natural mix (keep everything); α=0 is the uniform mix
    assert(TextAnalysis.temperatureSourceMix(docs, alpha = 1.0).count() == 13)
    val uni = TextAnalysis.temperatureSourceMix(docs, alpha = 0.0).collect()
    assert(uni.groupBy(_.getAs[String]("source")).forall(_._2.length == 4))
    // fraction scales every quota: 0.5 → A=3, B=2
    assert(TextAnalysis.temperatureSourceMix(docs, fraction = 0.5).count() == 5)
  }

  test("tokenChunks: full + tail chunks with exact sizes and digests") {
    val text70 = (1 to 70).map(i => s"t$i").mkString(" ")
    val out = TextAnalysis.tokenChunks(
      Seq((1L, text70), (2L, "a b")).toDF("doc_id", "text"))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("chunk_no")) ->
        r.getAs[Int]("n_chunk_tokens")).toMap
    assert(out.keySet == Set((1L, 0), (1L, 1), (1L, 2), (2L, 0)))
    assert(out((1L, 0)) == 32 && out((1L, 1)) == 32 && out((1L, 2)) == 6)
    assert(out((2L, 0)) == 2)
    // tail-chunk digest covers exactly tokens 65..70
    val tail = TextAnalysis.tokenChunks(Seq((1L, text70)).toDF("doc_id", "text"))
      .filter(col("chunk_no") === 2).collect().head.getAs[String]("checksum")
    val want = TextAnalysis.tokenChunks(
      Seq((9L, (65 to 70).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text"))
      .collect().head.getAs[String]("checksum")
    assert(tail == want)
  }

  test("stratifiedSample: deterministic, content-keyed, rate-ordered by lang") {
    val docs = (1 to 400).map(i => (i.toLong, s"doc body number $i",
      if (i % 2 == 0) "en" else "zz")).toDF("doc_id", "text", "lang")
    val a = TextAnalysis.stratifiedSample(docs).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val b = TextAnalysis.stratifiedSample(docs).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(a == b, "sampling must be deterministic")
    val perLang = TextAnalysis.stratifiedSample(docs).collect()
      .groupBy(_.getAs[String]("lang")).view.mapValues(_.length).toMap
    // en keeps ~50% of 200, default ~10% of 200 — wide tolerance, the
    // point is the ordering and that both strata are non-empty
    assert(perLang.getOrElse("en", 0) > perLang.getOrElse("zz", 0))
    assert(perLang.getOrElse("en", 0) > 60 && perLang.getOrElse("en", 0) < 140)
    assert(perLang.getOrElse("zz", 0) > 4 && perLang.getOrElse("zz", 0) < 50)
  }

  test("qualityGate: each rule fires in order, clean docs pass") {
    val fillers = (1 to 40).map(i => s"word$i")
    val clean = (fillers.take(35) :+ "the" :+ "of" :+ "and").mkString(" ")
    val short = "just a few tokens here"
    val longTok = (1 to 35).map(i => s"exceptionallylongtoken$i").mkString(" ")
    val noStop = fillers.mkString(" ")
    val repetitive = (("the of" +: Seq.fill(20)("dup gram dup gram")).mkString(" "))
    val out = TextAnalysis.qualityGate(docsDF(
      1L -> clean, 2L -> short, 3L -> longTok, 4L -> noStop, 5L -> repetitive))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("reason"), r.getAs[Boolean]("keep"))).toMap
    assert(out(1L) == (("pass", true)))
    assert(out(2L) == (("too_short", false)))
    assert(out(3L) == (("bad_token_len", false)))
    assert(out(4L) == (("low_stopword", false)))
    assert(out(5L) == (("repetitive", false)))
  }

  test("vocabTopK: term + doc frequency with deterministic tie order and cutoff") {
    val out = TextAnalysis.vocabTopK(docsDF(
      1L -> "b a b c", 2L -> "a b z", 3L -> "a"), k = 3).collect()
      .map(r => (r.getAs[String]("token"),
        r.getAs[Long]("n_occurrences"), r.getAs[Long]("doc_freq")))
    // a: 3 occ / 3 docs; b: 3 occ / 2 docs — tie on count broken by token
    // order; c and z (1 occ each) tie → 'c' wins the last slot
    assert(out.toSeq == Seq(("a", 3L, 3L), ("b", 3L, 2L), ("c", 1L, 1L)))
  }

  test("stats: counts, mean token length and stopword ratio on a known doc") {
    val r = TextAnalysis.stats(docsDF(1L -> "the cat the hat is big")).collect().head
    assert(r.getAs[Int]("n_tokens") == 6)
    assert(r.getAs[Int]("n_unique_tokens") == 5)
    // tokens: the(3) cat(3) the(3) hat(3) is(2) big(3) → 17/6
    assert(math.abs(r.getAs[Double]("mean_token_len") - 17.0 / 6) < 1e-6)
    // stopwords: the, the, is → 3/6
    assert(r.getAs[Double]("stopword_ratio") == 0.5)
  }

  test("bpe-ish token count splits letter runs, digit runs and symbols") {
    val r = TextAnalysis.stats(docsDF(1L -> "abc123 def!")).collect().head
    // abc | 123 | def | !  → 4
    assert(r.getAs[Int]("n_bpe_tokens") == 4)
  }

  test("winnowing: identical docs share the digest; long shared runs share a pick") {
    val shared = (1 to 20).map(i => s"run$i").mkString(" ")
    val out = TextAnalysis.winnowingFingerprint(docsDF(
      1L -> s"aa bb $shared",
      2L -> s"zz yy xx $shared ww",
      3L -> s"aa bb $shared",
      4L -> "totally different words here entirely now",
      5L -> "too short")) // 2 tokens < shingle+window-1 → absent
    val rows = out.collect().map(r => r.getAs[Long]("doc_id") ->
      (r.getAs[Long]("n_fingerprints"), r.getAs[String]("fingerprint"))).toMap
    assert(rows(1L) == rows(3L))
    assert(rows(1L) != rows(2L)) // superset text → different full set
    assert(!rows.contains(5L))
    // the winnowing guarantee: docs 1 and 2 share a ≥ w+k−1-token run, so
    // their fingerprint SETS must intersect — check via the raw picks
    val picks = TextAnalysis.winnowingFingerprint(docsDF(
      1L -> s"aa bb $shared", 2L -> s"zz yy xx $shared ww"))
    assert(picks.count() == 2)
  }

  test("corpusStats: per-lang rows plus a NULL-lang grand total; exact median") {
    val docs = Seq(
      (1L, "a b", "en", 10L),
      (2L, "c d e", "en", 20L),
      (3L, "f", "de", 7L))
      .toDF("doc_id", "text", "lang", "n_chars")
    val out = TextAnalysis.corpusStats(docs).collect()
      .map(r => Option(r.getAs[String]("lang")) ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_tokens"),
          r.getAs[Double]("median_chars")))).toMap
    assert(out(Some("en")) == ((2L, 5L, 15.0)))   // median of 10,20 interpolates
    assert(out(Some("de")) == ((1L, 1L, 7.0)))
    assert(out(None) == ((3L, 6L, 10.0)))         // grand total over all docs
  }

  test("simhashNearDupPairs: identical docs pair at hamming 0; disjoint docs don't pair") {
    val out = TextAnalysis.simhashNearDupPairs(docsDF(
      1L -> "one two three four five six seven eight",
      2L -> "one two three four five six seven eight",
      3L -> "totally different vocabulary everywhere here now yes indeed"))
      .collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("doc_a") == 1L && out.head.getAs[Long]("doc_b") == 2L)
    assert(out.head.getAs[Int]("hamming") == 0)
  }

  test("hammingDistance: codegen'd expression counts differing positions") {
    val out = Seq(("0110", "0111"), ("0000", "0000"), ("1111", "0000"))
      .toDF("a", "b")
      .select(TextAnalysis.hammingDistance(col("a"), col("b")).as("d"))
      .collect().map(_.getAs[Int]("d")).toSeq
    assert(out == Seq(1, 0, 4))
  }

  test("hashSplit: content-keyed (dups co-split), deterministic, ~80/10/10") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val assigned = TextAnalysis.hashSplit(docs)
    // exact duplicates always share a split — no leak across the boundary
    val leaky = TextAnalysis.hashSplit(
      Seq((1L, "same text"), (2L, "same text")).toDF("doc_id", "text"))
      .select("split").distinct().count()
    assert(leaky == 1)
    // stable across evaluations
    val a = assigned.select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = TextAnalysis.hashSplit(docs).select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b)
    // fractions near 80/10/10 (binomial tolerance on 500 docs)
    val n = a.size.toDouble
    val frac = a.values.groupBy(identity).view.mapValues(_.size / n).toMap
    assert(math.abs(frac("train") - 0.80) < 0.08, frac.toString)
    assert(math.abs(frac.getOrElse("val", 0.0) - 0.10) < 0.06, frac.toString)
    assert(math.abs(frac.getOrElse("test", 0.0) - 0.10) < 0.06, frac.toString)
  }

  test("bigramLogProb: hand-computed MLE conditionals; short docs dropped") {
    // corpus bigrams: doc1 "a b a b" → {a b}×2, {b a}; doc2 "a c" → {a c}
    // counts: c(a b)=2, c(b a)=1, c(a c)=1; prefixes: c(a·)=3, c(b·)=1
    // doc1: (ln(2/3) + ln(1/1) + ln(2/3)) / 3; doc2: ln(1/3); doc3: no bigram
    val out = TextAnalysis.bigramLogProb(docsDF(
      1L -> "a b a b", 2L -> "a c", 3L -> "solo"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob")))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L)._1 == 3)
    assert(out(1L)._2 == r6(2 * math.log(2.0 / 3) / 3))
    assert(out(2L) == ((1L, r6(math.log(1.0 / 3)))))
  }

  test("tfidfTopTerms: corpus-wide terms score 0, distinctive terms rank first") {
    // 'shared' is in all 3 docs → ln(3/3)=0; each doc's unique token has
    // tf=1 · ln(3/1) — the distinctive term must outrank the shared one
    val out = TextAnalysis.tfidfTopTerms(docsDF(
      1L -> "shared alpha", 2L -> "shared beta", 3L -> "shared gamma"), topK = 2)
      .collect()
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.keySet == Set(1L, 2L, 3L))
    val top1 = byDoc(1L).find(_.getAs[Int]("rank") == 1).get
    assert(top1.getAs[String]("token") == "alpha")
    assert(top1.getAs[Double]("tfidf") == math.rint(math.log(3.0) * 1e6) / 1e6)
    val sharedRow = byDoc(1L).find(_.getAs[String]("token") == "shared").get
    assert(sharedRow.getAs[Double]("tfidf") == 0.0)
  }

  test("tfidfTopTerms: empty corpus yields empty output, not an NPE") {
    assert(TextAnalysis.tfidfTopTerms(docsDF()).count() == 0)
  }

  test("tokenEntropy: uniform doc hits ln(n); constant doc is 0 with null ratio") {
    val out = TextAnalysis.tokenEntropy(docsDF(
      1L -> "a b c d", 2L -> "x x x x"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_types"),
          r.getAs[Double]("entropy"), Option(r.get(4))))).toMap
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(out(1L)._1 == 4 && out(1L)._2 == 4)
    assert(out(1L)._3 == r6(math.log(4.0)))
    assert(out(1L)._4.contains(1.0)) // H / ln(types) = 1 for uniform
    assert(out(2L)._3 == 0.0 && out(2L)._4.isEmpty)
  }

  test("packShards: per-source running order, budget rollover, whole docs") {
    // source s1: 3 docs of 3 tokens; budget 4 → doc1 shard0 off0,
    // doc2 shard0 off3 (overflows), doc3 shard1 off6%4=2
    val df = Seq(
      (1L, "s1", "t t t"), (2L, "s1", "t t t"), (3L, "s1", "t t t"),
      (9L, "s2", "u u"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.packShards(df, budget = 4L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("shard_id"), r.getAs[Long]("offset_tokens")))).toMap
    assert(out(1L) == ((0L, 0L)))
    assert(out(2L) == ((0L, 3L)))
    assert(out(3L) == ((1L, 2L)))
    assert(out(9L) == ((0L, 0L))) // sources pack independently
  }

  test("packShards two-pass prefix sum == global window, incl. one giant source") {
    // the 100 TB shape the two-pass exists for: ONE source dominating the
    // corpus. Assignment must be bit-identical to the serial window form
    // across many range partitions, and the heavy window must partition
    // by the range-partition id, not the (single) source.
    val giant = spark.range(0, 5000).selectExpr(
      "id AS doc_id",
      "CASE WHEN id % 50 = 0 THEN 'rare' ELSE 'web' END AS source",
      // 1-6 tokens, deterministic in id
      "repeat('t ', CAST(id % 6 + 1 AS INT)) AS text")
    val twoPass = TextAnalysis.packShards(giant, budget = 64L)
    val oneWindow = TextAnalysis.packShardsGlobalWindow(giant, budget = 64L)
    assert(twoPass.exceptAll(oneWindow).isEmpty && oneWindow.exceptAll(twoPass).isEmpty,
      "two-pass assignment diverged from the global-window baseline")
    val plan = twoPass.queryExecution.executedPlan.toString
    assert(plan.contains("__pid"),
      s"two-pass plan lost its range-partition-id windowing:\n$plan")
  }

  test("selectTokenBudget: gate-passing docs jump the queue, greedy " +
    "fill-then-spill at the budget boundary") {
    // d1..d3 fail the gate (too_short, rep 0) → priority order is doc_id;
    // d9 PASSES the gate (32 tokens, high stopword ratio) so it fills
    // the budget FIRST despite the largest doc_id
    val passing = "the cat sat on the mat and the dog ran to the park " +
      "with a ball while the sun was up over the hill and a bird flew " +
      "by in the morning"
    val df = Seq(
      (1L, "a b c"), (2L, "d e f"), (3L, "g h i"),
      (9L, passing))
      .toDF("doc_id", "text").withColumn("source", lit("s"))
    val gate = TextAnalysis.qualityGate(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep")).toMap
    assert(gate == Map(1L -> false, 2L -> false, 3L -> false, 9L -> true))
    val out = TextAnalysis.selectTokenBudget(df, budget = 39L).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("before_tokens"), r.getAs[Boolean]("selected"))).toMap
    // d9 (32 tokens) first: before 0; then d1 before 32, d2 before 35,
    // d3 before 38 — all under 39; shrink the budget to expose the cut:
    // rerun at 36 — d3 (before 38) must drop while d2 (before 35) stays
    assert(out(9L) == (0L, true) && out(1L) == (32L, true) &&
      out(2L) == (35L, true) && out(3L) == (38L, true))
    val cut = TextAnalysis.selectTokenBudget(df, budget = 36L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("selected")).toMap
    assert(cut(9L) && cut(1L) && cut(2L) && !cut(3L))
  }

  test("selectTokenBudget two-pass prefix sum == global window, incl. " +
    "one giant source") {
    // same 100 TB shape as the packShards equivalence: one dominant
    // source must not serialize the priority prefix sum into one task
    val giant = spark.range(0, 5000).selectExpr(
      "id AS doc_id",
      "CASE WHEN id % 50 = 0 THEN 'rare' ELSE 'web' END AS source",
      "repeat('t ', CAST(id % 6 + 1 AS INT)) AS text")
    val twoPass = TextAnalysis.selectTokenBudget(giant, budget = 64L)
    val oneWindow = TextAnalysis.selectTokenBudgetGlobalWindow(giant, budget = 64L)
    assert(twoPass.exceptAll(oneWindow).isEmpty &&
      oneWindow.exceptAll(twoPass).isEmpty,
      "two-pass admission diverged from the global-window baseline")
    val plan = twoPass.queryExecution.executedPlan.toString
    assert(plan.contains("__pid"),
      s"two-pass plan lost its range-partition-id windowing:\n$plan")
  }

  test("mixEpochPlan: exact integer recipe — tempered targets, div/mod " +
    "epoch decomposition, milli repeat factor") {
    // s1: 8 tokens available, s2: 2 → p6 = floor(sqrt·1e6+0.5) =
    // 2828427 / 1414214, tot 4242641; at budget 100:
    //   s1 target = 100·2828427 div tot = 66 → 8 epochs rem 2, 8.250×
    //   s2 target = 100·1414214 div tot = 33 → 16 epochs rem 1, 16.500×
    val df = Seq((1L, "a b c d", "s1"), (2L, "e f g h", "s1"),
      (3L, "i j", "s2")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.mixEpochPlan(df, totalBudget = 100L).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("avail_tokens"), r.getAs[Long]("target_tokens"),
          r.getAs[Long]("full_epochs"), r.getAs[Long]("rem_tokens"),
          r.getAs[Long]("repeat_milli"))).toMap
    assert(out("s1") == ((8L, 66L, 8L, 2L, 8250L)))
    assert(out("s2") == ((2L, 33L, 16L, 1L, 16500L)))
    // floor rounding never over-allocates the budget
    assert(out.values.map(_._2).sum <= 100L)
  }

  test("materializeEpochs: full passes fan out 0..F-1, the remainder " +
    "pass admits the selectTokenBudget priority prefix at epoch F") {
    // the mixEpochPlan fixture: s1 avail 8 → target 66 → F=8 rem=2;
    // s2 avail 2 → target 33 → F=16 rem=1. All docs fail the gate
    // (too_short, pk=1) with rep_ratio 0, so remainder priority is pure
    // doc_id order: s1 admits doc 1 (before 0 < 2), rejects doc 2
    // (before 4); s2 admits doc 3 (before 0 < 1).
    val df = Seq((1L, "a b c d", "s1"), (2L, "e f g h", "s1"),
      (3L, "i j", "s2")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.materializeEpochs(df, totalBudget = 100L)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("epoch")))
    assert(out.length == 2 * 8 + 1 + 16 + 1) // Σ F·n_src + remainder docs
    val byDoc = out.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byDoc(1L) == (0L to 8L).toSeq)  // 8 full passes + remainder
    assert(byDoc(2L) == (0L to 7L).toSeq)  // full passes only
    assert(byDoc(3L) == (0L to 16L).toSeq) // 16 full passes + remainder
  }

  test("packEfficiency: fill ppm, overflow shards and oversize-doc " +
    "shard-id skips all surface in the per-source audit") {
    // s1: two 5-token docs at budget 8 → ONE occupied shard of mass 10
    //     (the one-doc spill) → fill 10e6/8 = 1_250_000 ppm, 1 overflow;
    // s2: a 20-token OVERSIZE doc (whole in shard 0) then a 2-token doc
    //     at prefix 20 → shard 2 — shard id 1 is skipped, occupied = 2
    val df = Seq(
      (1L, "a b c d e", "s1"), (2L, "f g h i j", "s1"),
      (3L, Seq.fill(20)("x").mkString(" "), "s2"), (4L, "y z", "s2"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.packEfficiency(
        TextAnalysis.packShards(df, budget = 8L), budget = 8L)
      .collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("n_shards"), r.getAs[Long]("n_docs"),
          r.getAs[Long]("total_tokens"), r.getAs[Long]("fill_ppm"),
          r.getAs[Long]("n_overflow_shards"),
          r.getAs[Long]("max_shard_tokens"))).toMap
    assert(out("s1") == ((1L, 2L, 10L, 1250000L, 1L, 10L)))
    assert(out("s2") == ((2L, 2L, 22L, 1375000L, 1L, 20L)))
  }

  test("epochManifestAudit: realized mass covers the target with at most " +
    "one-document overflow; a zero-target plan source reports a zero " +
    "row, not a missing row") {
    // s1: two 4-token docs (avail 8); s2: one 1-token doc (avail 1);
    // budget 3 → targets 2 / 0 (µ-int tempered shares) → s1 admits one
    // overflowing doc (realized 4, overflow 2 < its 4 tokens), s2 is
    // planned to zero and must still report
    val df = Seq((1L, "a b c d", "s1"), (2L, "e f g h", "s1"),
      (3L, "i", "s2")).toDF("doc_id", "text", "source")
    val plan = TextAnalysis.mixEpochPlan(df, totalBudget = 3L)
    val manifest = TextAnalysis.materializeEpochs(df, totalBudget = 3L)
    val audit = TextAnalysis.epochManifestAudit(manifest, plan).collect()
      .map(r => r.getAs[String]("source") ->
        (r.getAs[Long]("target_tokens"), r.getAs[Long]("realized_tokens"),
          r.getAs[Long]("overflow_tokens"), r.getAs[Long]("n_rows"),
          r.getAs[Long]("n_remainder_docs"))).toMap
    assert(audit.keySet == Set("s1", "s2"))
    assert(audit("s1") == ((2L, 4L, 2L, 1L, 1L)))
    assert(audit("s2") == ((0L, 0L, 0L, 0L, 0L)))
    // the certified invariant: 0 <= overflow < the spilling doc's size
    assert(audit.values.forall { case (_, _, ov, _, _) =>
      ov >= 0L && ov < 4L })
  }

  test("packEpochSequences: sequences never cross epochs, token mass " +
    "conserves per epoch, the per-epoch seeded shuffle reorders, and " +
    "the two-pass form equals the serial baseline") {
    // hand-built manifest: 6 docs × 2 epochs, 100-token docs, seqLen 128
    val manifest = (for (e <- 0L to 1L; d <- 1L to 6L)
      yield (d, s"s${d % 2}", 100, e)).toDF("doc_id", "source", "n_tokens", "epoch")
    val out = TextAnalysis.packEpochSequences(manifest, seqLen = 128L)
    val rows = out.collect()
    // epoch column carried; Σ seg_tokens per epoch == Σ manifest tokens
    val perEpoch = rows.groupBy(_.getAs[Long]("epoch"))
      .view.mapValues(_.map(_.getAs[Long]("seg_tokens")).sum).toMap
    assert(perEpoch == Map(0L -> 600L, 1L -> 600L))
    // every non-final sequence in an epoch is exactly full
    rows.groupBy(r => (r.getAs[Long]("epoch"), r.getAs[Long]("seq_id")))
      .foreach { case ((e, sid), segs) =>
        val tot = segs.map(_.getAs[Long]("seg_tokens")).sum
        val lastSeq = (600 - 1) / 128 // 4
        assert(if (sid < lastSeq) tot == 128L else tot == 600L - 128L * lastSeq,
          s"epoch $e seq $sid holds $tot tokens")
      }
    // the seeded shuffle really reorders between epochs: the doc order
    // along the stream (by doc_offset==0 rows' start = seq_id*128 +
    // seq_offset) must differ epoch 0 vs epoch 1
    def orderOf(e: Long): Seq[Long] = rows
      .filter(r => r.getAs[Long]("epoch") == e &&
        r.getAs[Long]("doc_offset") == 0L)
      .sortBy(r => r.getAs[Long]("seq_id") * 128L + r.getAs[Long]("seq_offset"))
      .map(_.getAs[Long]("doc_id")).toSeq
    assert(orderOf(0L).sorted == (1L to 6L) && orderOf(1L).sorted == (1L to 6L))
    assert(orderOf(0L) != orderOf(1L),
      s"per-epoch shuffle must reorder: ${orderOf(0L)} == ${orderOf(1L)}")
    // two-pass == serial baseline, row-exact
    val serial = TextAnalysis.packEpochSequencesGlobalWindow(manifest, 128L)
    assert(out.exceptAll(serial).isEmpty && serial.exceptAll(out).isEmpty,
      "two-pass epoch packing diverged from the serial baseline")
  }

  test("corpusDiff: every status arm classified, new side wins the " +
    "source for changed docs, absent sides read NULL tokens") {
    val a = Seq((1L, "x y", "s1"), (2L, "a b c", "s1"), (3L, "k", "s2"))
      .toDF("doc_id", "text", "source")
    val b = Seq((2L, "a b c", "s1"), (3L, "k edited", "s9"),
      (4L, "new doc", "s3")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.corpusDiff(a, b).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("status"), r.getAs[String]("source"),
          Option(r.getAs[java.lang.Integer]("old_tokens")),
          Option(r.getAs[java.lang.Integer]("new_tokens")))).toMap
    assert(out.size == 4)
    assert(out(1L) == (("removed", "s1", Some(2), None)))
    assert(out(2L) == (("unchanged", "s1", Some(3), Some(3))))
    assert(out(3L) == (("changed", "s9", Some(1), Some(2))))
    assert(out(4L) == (("added", "s3", None, Some(2))))
  }

  test("corpusDiff: NULL-text rows diff by ROW presence, not hash " +
    "nullability (ADVICE r18)") {
    // doc 1: NULL text present only in OLD → removed (not 'added');
    // doc 2: NULL → text edit → changed (not 'added');
    // doc 3: text → NULL edit → changed (not 'removed');
    // doc 4: NULL on BOTH sides → unchanged
    val a = Seq((1L, null: String, "s1"), (2L, null: String, "s1"),
      (3L, "x y", "s1"), (4L, null: String, "s2"))
      .toDF("doc_id", "text", "source")
    val b = Seq((2L, "now text", "s1"), (3L, null: String, "s1"),
      (4L, null: String, "s2")).toDF("doc_id", "text", "source")
    val out = TextAnalysis.corpusDiff(a, b).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("status")).toMap
    assert(out == Map(1L -> "removed", 2L -> "changed", 3L -> "changed",
      4L -> "unchanged"))
  }

  test("mixEpochPlan: empty / all-NULL-text corpus returns the empty " +
    "typed frame, no NPE (ADVICE r18)") {
    val empty = Seq.empty[(Long, String, String)]
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.mixEpochPlan(empty)
    assert(out.columns.toSeq == Seq("source", "avail_tokens",
      "target_tokens", "full_epochs", "rem_tokens", "repeat_milli"))
    assert(out.count() == 0L)
    val allNull = Seq((1L, null: String, "s1"), (2L, null: String, "s2"))
      .toDF("doc_id", "text", "source")
    assert(TextAnalysis.mixEpochPlan(allNull).count() == 0L)
  }

  test("hashedLinearScore: matches a Scala re-derivation; weights broadcast") {
    // independent re-derivation of the stub model in plain Scala — the
    // operator must agree doc-for-doc, and the plan must broadcast the
    // weight table (never shuffle the corpus against it)
    def hex8(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    def weight(b: Long): Long = hex8(s"w:$b") % 2001 - 1000
    def score(text: String): (Long, Double) = {
      val toks = text.split(" ", -1)
      val sw = toks.map(t => weight(hex8(t) % 4096)).sum
      (toks.length.toLong,
        math.rint(sw.toDouble / (toks.length * 1000.0) * 1e6) / 1e6)
    }
    val df = Seq(
      (1L, "the quick brown fox"), (2L, "the the the"),
      (3L, "lorem ipsum dolor sit amet"), (4L, "x"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.hashedLinearScore(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("logit"),
          r.getAs[Boolean]("keep")))).toMap
    for ((id, text) <- Seq(1L -> "the quick brown fox", 2L -> "the the the",
        3L -> "lorem ipsum dolor sit amet", 4L -> "x")) {
      val (n, s) = score(text)
      assert(out(id) == ((n, s, s >= 0.0)), s"doc $id: got ${out(id)}, want ($n, $s)")
    }
    val plan = TextAnalysis.hashedLinearScore(df)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"weight-table join must broadcast:\n$plan")
  }

  test("quality/lang rollups: drilldown totals reconcile with the corpus") {
    // the two audit rollups are set partitions of the corpus — their
    // counts must sum exactly to the doc count, per source and per lang
    val sf = "/root/testdata/sf0.001"
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val bySource = graft.queries.DataPipelineQueries
      .qualityBySource(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(bySource.map(_._3).sum == docs.count())
    val perSource = bySource.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val wantSource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSource.toMap == wantSource)
    val conf = graft.queries.DataPipelineQueries
      .langConfusion(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(conf.map(_._3).sum == docs.count())
    val perLang = conf.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val wantLang = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perLang.toMap == wantLang)
    // NOTE deliberately no diagonal-dominance assertion: the synthetic
    // corpus's lang column is metadata uncorrelated with the generated
    // token stream, and surfacing exactly that label/content mismatch is
    // the audit's purpose. Classifier accuracy itself is pinned on
    // crafted fixtures in the langId tests above.
    assert(conf.map(_._2).distinct.length > 1,
      s"degenerate predictions: ${conf.toSeq}")
    // embedding coverage is a partition of the corpus too, and each
    // source's embedded count can never exceed its doc count
    val cov = graft.queries.DataPipelineQueries
      .embeddingCoverage(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(cov.map(_._2).sum == docs.count())
    assert(cov.forall { case (_, n, e, ppm) =>
      e <= n && ppm == e * 1000000L / n })
  }

  test("dsirWeights: matches a Scala re-derivation; target docs rank higher") {
    // independent re-derivation of the hashed-unigram DSIR models in
    // plain Scala; docs 1-2 share the target vocabulary, 3-4 are alien —
    // the operator must reproduce every weight and rank 1-2 above 3-4
    def hex8(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val corpus = Seq(
      1L -> "alpha beta gamma alpha", 2L -> "beta gamma gamma delta",
      3L -> "zork quux blarg", 4L -> "quux quux blarg zork zork")
    val targetIds = Set(1L, 2L)
    val b = 1024
    def buckets(text: String): Seq[Long] =
      text.split(" ", -1).toSeq.map(t => hex8(t) % b)
    val tc = corpus.filter(c => targetIds(c._1))
      .flatMap(c => buckets(c._2)).groupBy(identity).view.mapValues(_.size)
    val rc = corpus.flatMap(c => buckets(c._2))
      .groupBy(identity).view.mapValues(_.size)
    val tT = tc.values.sum; val rT = rc.values.sum
    def lr(bk: Long): Double =
      math.log((tc.getOrElse(bk, 0) + 1).toDouble / (tT + b)) -
        math.log((rc(bk) + 1).toDouble / (rT + b))
    def want(text: String): (Long, Double, Double) = {
      val bs = buckets(text)
      val s = bs.map(lr).sum
      (bs.size.toLong, math.rint(s * 1e6) / 1e6,
        math.rint(s / bs.size * 1e6) / 1e6)
    }
    val df = corpus.toDF("doc_id", "text")
    val out = TextAnalysis.dsirWeights(df,
      Seq(1L, 2L).toDF("doc_id"), nBuckets = b).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Double]("log_ratio"),
          r.getAs[Double]("avg_log_ratio")))).toMap
    for ((id, text) <- corpus)
      assert(out(id) == want(text), s"doc $id: got ${out(id)}, want ${want(text)}")
    assert(Seq(1L, 2L).map(out(_)._3).min > Seq(3L, 4L).map(out(_)._3).max,
      s"target-like docs must out-score alien docs: $out")
    val plan = TextAnalysis.dsirWeights(df, Seq(1L).toDF("doc_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"model join must broadcast:\n$plan")
  }

  test("hashedLinearScoreStateless == batch operator row-for-row, " +
    "stub and trained weights alike") {
    // the per-row fold over the typedlit weight array must reproduce the
    // broadcast-join batch scores exactly (same longs, exact addition)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(300)
    val trained = TextAnalysis.trainNbWeights(docs, col("lang") === "en")
    for (w <- Seq(None, Some(trained))) {
      val batch = TextAnalysis.hashedLinearScore(docs, weights = w).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
        .toSet
      val stateless = TextAnalysis.hashedLinearScoreStateless(docs, weights = w)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
        .toSet
      assert(batch.nonEmpty)
      assert(stateless == batch,
        s"weights=${w.isDefined}: only-stateless=${stateless -- batch} " +
          s"only-batch=${batch -- stateless}")
    }
  }

  // --- trained-NB fixture: two genuinely disjoint class vocabularies
  // (plus shared stopwords), token choice hash-diversified so every doc
  // is distinct (a rank statistic over 10 repeated texts would be
  // degenerate) ---
  private def nbMd5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def nbHex8(s: String): Long =
    java.lang.Long.parseLong(nbMd5hex(s).take(8), 16)
  private def nbFixtureText(id: Long): String = (0 until 12).map { j =>
    if (j % 4 == 3) Vector("the", "of")(((id + j) % 2).toInt)
    else {
      val v = if (id % 2 == 0)
        Vector("alpha", "beta", "gamma", "delta", "epsilon")
      else Vector("zero", "uno", "dos", "tres", "quatro")
      v((nbHex8(s"$id:$j") % v.size).toInt)
    }
  }.mkString(" ")

  test("trainNbWeights: matches a Scala re-derivation; the scoring plan " +
    "shape does not change when weights swap") {
    // independent plain-Scala replay of the NB fit: same hash-ordered
    // LIMIT sample, same bucket counts, same µ-int log-odds grid
    def md5hex(s: String): String = nbMd5hex(s)
    def hex8(s: String): Long = nbHex8(s)
    def text(id: Long): String = nbFixtureText(id)
    val rows = (0L until 120L).map(i => (i, text(i)))
    val df = rows.toDF("doc_id", "text")
    val nB = 4096
    val got = TextAnalysis.trainNbWeights(df, col("doc_id") % 2 === 0,
      nBuckets = nB, trainN = 64)
    // re-derive
    val trainIds = rows.map(_._1).sortBy(i => (md5hex(s"qcls:$i"), i)).take(64)
    val ct = new Array[Long](nB); val cn = new Array[Long](nB)
    trainIds.foreach { i =>
      val pos = i % 2 == 0
      text(i).split(" ", -1).foreach { tok =>
        val b = (hex8(tok) % nB).toInt
        if (pos) ct(b) += 1 else cn(b) += 1
      }
    }
    val t = ct.sum; val n = cn.sum
    val want = Array.tabulate(nB) { b =>
      math.floor(1e6 * math.log(
        ((ct(b) + 1) * (n + nB)).toDouble / ((cn(b) + 1) * (t + nB))) + 0.5).toLong
    }
    assert(got.toSeq == want.toSeq,
      s"weight mismatch at buckets ${got.indices.filter(i => got(i) != want(i)).take(5)}")
    // plan shape invariance: trained weights swap in as data, not plan
    def shape(w: Option[Array[Long]]): Seq[String] =
      TextAnalysis.hashedLinearScore(df, weights = w)
        .queryExecution.executedPlan.toString.linesIterator
        .map(_.dropWhile(!_.isLetter).takeWhile(_.isLetter)).toSeq
    assert(shape(Some(got)) == shape(None),
      "scoring plan changed when trained weights swapped in")
    assert(shape(Some(got)).exists(_.contains("BroadcastHashJoin")))
  }

  test("classifierEval: trained NB separates a signal-bearing corpus " +
    "(held-out AUC ≈ 1); the real-corpus labels are a measured null") {
    // the fixture has genuinely disjoint class vocabularies — the
    // trainer must find them: held-out AUC ≈ 1 with a positive mean gap.
    // (The registered corpus receipt is the honest complement: testdata
    // langs share one token distribution, so AUC reads ≈ 0.5 there —
    // recorded in BASELINE.md, the r13 spherical-training convention.)
    val df = (0L until 120L).map(i => (i, nbFixtureText(i))).toDF("doc_id", "text")
    val isPos = col("doc_id") % 2 === 0
    val w = TextAnalysis.trainNbWeights(df, isPos, trainN = 64)
    val ev = TextAnalysis.classifierEval(df, isPos, trainN = 64,
      weights = Some(w)).collect()
    assert(ev.length == 1)
    val r = ev(0)
    assert(r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg") == 120 - 64)
    assert(r.getAs[Double]("auc") >= 0.99, s"auc=${r.getAs[Double]("auc")}")
    assert(r.getAs[Double]("mean_logit_pos") > 0.0 &&
      r.getAs[Double]("mean_logit_neg") < 0.0,
      s"gap: ${r.getAs[Double]("mean_logit_pos")} vs ${r.getAs[Double]("mean_logit_neg")}")
    // the UNTRAINED stub on the same fixture: no separation (the null
    // model the receipt measures against)
    val stub = TextAnalysis.classifierEval(df, isPos, trainN = 64).collect()(0)
    assert(math.abs(stub.getAs[Double]("auc") - 0.5) < 0.25,
      s"stub auc=${stub.getAs[Double]("auc")} should be ≈ 0.5")
  }

  test("classifierEval: distributed two-pass AUC ≡ the global-window form " +
    "(values must not move), and the default plans no partition-less window") {
    // the packShards equivalence precedent: the r20 two-pass rewrite may
    // only change the PLAN — every output cell must match the serial
    // one-window baseline exactly (all terms are exact int64s, so the
    // partition regrouping is value-identical by construction; this pins
    // the construction)
    val df = (0L until 150L).map(i => (i, nbFixtureText(i))).toDF("doc_id", "text")
    val isPos = col("doc_id") % 2 === 0
    val w = TextAnalysis.trainNbWeights(df, isPos, trainN = 64)
    for (wts <- Seq(None, Some(w))) {
      val twoPass = TextAnalysis.classifierEval(df, isPos, trainN = 64,
        weights = wts).collect()
      val serial = TextAnalysis.classifierEvalGlobalWindow(df, isPos,
        trainN = 64, weights = wts).collect()
      assert(twoPass.map(_.toSeq).toSeq == serial.map(_.toSeq).toSeq,
        s"two-pass AUC diverged from the global-window baseline (weights=$wts)")
    }
    // plan discipline: the default form must carry NO empty-partition
    // window (the global baseline exists only as this test's oracle)
    val ev = TextAnalysis.classifierEval(df, isPos, trainN = 64,
      weights = Some(w))
    ev.collect()
    val plan = ev.queryExecution.executedPlan.toString
    // the serial baseline's signature is a Window whose spec carries only
    // an ORDER BY; the two-pass form windows over (__pid, __s)
    assert(!plan.contains("Window [") ||
      plan.linesIterator.filter(_.contains("Window ["))
        .forall(_.contains("__pid")),
      s"classifierEval plans a window not keyed by __pid:\n$plan")
  }

  test("trainLrWeights: logistic fit separates the signal fixture at " +
    "least as well as NB; stateless twin row-exact; plan unchanged") {
    val df = (0L until 120L).map(i => (i, nbFixtureText(i))).toDF("doc_id", "text")
    val isPos = col("doc_id") % 2 === 0
    val nb = TextAnalysis.trainNbWeights(df, isPos, trainN = 64)
    val lrW = TextAnalysis.trainLrWeights(df, isPos, trainN = 64)
    val nbAuc = TextAnalysis.classifierEval(df, isPos, trainN = 64,
      weights = Some(nb)).collect()(0).getAs[Double]("auc")
    val ev = TextAnalysis.classifierEval(df, isPos, trainN = 64,
      weights = Some(lrW)).collect()(0)
    val lrAuc = ev.getAs[Double]("auc")
    assert(lrAuc >= nbAuc, s"LR auc=$lrAuc < NB auc=$nbAuc")
    assert(lrAuc >= 0.99, s"LR auc=$lrAuc")
    assert(ev.getAs[Double]("mean_logit_pos") > 0.0 &&
      ev.getAs[Double]("mean_logit_neg") < 0.0)
    // the LR model deploys through the SAME operator: stateless
    // (ingest-time) twin row-exact against the batch scorer
    val batch = TextAnalysis.hashedLinearScore(df, weights = Some(lrW))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val stateless = TextAnalysis.hashedLinearScoreStateless(df,
      weights = Some(lrW))
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(batch == stateless)
    // plan-shape invariance: an LR model swaps in as data, like NB
    def shape(w: Option[Array[Long]]): Seq[String] =
      TextAnalysis.hashedLinearScore(df, weights = w)
        .queryExecution.executedPlan.toString.linesIterator
        .map(_.dropWhile(!_.isLetter).takeWhile(_.isLetter)).toSeq
    assert(shape(Some(lrW)) == shape(Some(nb)))
    // epoch monotonicity on the fixture: more epochs keep separating
    // (full-batch GD with this lr does not oscillate here) and epoch 1
    // already carries the discriminative direction
    val oneEpoch = TextAnalysis.trainLrWeights(df, isPos, trainN = 64,
      epochs = 1)
    val oneAuc = TextAnalysis.classifierEval(df, isPos, trainN = 64,
      weights = Some(oneEpoch)).collect()(0).getAs[Double]("auc")
    assert(oneAuc >= 0.99, s"epoch-1 auc=$oneAuc")
  }

  test("packSequences: cross-boundary segments, offsets, zero-token docs vanish") {
    // global stream in (source, doc_id) order with seqLen=4:
    //   (a,1) 3 toks  → span [0,3)   : seq0 off0, doc_off0, len3
    //   (a,2) 6 toks  → span [3,9)   : seq0 off3 len1 | seq1 off0 len4 | seq2 off0 len1
    //   (b,3) 0 toks  → no segments (empty text still yields 1 token; use null filter)
    //   (b,4) 2 toks  → span [9,11)  : seq2 off1, doc_off0, len2
    val df = Seq(
      (1L, "a", "t t t"), (2L, "a", "t t t t t t"), (4L, "b", "u u"))
      .toDF("doc_id", "source", "text")
    val out = TextAnalysis.packSequences(df, seqLen = 4L).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("seq_id")) ->
        ((r.getAs[Long]("seq_offset"), r.getAs[Long]("doc_offset"),
          r.getAs[Long]("seg_tokens")))).toMap
    assert(out((1L, 0L)) == ((0L, 0L, 3L)))
    assert(out((2L, 0L)) == ((3L, 0L, 1L)))
    assert(out((2L, 1L)) == ((0L, 1L, 4L)))
    assert(out((2L, 2L)) == ((0L, 5L, 1L)))
    assert(out((4L, 2L)) == ((1L, 0L, 2L)))
    assert(out.size == 5)
    // conservation: segments of each doc sum to its token count
    val perDoc = out.toSeq.groupBy(_._1._1).view.mapValues(_.map(_._2._3).sum)
    assert(perDoc(1L) == 3L && perDoc(2L) == 6L && perDoc(4L) == 2L)
    // every full sequence holds exactly seqLen tokens
    val perSeq = out.toSeq.groupBy(_._1._2).view.mapValues(_.map(_._2._3).sum)
    assert(perSeq(0L) == 4L && perSeq(1L) == 4L && perSeq(2L) == 3L)
  }

  test("packSequences two-pass prefix sum == global window, incl. boundary spans") {
    // same 100 TB shape as the packShards equivalence: the global stream
    // must not serialize into one window task; assignment (including
    // docs straddling many sequence boundaries) bit-identical to the
    // serial form
    val giant = spark.range(0, 5000).selectExpr(
      "id AS doc_id",
      "CASE WHEN id % 50 = 0 THEN 'rare' ELSE 'web' END AS source",
      "repeat('t ', CAST(id % 23 + 1 AS INT)) AS text")
    val twoPass = TextAnalysis.packSequences(giant, seqLen = 16L)
    val oneWindow = TextAnalysis.packSequencesGlobalWindow(giant, seqLen = 16L)
    assert(twoPass.exceptAll(oneWindow).isEmpty && oneWindow.exceptAll(twoPass).isEmpty,
      "two-pass segment map diverged from the global-window baseline")
    val plan = twoPass.queryExecution.executedPlan.toString
    assert(plan.contains("__pid"),
      s"two-pass plan lost its range-partition-id windowing:\n$plan")
  }

  test("lengthPercentileGate: exact ranks, keep bounds, singleton source") {
    val df = spark.range(0, 21).selectExpr(
      "id AS doc_id",
      "CASE WHEN id = 20 THEN 'solo' ELSE 'web' END AS source",
      // token counts 1..20 for web (unique per doc), 3 for solo
      "CASE WHEN id = 20 THEN 'a b c' " +
        "ELSE repeat('t ', CAST(id + 1 AS INT)) END AS text")
    val out = TextAnalysis.lengthPercentileGate(df, pLow = 0.1, pHigh = 0.9)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getDouble(3), r.getBoolean(4))).toMap
    // web: 20 docs, pr = rank/19; doc 0 (shortest) pr=0 dropped,
    // doc 19 (longest) pr=1 dropped, doc 2 has rank 2 → pr 2/19 ≈ .105 kept
    assert(out(0L) == (("web", 0.0, false)))
    assert(out(19L) == (("web", 1.0, false)))
    assert(out(2L)._2 == math.rint(2.0 / 19 * 1e6) / 1e6 && out(2L)._3)
    // a single-doc source has no distribution: pr = 0, dropped at pLow > 0
    assert(out(20L) == (("solo", 0.0, false)))
  }

  test("lengthPercentileGate two-pass rank == global window, incl. one giant source") {
    // same 100 TB shape as the packShards equivalence: one dominant
    // source must not serialize the rank chain, and the distributed
    // base+row_number must equal percent_rank exactly
    val giant = spark.range(0, 5000).selectExpr(
      "id AS doc_id",
      "CASE WHEN id % 50 = 0 THEN 'rare' ELSE 'web' END AS source",
      "repeat('t ', CAST(id % 6 + 1 AS INT)) AS text")
    val twoPass = TextAnalysis.lengthPercentileGate(giant)
    val oneWindow = TextAnalysis.lengthPercentileGateGlobalWindow(giant)
    assert(twoPass.exceptAll(oneWindow).isEmpty && oneWindow.exceptAll(twoPass).isEmpty,
      "two-pass percentile diverged from the global-window baseline")
    val plan = twoPass.queryExecution.executedPlan.toString
    assert(plan.contains("__pid"),
      s"two-pass plan lost its range-partition-id windowing:\n$plan")
  }

  test("langId: marker words pick the language; no markers → und; ties → precedence") {
    val out = TextAnalysis.langId(docsDF(
      1L -> "the cat and the dog",
      2L -> "der hund und die katze ist",
      3L -> "le chat et les chiens des",
      4L -> "xyzzy plugh quux",
      5L -> "the der"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang")).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "fr")
    assert(out(4L) == "und")
    assert(out(5L) == "en") // 1-1 tie: declaration order wins
  }

  // deterministic multilingual fixture for the TRAINED lang id: five
  // language-distinct word pools (incl. a Han-script one — the
  // mixed-script case the marker heuristic cannot see at all), word
  // order varying per doc so the trigram distribution, not memorized
  // strings, carries the signal
  private val lidPools: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "quick", "brown", "fox", "jumps", "over", "lazy",
      "dog", "and", "of"),
    "de" -> Seq("der", "schnelle", "braune", "fuchs", "springt", "über",
      "den", "faulen", "hund", "und"),
    "fr" -> Seq("le", "renard", "brun", "rapide", "saute", "par",
      "dessus", "chien", "paresseux", "et"),
    "es" -> Seq("el", "zorro", "marrón", "rápido", "salta", "sobre",
      "perro", "perezoso", "y", "una"),
    "zh" -> Seq("敏捷的", "棕色狐狸", "跳过了", "懒惰的", "狗和猫",
      "在公园", "里奔跑", "追逐着", "一只鸟", "快乐地"))

  private def lidFixture = (0L until 150L).map { i =>
    val lang = TextAnalysis.LangIdLangs((i % 5).toInt)
    val pool = lidPools(lang)
    val words = (0 until 20).map(j => pool(((i * 7 + j * 13) % 10).toInt))
    (i, words.mkString(" "), lang)
  }.toDF("doc_id", "text", "lang")

  test("trained lang id: diagonal mass beats the marker heuristic on the " +
    "mixed-script fixture; stateless twin row-exact; <3 chars → und") {
    val fix = lidFixture
    val w = TextAnalysis.trainLangIdWeights(fix, trainN = 64)
    val trained = TextAnalysis.langIdTrained(fix, weights = Some(w))
      .select("doc_id", "predicted_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val marker = TextAnalysis.langId(fix)
      .select("doc_id", "predicted_lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val labels = fix.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def diag(pred: Map[Long, String]): Double =
      labels.count { case (id, l) => pred(id) == l }.toDouble / labels.size
    val (dTrained, dMarker) = (diag(trained), diag(marker))
    // the marker set covers 4 of 5 languages and only 5 stopwords each;
    // the trained trigram NB must dominate it on this fixture — and be
    // near-perfect (the pools are genuinely disjoint distributions)
    assert(dTrained > dMarker,
      s"trained diagonal $dTrained !> marker $dMarker")
    assert(dTrained >= 0.9, s"trained diagonal $dTrained < 0.9")
    // ingest-time stateless twin: row-for-row equal to the batch scorer
    val batch = TextAnalysis.langIdTrained(fix, weights = Some(w))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val stateless = TextAnalysis.langIdTrainedStateless(fix, weights = w)
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    assert(batch == stateless, "stateless lang-id twin diverged from batch")
    // the und fallback: no trigram (short or NULL text) → 'und'
    val short = TextAnalysis.langIdTrained(
      Seq((200L, "ab", "en"), (201L, null.asInstanceOf[String], "en"))
        .toDF("doc_id", "text", "lang"),
      weights = Some(w)).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("predicted_lang"))
      .toMap
    assert(short(200L) == "und" && short(201L) == "und")
  }

  test("langIdMargin: the default gate keeps (nearly) all genuine-signal " +
    "predictions and routes label-random ones to und — the calibration " +
    "contrast the operator exists for") {
    // multilingual fixture: wide margins, everything routed through
    val fix = lidFixture
    val kept = TextAnalysis.langIdMargin(fix).collect()
    assert(kept.nonEmpty)
    val keptShare = kept.count(_.getAs[String]("routed_lang") != "und")
      .toDouble / kept.length
    assert(keptShare >= 0.95, s"fixture kept share $keptShare < 0.95")
    // margins are the top-2 gap of the µ-int means: non-negative when
    // present, and routed == predicted exactly when the gate clears
    kept.foreach { r =>
      val m = Option(r.getAs[java.lang.Long]("margin_micro")).map(_.toLong)
      m.foreach(v => assert(v >= 0, s"negative margin $v"))
      val routed = r.getAs[String]("routed_lang")
      val pred = r.getAs[String]("predicted_lang")
      assert(routed == "und" ||
        (routed == pred && m.exists(_ >= 500000L)), s"$pred/$routed/$m")
    }
    // label-random corpus: margins collapse, the gate routes to und
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val rnd = TextAnalysis.langIdMargin(corpus).collect()
    val rndKept = rnd.count(_.getAs[String]("routed_lang") != "und")
      .toDouble / rnd.length
    assert(rndKept <= 0.05,
      s"label-random corpus kept share $rndKept > 0.05 — gate not calibrated")
  }

  test("clusterSafeSplit: near-dup cluster members land in ONE split " +
    "(the canonical's), unclustered docs keep their hashSplit") {
    import org.apache.spark.sql.functions.col
    // find two texts whose independent hashSplit assignments DIFFER, so
    // the test can't pass by accident of equal hashes
    def splitOf(t: String): String = {
      val h2 = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString.take(2)
      if (h2 < "cd") "train" else if (h2 < "e6") "val" else "test"
    }
    val base = "alpha beta gamma delta epsilon zeta"
    val variant = (1 to 50).map(i => s"$base variant$i")
      .find(v => splitOf(v) != splitOf(base)).get
    val docs = Seq(
      (1L, base), (2L, variant),        // near-dups, different raw splits
      (10L, "lone wolf document one"), (11L, "another unclustered text"))
      .toDF("doc_id", "text")
    // membership as Dedup.clusters would emit it: canonical = min id
    val membership = Seq((1L, 1L, 2L, true), (2L, 1L, 2L, false))
      .toDF("doc_id", "cluster_id", "cluster_size", "is_canonical")
    val out = TextAnalysis.clusterSafeSplit(docs, membership).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (Option(r.getAs[java.lang.Long]("cluster_id")).map(_.toLong),
          r.getAs[String]("split"))).toMap
    assert(out.size == 4)
    // both cluster members take the CANONICAL's split — and would have
    // diverged without the operator (that's what `variant` guarantees)
    assert(out(1L)._2 == splitOf(base) && out(2L)._2 == splitOf(base))
    assert(splitOf(variant) != splitOf(base))
    assert(out(2L)._1.contains(1L))
    // unclustered docs: exactly hashSplit, null cluster_id
    for (id <- Seq(10L, 11L)) {
      val t = docs.filter(col("doc_id") === id).head().getString(1)
      assert(out(id) == (None, splitOf(t)))
    }
  }

  test("robustLengthGate: per-source outlier flagged, clean source " +
    "untouched, zero-MAD source keeps all with NULL robust_z") {
    def doc(id: Long, src: String, n: Long) =
      (id, s"text $id", src, n)
    // src-a: 11 docs around 1000 chars ±10 plus one 20k outlier;
    // src-b: clean; src-c: ALL identical lengths (MAD 0)
    val rows = (0 until 11).map(i => doc(i, "a", 1000L + i % 3 * 10)) ++
      Seq(doc(11, "a", 20000L)) ++
      (20 until 26).map(i => doc(i, "b", 500L + (i % 4) * 20)) ++
      (30 until 35).map(i => doc(i, "c", 777L))
    val out = TextAnalysis.robustLengthGate(
      rows.toDF("doc_id", "text", "source", "n_chars"), threshold = 3.5)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[String]("source"), Option(r.getAs[java.lang.Double]("robust_z")),
          r.getAs[Boolean]("keep"))).toMap
    assert(out.size == rows.size) // every doc emitted, flag not filter
    assert(!out(11L)._3 && out(11L)._2.exists(_ > 3.5)) // the outlier
    assert((0 until 11).forall(i => out(i.toLong)._3), "clean src-a docs kept")
    assert((20 until 26).forall(i => out(i.toLong)._3), "src-b untouched")
    (30 until 35).foreach { i =>
      assert(out(i.toLong)._3 && out(i.toLong)._2.isEmpty,
        s"zero-MAD doc $i should keep with NULL robust_z")
    }
  }
}
