package graft

import graft.similarity.Similarity
import graft.similarity.Similarity.PqConfig
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Differential KNOB fuzzing (r13): the registry proves 113 FIXED
 * configurations against the DuckDB oracle; the operators expose dozens
 * of knobs (m, k, rounds, nCells, nProbe, nQueries, topK, ...), and a
 * knob-dependent divergence — the r8 quality_classifier half-tie bug's
 * class — is invisible to any fixed-point gate. This suite draws ≥100
 * seeded-random knob settings and asserts ROW-EXACT parity between
 * INDEPENDENT implementations of the same semantics (DuckDB is not on
 * the test classpath — the driver's gate owns engine-vs-engine parity;
 * these are implementation-vs-implementation and
 * implementation-vs-driver-side-rederivation oracles):
 *
 *  1. plan-literal ADC vs broadcast-LUT-frame ADC ([[Similarity.adcTopK]]
 *     vs [[Similarity.adcTopKBatch]]) — two different physical
 *     strategies documented row-identical at every config;
 *  2. the same pair composed with the IVF coarse quantizer
 *     ([[Similarity.ivfPqTopK]] vs [[Similarity.ivfPqTopKBatch]]);
 *  3. full-width probing degenerates to exact search
 *     ([[Similarity.ivfHashTopK]] at nProbe = nCells vs
 *     [[Similarity.bruteForceTopK]]) — the composition invariant that
 *     catches any probe/assignment asymmetry;
 *  4. [[Similarity.productQuantize]] vs an independent driver-side
 *     Scala argmin over the SAME resolved codebook (round-to-6dp,
 *     smaller-cid ties — the oracle's argmin re-derived outside Spark);
 *  5. one-projection stateless ANN assignment
 *     ([[Similarity.annAssignStateless]]) vs the two split operators it
 *     fuses ([[Similarity.ivfCellAssignmentsAgainst]] cells +
 *     [[Similarity.productQuantizeWith]] codes).
 *
 * All draws run on a 120-row slice of the sf0.001 embeddings corpus —
 * big enough for non-trivial cells/codebooks, small enough that 100
 * configs stay in CI budget. The RNG seed is FIXED: a red run names its
 * config in the failure message and reproduces deterministically.
 */
class KnobFuzzSpec extends SparkSpec {

  private lazy val embs: DataFrame =
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .filter(col("vec_id") < 120)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  private val rnd = new scala.util.Random(20260814L)

  private def drawCfg(maxM: Int = 8): PqConfig = {
    val m = Seq(1, 2, 4, 8).filter(_ <= maxM)(rnd.nextInt(Seq(1, 2, 4, 8)
      .count(_ <= maxM)))
    // d2Seed drawn too (r14): every differential property below must
    // hold under the D²-seeded codebooks as well as the hash-sampled ones
    PqConfig(m = m, k = 2 + rnd.nextInt(15), dim = 64,
      salt = s"fz${rnd.nextInt(1000)}", rounds = rnd.nextInt(3),
      d2Seed = rnd.nextBoolean())
  }

  private def rowsOf(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private def assertSameRows(a: DataFrame, b: DataFrame, cfg: String): Unit = {
    val (ra, rb) = (rowsOf(a), rowsOf(b))
    assert(ra == rb,
      s"[$cfg] diverged: only-left=${(ra -- rb).take(3)} " +
        s"only-right=${(rb -- ra).take(3)} (|l|=${ra.size}, |r|=${rb.size})")
  }

  test("fuzz: semanticDedupCells equals a driver-side Scala " +
    "re-derivation at 12 random (nCells, rounds, threshold, cap) configs") {
    // the r18 SemDeDup family joins the knob-fuzz program: same
    // resolved centroids on both sides (property-4 discipline), the
    // DEDUP logic — rounded-cosine argmax assignment, occupancy cap,
    // smaller-id greedy eviction, (cos DESC, id ASC) best match —
    // re-derived independently in plain Scala
    val data = embs.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(_.toDouble).toArray)
      .sortBy(_._1)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dotA(a: Array[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    for (_ <- 1 to 12) {
      val nCells = 1 + rnd.nextInt(10)
      val rounds = rnd.nextInt(3)
      val tau = 0.2 + rnd.nextInt(7) * 0.1
      val cap = 1 + rnd.nextInt(50)
      val salt = s"fzs${rnd.nextInt(1000)}"
      val label = s"semdedup cells=$nCells rounds=$rounds tau=$tau cap=$cap"
      val cells = Similarity.ivfCells(embs, nCells, salt, rounds)
      val nrm = data.map { case (id, v) =>
        id -> math.sqrt(dotA(v, v.toIndexedSeq)) }.toMap
      val asg = data.map { case (id, v) =>
        id -> cells.map { case (cid, cv, cn) =>
          (r6(dotA(v, cv) / (nrm(id) * cn)), cid) }
          .maxBy { case (cc, cid) => (cc, -cid) }._2
      }.toMap
      val occ = asg.values.groupBy(identity).view.mapValues(_.size).toMap
      val small = data.filter { case (id, _) => occ(asg(id)) <= cap }
      val vec = data.toMap
      val pairs = for {
        (ia, va) <- small
        (ib, _) <- small
        if ia < ib && asg(ia) == asg(ib)
        den = nrm(ia) * nrm(ib)
        if den != 0
        c = r6(dotA(va, vec(ib).toIndexedSeq) / den)
        if c >= tau
      } yield (ib, ia, c)
      val best = pairs.groupBy(_._1).view.mapValues(
        _.minBy { case (_, kid, c) => (-c, kid) }).toMap
      val expected = data.map { case (id, _) =>
        best.get(id) match {
          case Some((_, kid, c)) => (id, asg(id), "dup", Some(kid), Some(c))
          case None => (id, asg(id), "keep",
            None: Option[Long], None: Option[Double])
        }
      }.toSet
      val got = Similarity.semanticDedupCells(embs, nCells = nCells,
          threshold = tau, salt = salt, rounds = rounds, maxCellSize = cap)
        .collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
          r.getAs[String]("verdict"),
          Option(r.getAs[java.lang.Long]("match_id")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("match_cosine")).map(_.toDouble)))
        .toSet
      assert(got == expected,
        s"[$label] only-spark=${(got -- expected).take(3)} " +
          s"only-scala=${(expected -- got).take(3)}")
    }
  }

  test("fuzz: semanticDedupIncremental equals a driver-side Scala " +
    "re-derivation at 10 random (nCells, rounds, threshold, cap, split) " +
    "configs") {
    // the ADMISSION form's own surface beyond the cells fuzz above: the
    // batch/corpus split, the cap applied to CORPUS-side occupancy only,
    // and one row per arrival (never per corpus member)
    val data = embs.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[scala.collection.Seq[Float]]("embedding")
          .map(_.toDouble).toArray)
      .sortBy(_._1)
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def dotA(a: Array[Double], b: Seq[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }
      s
    }
    for (_ <- 1 to 10) {
      val nCells = 1 + rnd.nextInt(10)
      val rounds = rnd.nextInt(3)
      val tau = 0.2 + rnd.nextInt(7) * 0.1
      val cap = 1 + rnd.nextInt(50)
      val mod = 3 + rnd.nextInt(8) // vec_id % mod == 0 plays the batch
      val salt = s"fzn${rnd.nextInt(1000)}"
      val label = s"semadmit cells=$nCells rounds=$rounds tau=$tau " +
        s"cap=$cap mod=$mod"
      val cells = Similarity.ivfCells(embs, nCells, salt, rounds)
      val nrm = data.map { case (id, v) =>
        id -> math.sqrt(dotA(v, v.toIndexedSeq)) }.toMap
      val asg = data.map { case (id, v) =>
        id -> cells.map { case (cid, cv, cn) =>
          (r6(dotA(v, cv) / (nrm(id) * cn)), cid) }
          .maxBy { case (cc, cid) => (cc, -cid) }._2
      }.toMap
      val (batch, corpus) = data.partition { case (id, _) => id % mod == 0 }
      val corpOcc = corpus.map(c => asg(c._1))
        .groupBy(identity).view.mapValues(_.size).toMap
      val corpSmall = corpus.filter { case (id, _) =>
        corpOcc(asg(id)) <= cap }
      val best = (for {
        (ib, vb) <- batch
        (ic, vc) <- corpSmall
        if asg(ib) == asg(ic)
        den = nrm(ib) * nrm(ic)
        if den != 0
        c = r6(dotA(vb, vc.toIndexedSeq) / den)
        if c >= tau
      } yield (ib, ic, c))
        .groupBy(_._1).view
        .mapValues(_.minBy { case (_, cid, c) => (-c, cid) }).toMap
      val expected = batch.map { case (id, _) =>
        best.get(id) match {
          case Some((_, cid, c)) => (id, asg(id), "dup", Some(cid), Some(c))
          case None => (id, asg(id), "new",
            None: Option[Long], None: Option[Double])
        }
      }.toSet
      val got = Similarity.semanticDedupIncremental(embs,
          col("vec_id") % mod === 0, nCells = nCells, threshold = tau,
          salt = salt, rounds = rounds, maxCellSize = cap)
        .collect()
        .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("cell"),
          r.getAs[String]("verdict"),
          Option(r.getAs[java.lang.Long]("match_id")).map(_.toLong),
          Option(r.getAs[java.lang.Double]("match_cosine")).map(_.toDouble)))
        .toSet
      assert(got == expected,
        s"[$label] only-spark=${(got -- expected).take(3)} " +
          s"only-scala=${(expected -- got).take(3)}")
    }
  }

  test("fuzz: literal-LUT ADC equals broadcast-LUT ADC at 25 random " +
    "(m, k, rounds, nQueries, topK) configs") {
    for (_ <- 1 to 25) {
      val cfg = drawCfg()
      val nQ = 1 + rnd.nextInt(10)
      val topK = 1 + rnd.nextInt(8)
      val label = s"adc cfg=$cfg nQ=$nQ topK=$topK"
      assertSameRows(
        Similarity.adcTopK(embs, nQueries = nQ, topK = topK, cfg = cfg),
        Similarity.adcTopKBatch(embs, nQueries = nQ, topK = topK, cfg = cfg),
        label)
    }
  }

  test("fuzz: literal-LUT IVF-PQ equals broadcast-LUT IVF-PQ at 25 random " +
    "(nCells, nProbe, ivfRounds, m, k, rounds, nQueries, topK) configs") {
    for (_ <- 1 to 25) {
      val cfg = drawCfg()
      val nCells = 1 + rnd.nextInt(20)
      val nProbe = 1 + rnd.nextInt(nCells)
      val ivfRounds = rnd.nextInt(3)
      val nQ = 1 + rnd.nextInt(10)
      val topK = 1 + rnd.nextInt(8)
      val salt = s"fzi${rnd.nextInt(1000)}"
      val label = s"ivfpq cfg=$cfg cells=$nCells probe=$nProbe " +
        s"ivfR=$ivfRounds nQ=$nQ topK=$topK"
      assertSameRows(
        Similarity.ivfPqTopK(embs, nQ, topK, nCells, nProbe, salt, cfg,
          ivfRounds = ivfRounds),
        Similarity.ivfPqTopKBatch(embs, nQ, topK, nCells, nProbe, salt, cfg,
          ivfRounds = ivfRounds),
        label)
    }
  }

  test("fuzz: IVF probing EVERY cell equals brute force at 20 random " +
    "(nCells, rounds, seeding, nQueries, k) configs") {
    for (_ <- 1 to 20) {
      val nCells = 1 + rnd.nextInt(20)
      val rounds = rnd.nextInt(3)
      val d2 = rnd.nextBoolean() // r14: the D²-seeded quantizer must obey
                                 // the same full-probe ≡ exact invariant
      val nQ = 1 + rnd.nextInt(10)
      val k = 1 + rnd.nextInt(8)
      val salt = s"fzc${rnd.nextInt(1000)}"
      val label = s"fullprobe cells=$nCells rounds=$rounds d2=$d2 nQ=$nQ k=$k"
      assertSameRows(
        Similarity.ivfHashTopK(embs, nQ, k, nCells, nProbe = nCells,
          salt = salt, rounds = rounds, d2Seed = d2),
        Similarity.bruteForceTopK(embs, nQ, k),
        label)
    }
  }

  test("d2 seeding: deterministic, distinct spread seeds, first pick = " +
    "the hash sample's first row, short on an under-k corpus") {
    val a = Similarity.ivfCells(embs, nCells = 12, rounds = 0, d2Seed = true)
    val b = Similarity.ivfCells(embs, nCells = 12, rounds = 0, d2Seed = true)
    assert(a.map(t => (t._1, t._2)).toSeq == b.map(t => (t._1, t._2)).toSeq,
      "d2 seeding must be a pure function of the data")
    assert(a.length == 12 && a.map(_._1).toSeq == (0L until 12L),
      "cids must be pick ordinals")
    assert(a.map(_._2).distinct.length == 12, "seeds must be distinct rows")
    // seed 0 is exactly the plain hash sample's first pick
    val hash = Similarity.ivfCells(embs, nCells = 12, rounds = 0)
    assert(a(0)._2 == hash(0)._2,
      "d2 seed 0 must equal the hash-order-first row")
    // farthest-first: seed 1 maximizes rounded distance to seed 0 over
    // the pool — in particular it is farther from seed 0 than the plain
    // sample's own second pick (or equal under a tie)
    def d2d(x: Seq[Double], y: Seq[Double]): Double =
      x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
    assert(d2d(a(0)._2, a(1)._2) >= d2d(hash(0)._2, hash(1)._2) - 1e-6,
      "d2 second pick is not farther than the hash sample's")
    val tiny = Similarity.ivfCells(embs.filter(col("vec_id") < 5),
      nCells = 16, rounds = 1, d2Seed = true)
    assert(tiny.length == 5, s"under-k corpus: ${tiny.length} seeds")
  }

  test("under-nCells corpus: the TRAINED quantizer yields a short " +
    "ordinal centroid list (every row a centroid) and full-width " +
    "probing still equals brute force") {
    val tiny = embs.filter(col("vec_id") < 5)
    for (rounds <- Seq(0, 2)) {
      val cells = Similarity.ivfCells(tiny, nCells = 16, rounds = rounds)
      assert(cells.length == 5, s"rounds=$rounds: ${cells.length} centroids")
      if (rounds > 0)
        assert(cells.map(_._1).toSeq == (0L until 5L),
          "trained cids must be sample ordinals")
      assertSameRows(
        Similarity.ivfHashTopK(tiny, nQueries = 3, k = 2, nCells = 16,
          nProbe = 16, rounds = rounds),
        Similarity.bruteForceTopK(tiny, nQueries = 3, k = 2),
        s"tiny-corpus fullprobe rounds=$rounds")
    }
  }

  test("ivfCellStats: a zero-norm member is counted as degenerate and " +
    "excluded from the coherence stats; occupancy sums to the corpus") {
    import spark.implicits._
    val rows = (0L until 40L).map { i =>
      val v = if (i == 7L) Array.fill(8)(0f) // NaN assignment cosine
              else Array.tabulate(8)(d => (((i * 11 + d) % 17) - 8).toFloat)
      (i, v, 0)
    }
    val df = rows.toDF("vec_id", "embedding", "label")
    val stats = Similarity.ivfCellStats(df, nCells = 4).collect()
    assert(stats.map(_.getAs[Long]("n_vectors")).sum == 40L)
    assert(stats.map(_.getAs[Long]("n_degenerate")).sum == 1L)
    // the degenerate row lands in the smallest cell (the NaN tie rule)
    val degCell = stats.filter(_.getAs[Long]("n_degenerate") > 0)
      .map(_.getAs[Long]("cell"))
    assert(degCell.toSeq == Seq(stats.map(_.getAs[Long]("cell")).min))
    // coherence stats are finite everywhere a non-degenerate member exists
    stats.foreach { r =>
      if (r.getAs[Long]("n_vectors") > r.getAs[Long]("n_degenerate")) {
        assert(!r.isNullAt(r.fieldIndex("mean_cc"))
          && !r.getAs[Double]("mean_cc").isNaN)
        assert(!r.getAs[Double]("min_cc").isNaN)
      }
    }
    // empty corpus: the early-return frame shares the populated schema
    // (a consumer selecting n_degenerate must not fail only on that edge)
    val emptyStats = Similarity.ivfCellStats(
      df.filter(col("vec_id") < 0), nCells = 4)
    assert(emptyStats.columns.toSeq ==
      Seq("cell", "n_vectors", "n_degenerate", "mean_cc", "min_cc"))
    assert(emptyStats.count() == 0)
  }

  test("fuzz: productQuantize matches an independent Scala argmin at 15 " +
    "random configs") {
    val raw = embs.select(col("vec_id"),
        col("embedding").cast("array<double>").as("v"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def round6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    for (_ <- 1 to 15) {
      val cfg = drawCfg()
      val cb = Similarity.codebook(embs, cfg)
      val got = Similarity.productQuantize(embs, cfg, codebook = Some(cb))
        .collect().map { r =>
          r.getLong(0) -> ((0 until cfg.m).map(s => r.getAs[Int](s"code$s")),
            r.getAs[Double]("recon_error"))
        }.toMap
      raw.foreach { case (id, v) =>
        var err = 0.0
        val codes = (0 until cfg.m).map { s =>
          // independent argmin: strict < over 6-dp-rounded left-to-right
          // (x−c)² folds — first (= smallest) cid wins ties
          var best = -1; var bestD = Double.MaxValue
          for (cid <- cb.indices) {
            var d = 0.0
            for (i <- 0 until cfg.sub) {
              val x = v(s * cfg.sub + i) - cb(cid)(s * cfg.sub + i)
              d += x * x
            }
            val dr = round6(d)
            if (dr < bestD) { bestD = dr; best = cid }
          }
          err += bestD
          best
        }
        val (gc, ge) = got(id)
        assert(gc == codes && ge == round6(err),
          s"[pq cfg=$cfg] vec $id: got ($gc, $ge) want ($codes, ${round6(err)})")
      }
    }
  }

  test("fuzz: the df-capped jaccard path with a never-binding cap equals " +
    "the unpruned path at 10 random (shingleWidth, threshold) configs") {
    // two genuinely different implementations: the unpruned path counts
    // common shingles in the pairing join; the capped path prunes by
    // per-shingle df, bounds jaccard from above, and recomputes
    // survivors from the full arrays — with a cap no shingle reaches,
    // they must agree exactly
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 80)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    for (_ <- 1 to 10) {
      val w = 2 + rnd.nextInt(4)
      val t = 0.05 + rnd.nextInt(18) * 0.05
      val label = s"jaccard w=$w t=$t"
      assertSameRows(
        graft.text.Dedup.jaccardPairsExact(docs, w, t),
        graft.text.Dedup.jaccardPairsExact(docs, w, t,
          maxShingleDf = Some(1000000)),
        label)
      graft.queries.SharedFrames.clear(spark)
    }
  }

  test("fuzz: one-projection stateless ANN assignment equals the split " +
    "cell-assign + quantize pair at 15 random configs") {
    for (_ <- 1 to 15) {
      val cfg = drawCfg()
      val nCells = 1 + rnd.nextInt(16)
      val ivfRounds = rnd.nextInt(3)
      val salt = s"fzs${rnd.nextInt(1000)}"
      val corpus = embs.filter(col("vec_id") % 3 =!= 0)
      val batch = embs.filter(col("vec_id") % 3 === 0)
      val label = s"stateless cfg=$cfg cells=$nCells ivfR=$ivfRounds"
      val model = Similarity.freezeAnnIndex(corpus, nCells, salt, cfg,
        ivfRounds)
      // an under-k corpus is allowed to refuse to freeze; redraw happens
      // naturally on the next iteration
      model.foreach { mdl =>
        val fused = Similarity.annAssignStateless(batch, mdl)
        val cells = Similarity.ivfCellAssignmentsAgainst(batch, corpus,
            nCells, salt, ivfRounds)
          .select(col("vec_id"), col("cell"))
        val codes = Similarity.productQuantizeWith(
          batch, Similarity.codebook(corpus, cfg), cfg)
        assertSameRows(fused,
          cells.join(codes, Seq("vec_id")), label)
      }
    }
  }

  // ── r14 trained components under random knobs ─────────────────────

  private def md5hexStr(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
  private def hex8(s: String): Long =
    java.lang.Long.parseLong(md5hexStr(s).take(8), 16)

  test("fuzz: trainNbWeights matches a plain-Scala NB fit at 8 random " +
    "(nBuckets, trainN) configs") {
    import spark.implicits._
    val docRows = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull).limit(150)
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val df = docRows.toSeq.toDF("doc_id", "text", "lang")
    for (_ <- 1 to 8) {
      val nB = Seq(64, 256, 1024)(rnd.nextInt(3))
      val trainN = 8 + rnd.nextInt(110)
      val got = graft.text.TextAnalysis.trainNbWeights(df,
        col("lang") === "en", nBuckets = nB, trainN = trainN)
      val train = docRows.sortBy(r => (md5hexStr(s"qcls:${r._1}"), r._1))
        .take(trainN)
      val ct = new Array[Long](nB)
      val cn = new Array[Long](nB)
      train.foreach { case (_, text, lang) =>
        text.split(" ", -1).foreach { tok =>
          val b = (hex8(tok) % nB).toInt
          if (lang == "en") ct(b) += 1 else cn(b) += 1
        }
      }
      val t = ct.sum; val n = cn.sum
      val want = Array.tabulate(nB) { b =>
        math.floor(1e6 * math.log(
          ((ct(b) + 1) * (n + nB)).toDouble / ((cn(b) + 1) * (t + nB)))
          + 0.5).toLong
      }
      assert(got.toSeq == want.toSeq,
        s"nB=$nB trainN=$trainN: first diffs at buckets " +
          got.indices.filter(i => got(i) != want(i)).take(5))
    }
  }

  test("fuzz: trainLrWeights matches a plain-Scala full-batch GD fit at " +
    "6 random (nBuckets, trainN, epochs) configs") {
    import spark.implicits._
    val docRows = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("text").isNotNull).limit(120)
      .select("doc_id", "text", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val df = docRows.toSeq.toDF("doc_id", "text", "lang")
    for (_ <- 1 to 6) {
      val nB = Seq(64, 256, 1024)(rnd.nextInt(3))
      val trainN = 8 + rnd.nextInt(100)
      val epochs = 1 + rnd.nextInt(4)
      val lr = Seq(64L, 256L, 1024L)(rnd.nextInt(3))
      val got = graft.text.TextAnalysis.trainLrWeights(df,
        col("lang") === "en", nBuckets = nB, trainN = trainN,
        epochs = epochs, lr = lr)
      // plain-Scala replay on the same integer grid
      val train = docRows.sortBy(r => (md5hexStr(s"qcls:${r._1}"), r._1))
        .take(trainN)
      val feats = train.map { case (_, text, lang) =>
        val toks = text.split(" ", -1)
        val c = toks.groupBy(t => (hex8(t) % nB).toInt)
          .view.mapValues(_.length.toLong).toMap
        (if (lang == "en") 1L else 0L, toks.length.toLong, c)
      }
      val n = feats.length
      val w = new Array[Long](nB)
      for (_ <- 1 to epochs) {
        val g = new Array[Long](nB)
        feats.foreach { case (y, nd, c) =>
          val s = c.map { case (b, cb) => cb * w(b) }.sum
          val m = math.floor(s.toDouble / nd + 0.5)
          val p = math.floor(1e6 / (1.0 + math.exp(-(m / 1e6))) + 0.5).toLong
          val r = y * 1000000L - p
          c.foreach { case (b, cb) =>
            g(b) += math.floor(r * cb / nd.toDouble + 0.5).toLong
          }
        }
        (0 until nB).foreach { b =>
          w(b) += math.floor(g(b) * lr.toDouble / n + 0.5).toLong
        }
      }
      assert(got.toSeq == w.toSeq,
        s"nB=$nB trainN=$trainN epochs=$epochs lr=$lr: diffs at buckets " +
          got.indices.filter(i => got(i) != w(i)).take(5))
    }
  }

  test("fuzz: unicodeTokens/unicodeForm match a plain-JDK re-derivation " +
    "on random mixed-script text (8 corpora)") {
    import spark.implicits._
    // alphabet spanning the classes the tokenizer must handle: ASCII,
    // precomposed accents, COMBINING marks (NFC must fold them), a
    // non-Latin bicameral script (casefold), CJK (letter category, no
    // case), digits, punctuation/separators (split points)
    val pool: IndexedSeq[String] = IndexedSeq(
      "a", "B", "z", "7", "é", "É", "ö", "Ж", "д", "漢", "字",
      "e\u0301", "o\u0308", "A\u0300", // decomposed: NFC must fold these
      " ", ".", ",", "-", "!", "_", "½", " ")
    def jdkForm(s: String): String = {
      val nfc = java.text.Normalizer.normalize(s,
        java.text.Normalizer.Form.NFC)
      nfc.toLowerCase(java.util.Locale.ROOT)
        .split("[^\\p{L}\\p{N}]+", -1).filter(_.nonEmpty).mkString(" ")
    }
    val rnd2 = new scala.util.Random(1503L)
    val rows = (1L to 8L).map { d =>
      (d, (0 until 20 + rnd2.nextInt(60))
        .map(_ => pool(rnd2.nextInt(pool.length))).mkString)
    }
    val got = rows.toDF("doc_id", "text")
      .select(col("doc_id"), graft.text.Dedup.unicodeForm(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (d, s) =>
      assert(got(d) == jdkForm(s),
        s"doc $d: spark='${got(d)}' jdk='${jdkForm(s)}' raw='$s'")
    }
  }

  /** Independent plain-Scala BPE trainer (counting, tie rule, greedy
    * non-overlapping application) for the fuzz below. */
  private def scalaBpe(texts: Seq[String], n: Int)
      : Seq[(Int, String, String, Long)] = {
    def applyM(syms: List[String], a: String, b: String): List[String] =
      syms.foldLeft(List.empty[String]) { (acc, s) =>
        if (acc.nonEmpty && acc.last == a && s == b) acc.init :+ (a + b)
        else acc :+ s
      }
    var vocab: Map[List[String], Long] = texts.flatMap(_.split(" ", -1))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
      .map { case (w, c) => w.toList.map(_.toString) -> c }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (t <- 1 to n) {
      val pairs = scala.collection.mutable.Map.empty[(String, String), Long]
        .withDefaultValue(0L)
      vocab.foreach { case (syms, wc) =>
        syms.sliding(2).foreach {
          case List(a, b) => pairs((a, b)) += wc
          case _ => ()
        }
      }
      if (pairs.isEmpty) return out.toSeq
      val ((a, b), c) = pairs.toSeq
        .minBy { case ((pa, pb), pc) => (-pc, pa, pb) }
      out += ((t, a, b, c))
      // distinct words stay distinct symbol lists under any merge (the
      // list's concatenation IS the word), so no key collision to fold
      vocab = vocab.map { case (syms, wc) => applyM(syms, a, b) -> wc }
    }
    out.toSeq
  }

  test("fuzz: batched bpeTrain survives multi-derivation symbol collisions " +
    "(2-char alphabet, deep merge lists) — the rule-4 augmentation class") {
    import spark.implicits._
    // A 2-char alphabet maximizes concat collisions: after a few rounds
    // most candidate concatenations ("aba", "abab", ...) name symbols
    // that ALREADY exist via a different derivation, so a kept merge
    // AUGMENTS pre-existing pair counts — the exact class the strict
    // c_stop trim alone cannot bound (post-count ≤ 2·c_stop). Deep merge
    // lists (up to 12) give the collisions rounds to compound.
    val rnd4 = new scala.util.Random(1604L)
    for (i <- 1 to 8) {
      val docRows = (0 until (3 + rnd4.nextInt(4))).map { d =>
        (d.toLong, (0 until (8 + rnd4.nextInt(12))).map(_ =>
          (0 until (1 + rnd4.nextInt(6)))
            .map(_ => "ab".charAt(rnd4.nextInt(2))).mkString)
          .mkString(" "))
      }
      val nMerges = 6 + rnd4.nextInt(7)
      val df = docRows.toDF("doc_id", "text")
      val want = scalaBpe(docRows.map(_._2), nMerges)
      for (b <- Seq(2, 4, 8)) {
        val batched = graft.text.TextAnalysis.bpeTrain(df, nMerges, batch = b)
          .map(m => (m.rank, m.symA, m.symB, m.nOccurrences))
        assert(batched == want,
          s"collision corpus#$i nMerges=$nMerges batch=$b: $batched != $want")
      }
      // incremental pair-count maintenance must produce bit-identical
      // windows, hence the same merge list — on the collision-dense
      // corpus its delta path (affected-slice explodes, full-outer
      // merge, zero-count eviction) is exercised hardest
      for (b <- Seq(1, 4)) {
        val inc = graft.text.TextAnalysis.bpeTrain(df, nMerges, batch = b,
          incremental = true)
          .map(m => (m.rank, m.symA, m.symB, m.nOccurrences))
        assert(inc == want,
          s"collision corpus#$i nMerges=$nMerges batch=$b incremental: " +
            s"$inc != $want")
      }
    }
  }

  test("fuzz: bpeTrain matches a plain-Scala trainer at 6 random corpora " +
    "and merge counts; the dictionary agrees word for word") {
    import spark.implicits._
    for (i <- 1 to 6) {
      val alphabet = "ab" + ('c' + rnd.nextInt(3)).toChar
      val docRows = (0 until (3 + rnd.nextInt(5))).map { d =>
        (d.toLong, (0 until (5 + rnd.nextInt(10))).map(_ =>
          (0 until (1 + rnd.nextInt(5)))
            .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
          .mkString(" "))
      }
      val nMerges = 1 + rnd.nextInt(5)
      val df = docRows.toDF("doc_id", "text")
      val got = graft.text.TextAnalysis.bpeTrain(df, nMerges)
        .map(m => (m.rank, m.symA, m.symB, m.nOccurrences))
      val want = scalaBpe(docRows.map(_._2), nMerges)
      assert(got == want, s"corpus#$i nMerges=$nMerges: $got != $want")
      // the batched trainer must be merge-for-merge identical to the
      // sequential reference at EVERY batch width — these tiny-alphabet
      // corpora are conflict-dense (most top pairs share symbols), so
      // they exercise the prefix-stop, the concat-collision rule and the
      // strict c_stop trim, not just the clean fast path
      for (b <- Seq(2, 4, 8)) {
        val batched = graft.text.TextAnalysis.bpeTrain(df, nMerges, batch = b)
          .map(m => (m.rank, m.symA, m.symB, m.nOccurrences))
        assert(batched == want,
          s"corpus#$i nMerges=$nMerges batch=$b: $batched != $want")
      }
      val inc = graft.text.TextAnalysis.bpeTrain(df, nMerges, batch = 4,
        incremental = true)
        .map(m => (m.rank, m.symA, m.symB, m.nOccurrences))
      assert(inc == want,
        s"corpus#$i nMerges=$nMerges incremental: $inc != $want")
      // dictionary parity under the learned merges
      val merges = got.map { case (r, a, b, c) =>
        graft.text.TextAnalysis.BpeMerge(r, a, b, c) }
      val dict = graft.text.TextAnalysis.bpeDictionary(df, merges)
        .collect().map(r => r.getString(0) -> r.getSeq[String](1).toList)
        .toMap
      def applyAll(w: String): List[String] =
        merges.foldLeft(w.toList.map(_.toString)) { (syms, m) =>
          syms.foldLeft(List.empty[String]) { (acc, s) =>
            if (acc.nonEmpty && acc.last == m.symA && s == m.symB)
              acc.init :+ (m.symA + m.symB)
            else acc :+ s
          }
        }
      docRows.flatMap(_._2.split(" ", -1)).distinct.foreach { w =>
        assert(dict(w) == applyAll(w), s"word '$w': ${dict(w)} != ${applyAll(w)}")
      }
    }
  }

  test("fuzz: selectTokenBudget / mixEpochPlan / materializeEpochs equal " +
    "plain-Scala re-derivations at seeded-random (budget, totalBudget, " +
    "alpha) draws (r19: the r18 curation operators join the program)") {
    import graft.text.TextAnalysis
    val docsDf = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 400 && col("text").isNotNull)
      .select(col("doc_id"), col("text"), col("source"), col("lang"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // priority signals from the (independently oracle-gated) quality
    // gate — the property-4 discipline: shared inputs, re-derived LOGIC
    case class Sig(id: Long, source: String, n: Int, rep: Double, pk: Int)
    val sigs = TextAnalysis.qualityGate(docsDf, passThrough = Seq("source"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("rep_ratio"), col("keep")).collect()
      .map(r => Sig(r.getLong(0), r.getString(1), r.getInt(2),
        r.getDouble(3), if (r.getBoolean(4)) 0 else 1))
    // greedy fill-then-spill over the (pk, rep, id) priority order; the
    // prefix accumulates EVERY doc's tokens (the operator's before
    // column), per source
    def admission(budgetOf: String => Long)
        : Map[Long, (String, Int, Double, Long, Boolean)] =
      sigs.groupBy(_.source).flatMap { case (src, ss) =>
        val budget = budgetOf(src)
        var before = 0L
        ss.sortBy(s => (s.pk, s.rep, s.id)).map { s =>
          val row = s.id -> ((src, s.n, s.rep, before, before < budget))
          before += s.n
          row
        }
      }
    for (i <- 1 to 8) {
      val budget = rnd.nextInt(5000).toLong
      val got = TextAnalysis.selectTokenBudget(docsDf, budget).collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("source"), r.getAs[Int]("n_tokens"),
            r.getAs[Double]("rep_ratio"), r.getAs[Long]("before_tokens"),
            r.getAs[Boolean]("selected")))).toMap
      assert(got == admission(_ => budget), s"draw#$i budget=$budget")
    }
    // the µ-int tempered plan re-derived with the same IEEE pow
    val texts = docsDf.select(col("source"), col("text")).collect()
      .map(r => (r.getString(0), r.getString(1)))
    val avail: Map[String, Long] = texts.groupBy(_._1).view
      .mapValues(_.map(_._2.split(" ", -1).length.toLong).sum).toMap
    def plan(tb: Long, alpha: Double)
        : Map[String, (Long, Long, Long, Long, Long)] = {
      val p6 = avail.view.mapValues(a =>
        math.floor(math.pow(a.toDouble, alpha) * 1e6 + 0.5).toLong).toMap
      val tot = p6.values.sum
      avail.map { case (s, a) =>
        val t = tb * p6(s) / tot
        s -> ((a, t, t / a, t % a, t * 1000L / a))
      }
    }
    val alphas = Seq(0.25, 0.4, 0.5, 0.6, 0.75, 1.0)
    for (i <- 1 to 8) {
      val tb = 1000L + rnd.nextInt(100000)
      val alpha = alphas(rnd.nextInt(alphas.length))
      val got = TextAnalysis.mixEpochPlan(docsDf, tb, alpha).collect()
        .map(r => r.getAs[String]("source") ->
          ((r.getAs[Long]("avail_tokens"), r.getAs[Long]("target_tokens"),
            r.getAs[Long]("full_epochs"), r.getAs[Long]("rem_tokens"),
            r.getAs[Long]("repeat_milli")))).toMap
      assert(got == plan(tb, alpha), s"draw#$i tb=$tb alpha=$alpha")
    }
    // the materializer composes the two: full fan-out + remainder
    // admission at each source's rem budget, epoch-stamped
    for (i <- 1 to 4) {
      val tb = 1000L + rnd.nextInt(100000)
      val alpha = alphas(rnd.nextInt(alphas.length))
      val pl = plan(tb, alpha)
      val adm = admission(src => pl(src)._4)
      val expected: Seq[(Long, String, Int, Long)] =
        sigs.toSeq.flatMap { s =>
          val full = pl(s.source)._3
          (0L until full).map(e => (s.id, s.source, s.n, e))
        } ++ sigs.toSeq.collect {
          case s if adm(s.id)._5 => (s.id, s.source, s.n, pl(s.source)._3)
        }
      val got = TextAnalysis.materializeEpochs(docsDf, tb, alpha).collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("source"),
          r.getAs[Int]("n_tokens"), r.getAs[Long]("epoch")))
      assert(got.sorted.toSeq == expected.sorted,
        s"draw#$i tb=$tb alpha=$alpha: ${got.length} vs ${expected.length} rows")
    }
    // dsir-prioritized admission (r19): the importance ORDER re-derived
    // from the operator's own (independently oracle-gated) weight frame
    val targets = docsDf.filter(col("lang") === "en" &&
      col("source") === "src0")
    val wRows = TextAnalysis.dsirWeights(docsDf, targets)
      .join(docsDf.select(col("doc_id"), col("source")), Seq("doc_id"))
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("avg_log_ratio")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    for (i <- 1 to 4) {
      val budget = rnd.nextInt(5000).toLong
      val want = wRows.groupBy(_._2).toSeq.flatMap { case (src, rs) =>
        var before = 0L
        rs.sortBy(r => (-r._4, r._1)).toSeq.map { case (id, _, n, a) =>
          val row = id -> ((src, n, a, before, before < budget))
          before += n
          row
        }
      }.toMap
      val got = TextAnalysis.dsirSelectTokenBudget(docsDf, targets, budget)
        .collect()
        .map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[String]("source"), r.getAs[Long]("n_tokens"),
            r.getAs[Double]("avg_log_ratio"),
            r.getAs[Long]("before_tokens"),
            r.getAs[Boolean]("selected")))).toMap
      assert(got == want, s"dsir draw#$i budget=$budget")
    }
    // epoch packer seqLen knob: the two-pass form must equal the serial
    // baseline row-exactly at every width, not just the spec's 128
    val manifest = TextAnalysis.materializeEpochs(docsDf, 60000L, 0.5)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    for (i <- 1 to 3) {
      val seqLen = 32L + rnd.nextInt(993)
      val two = TextAnalysis.packEpochSequences(manifest, seqLen)
      val one = TextAnalysis.packEpochSequencesGlobalWindow(manifest, seqLen)
      assertSameRows(two, one, s"epoch_pack draw#$i seqLen=$seqLen")
    }
    manifest.unpersist()
    docsDf.unpersist()
  }

  test("fuzz: the COMPOSED epoch chain — plan → materialize → pack → " +
    "audit — conserves tokens per epoch, keeps the one-doc-overflow " +
    "invariant, and the packer matches a plain-Scala re-derivation at " +
    "random (alpha, totalBudget, seqLen) draws (the r19 verdict's ask #6)") {
    import graft.text.TextAnalysis
    val docsDf = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
      .filter(col("doc_id") < 400 && col("text").isNotNull)
      .select(col("doc_id"), col("text"), col("source"), col("lang"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTok: Map[Long, Long] = docsDf.select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        r.getString(1).split(" ", -1).length.toLong).toMap
    val srcOf: Map[Long, String] = docsDf.select(col("doc_id"), col("source"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val alphas = Seq(0.25, 0.5, 0.75, 1.0)
    for (i <- 1 to 3) {
      val tb = 1000L + rnd.nextInt(100000)
      val alpha = alphas(rnd.nextInt(alphas.length))
      val seqLen = 32L + rnd.nextInt(993)
      val manifest = TextAnalysis.materializeEpochs(docsDf, tb, alpha)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mrows = manifest.collect().map(r => (r.getAs[Long]("doc_id"),
        r.getAs[String]("source"), r.getAs[Int]("n_tokens").toLong,
        r.getAs[Long]("epoch")))
      val packed = TextAnalysis.packEpochSequences(manifest, seqLen)
        .collect().map(r => (r.getAs[Long]("epoch"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("seq_id"), r.getAs[Long]("seq_offset"),
          r.getAs[Long]("doc_offset"), r.getAs[Long]("seg_tokens")))
      // (a) CONSERVATION: Σ segment tokens per epoch ≡ Σ manifest tokens
      // per epoch — no token invented, dropped, or leaked across epochs
      val manTok = mrows.groupBy(_._4).view.mapValues(_.map(_._3).sum).toMap
      val segTok = packed.groupBy(_._1).view.mapValues(_.map(_._6).sum).toMap
      assert(segTok == manTok,
        s"draw#$i tb=$tb α=$alpha seqLen=$seqLen: token conservation broke")
      // (b) EPOCH PURITY + exact layout: plain-Scala packer — per epoch,
      // lay documents out by (md5(epoch:doc_id), doc_id), prefix-sum,
      // cut at seqLen — must reproduce every segment row exactly
      val expected = mrows.groupBy(_._4).toSeq.flatMap { case (epoch, rs) =>
        var off = 0L
        rs.sortBy { case (id, _, _, _) =>
          (md5hex(s"$epoch:$id"), id)
        }.flatMap { case (id, _, n, _) =>
          val s0 = off; off += n
          val e0 = s0 + n
          (s0 / seqLen to (e0 - 1) / seqLen).map { seq =>
            val segs = math.max(s0, seq * seqLen)
            (epoch, id, seq, segs - seq * seqLen, segs - s0,
              math.min(e0, (seq + 1) * seqLen) - segs)
          }
        }
      }
      assert(packed.sorted.toSeq == expected.sorted,
        s"draw#$i tb=$tb α=$alpha seqLen=$seqLen: packer layout diverged")
      // (c) ONE-DOC OVERFLOW: per plan source, realized − target is
      // bounded above by the largest single document of the source (the
      // greedy fill-then-spill trade), and the audit's realized mass is
      // the manifest's
      val audit = TextAnalysis.epochManifestAudit(manifest,
        TextAnalysis.mixEpochPlan(docsDf, tb, alpha)).collect()
      audit.foreach { r =>
        val src = r.getAs[String]("source")
        val overflow = r.getAs[Long]("overflow_tokens")
        val maxDoc = nTok.collect { case (id, n) if srcOf(id) == src => n }.max
        assert(overflow < maxDoc,
          s"draw#$i $src: overflow $overflow >= max doc $maxDoc")
        assert(r.getAs[Long]("realized_tokens") ==
          mrows.filter(_._2 == src).map(_._3).sum,
          s"draw#$i $src: audit realized != manifest mass")
      }
      manifest.unpersist()
    }
    docsDf.unpersist()
  }

  test("fuzz: distributed Lloyd rounds are BIT-IDENTICAL to the driver " +
    "loop at 10 random (nCells, rounds, d2) IVF configs and 6 PQ " +
    "codebook configs (r19: the trainer's cluster-job path)") {
    // the two paths share accumulateAssign verbatim; what this fuzzes
    // is the ONLY thing that differs — partitioned partial µ-int sums
    // merged by reduce vs one sequential accumulation — across widths,
    // round counts, seeding modes and (for PQ) subspace layouts
    val saved = Similarity.distLloydThreshold
    try {
      for (i <- 1 to 10) {
        val nCells = 2 + rnd.nextInt(12)
        val rounds = 1 + rnd.nextInt(3)
        val d2 = rnd.nextBoolean()
        val salt = s"fzl$i"
        Similarity.distLloydThreshold = Long.MaxValue // force driver
        val driver = Similarity.ivfCells(embs, nCells, salt, rounds, d2)
        Similarity.distLloydThreshold = 0L // force cluster job
        val dist = Similarity.ivfCells(embs, nCells, salt, rounds, d2)
        assert(driver.length == dist.length,
          s"[ivf cells=$nCells rounds=$rounds d2=$d2] width diverged")
        driver.zip(dist).foreach { case ((ca, va, na), (cb, vb, nb)) =>
          assert(ca == cb && va == vb && na == nb,
            s"[ivf cells=$nCells rounds=$rounds d2=$d2] centroid $ca " +
              s"diverged: $va vs $vb")
        }
      }
      for (i <- 1 to 6) {
        val cfg = drawCfg().copy(rounds = 1 + rnd.nextInt(3))
        Similarity.distLloydThreshold = Long.MaxValue
        val driver = Similarity.codebook(embs, cfg)
        Similarity.distLloydThreshold = 0L
        val dist = Similarity.codebook(embs, cfg)
        assert(driver.length == dist.length &&
          driver.zip(dist).forall { case (a, b) => a == b },
          s"[pq $cfg] codebook diverged")
      }
    } finally Similarity.distLloydThreshold = saved
  }
}
