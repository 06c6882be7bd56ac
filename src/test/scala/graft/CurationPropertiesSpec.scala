package graft

import graft.text.{Dedup, TextAnalysis}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/**
 * Property-based invariants for the r8 curation operators, checked
 * against independent driver-side Scala references on seeded random
 * corpora (same fixed-seed `Gen` discipline as PipelinePropertiesSpec —
 * deterministic across runs, no scalatestplus bridge).
 */
class CurationPropertiesSpec extends SparkSpec {
  import spark.implicits._

  // small vocabulary forces genuine cross-doc window collisions
  private val corpusGen: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.choose(5, 20)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.choose(0, 30)
      toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  test("duplicateSpanStats matches a brute-force reference on random corpora") {
    val k = 4
    (1 to 8).foreach { s =>
      val rows = corpusGen(Gen.Parameters.default, Seed(101L * s))
        .getOrElse(fail(s"no sample for seed ${101 * s}"))
      // independent reference: windows and cross-doc test in plain Scala
      val windows = rows.map { case (id, t) =>
        val toks = t.split(" ", -1)
        id -> (if (toks.length >= k) toks.sliding(k).map(_.mkString(" ")).toList
               else Nil)
      }.toMap
      val docsPerWindow = windows.toSeq
        .flatMap { case (id, ws) => ws.distinct.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.size).toMap
      val expected = windows.collect { case (id, ws) if ws.nonEmpty =>
        id -> ((ws.size.toLong, ws.count(w => docsPerWindow(w) > 1).toLong))
      }
      val got = Dedup.duplicateSpanStats(rows.toDF("doc_id", "text"), k = k)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows")))).toMap
      assert(got == expected, s"seed ${101 * s}")
    }
  }

  test("temperatureSourceMix keeps exactly min(n_s, floor(n_s^a*min^(1-a)*f)) per source") {
    val mixGen: Gen[List[(Long, String, String)]] = for {
      nSrc <- Gen.choose(2, 5)
      sizes <- Gen.listOfN(nSrc, Gen.choose(1, 25))
    } yield sizes.zipWithIndex.flatMap { case (n, s) =>
      (0 until n).map(i => ((s * 1000 + i).toLong, s"t$s-$i", s"src$s"))
    }.toList
    (1 to 6).foreach { seed =>
      val rows = mixGen(Gen.Parameters.default, Seed(7L * seed))
        .getOrElse(fail(s"no sample for seed ${7 * seed}"))
      val bySrc = rows.groupBy(_._3).view.mapValues(_.size.toLong).toMap
      val minN = bySrc.values.min
      val keptByAlpha = Seq(0.0, 0.5, 1.0).map { alpha =>
        val kept = TextAnalysis
          .temperatureSourceMix(rows.toDF("doc_id", "text", "source"),
            alpha = alpha, fraction = 0.8)
          .collect().groupBy(_.getAs[String]("source"))
          .view.mapValues(_.length.toLong).toMap
        bySrc.foreach { case (src, n) =>
          val quota = math.max(1L, math.floor(BigDecimal(
            math.pow(n.toDouble, alpha) * math.pow(minN.toDouble, 1 - alpha) * 0.8)
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toLong)
          assert(kept.getOrElse(src, 0L) == math.min(n, quota),
            s"seed ${7 * seed} alpha $alpha source $src (n=$n, min=$minN)")
        }
        kept
      }
      // quotas are monotone in alpha, per source (uniform ≤ tempered ≤ natural)
      bySrc.keys.foreach { src =>
        val k = keptByAlpha.map(_.getOrElse(src, 0L))
        assert(k(0) <= k(1) && k(1) <= k(2),
          s"seed ${7 * seed} source $src not monotone in alpha: $k")
      }
    }
  }

  test("normalizedExact groups == distinct canonical forms; sizes sum to corpus") {
    val textGen = for {
      len <- Gen.choose(1, 8)
      toks <- Gen.listOfN(len, Gen.oneOf("Ab", "ab", "AB!", "cd", "c-d", "  "))
    } yield toks.mkString(" ")
    (1 to 6).foreach { s =>
      val texts = Gen.listOfN(30, textGen)(Gen.Parameters.default, Seed(31L * s))
        .getOrElse(fail(s"no sample for seed ${31 * s}"))
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      val canonical = texts.map(_.toLowerCase
        .replaceAll("[^a-z0-9 ]", " ").replaceAll(" +", " ").trim).distinct
      val out = Dedup.normalizedExact(rows.toDF("doc_id", "text")).collect()
      assert(out.length == canonical.size, s"seed ${31 * s}")
      assert(out.map(_.getAs[Long]("group_size")).sum == rows.size)
    }
  }

  test("curate_funnel: per-source counts are monotonically non-increasing " +
    "through the stage order, start at ingest, end at the curate count") {
    val sfDir = "/root/testdata/sf0.001"
    val funnel = graft.queries.DataPipelineQueries
      .curateFunnelQ(spark, sfDir).collect()
      .groupBy(_.getAs[String]("source"))
      .view.mapValues(_.sortBy(_.getAs[String]("stage"))
        .map(r => r.getAs[String]("stage") -> r.getAs[Long]("n_docs")))
      .toMap
    assert(funnel.nonEmpty)
    funnel.foreach { case (src, stages) =>
      assert(stages.head._1 == "01_ingest", s"$src funnel must start at ingest")
      val counts = stages.map(_._2)
      assert(counts.zip(counts.tail).forall { case (a, b) => b <= a },
        s"$src funnel not monotone: $stages")
    }
    // the eval-holdout stage total equals the curate query's row count
    val kept = graft.queries.DataPipelineQueries
      .curateCorpus(spark, sfDir).count()
    val holdoutTotal = funnel.values
      .flatMap(_.filter(_._1 == "06_eval_holdout").map(_._2)).sum
    assert(holdoutTotal == kept,
      s"funnel holdout $holdoutTotal != curate_corpus count $kept")
    // r20 release stages: stage 7 equals the SEMANTIC curate count, and
    // the funnel's end equals the release manifest's distinct-document
    // count — the full yield story closes on the shipped corpus
    val semKept = graft.queries.DataPipelineQueries
      .curateCorpusSemantic(spark, sfDir).count()
    val semTotal = funnel.values
      .flatMap(_.filter(_._1 == "07_semantic_canonical").map(_._2)).sum
    assert(semTotal == semKept,
      s"funnel semantic $semTotal != curate_corpus_semantic count $semKept")
    val manifestDocs = graft.queries.DataPipelineQueries
      .releaseManifestQ(spark, sfDir).select("doc_id").distinct().count()
    val endTotal = funnel.values
      .flatMap(_.filter(_._1 == "08_release_selected").map(_._2)).sum
    assert(endTotal == manifestDocs,
      s"funnel end $endTotal != release manifest distinct docs $manifestDocs")
  }

  test("release_manifest: every manifest document is a semantic-curated " +
    "survivor, and per-source realized tokens respect the plan overflow " +
    "invariant on the CURATED corpus") {
    import org.apache.spark.sql.functions.col
    val sfDir = "/root/testdata/sf0.001"
    val manifest = graft.queries.DataPipelineQueries
      .releaseManifestQ(spark, sfDir)
    val curated = graft.queries.DataPipelineQueries
      .curateCorpusSemantic(spark, sfDir).select("doc_id")
    // manifest ⊆ curated (the chain runs OVER the curated corpus)
    assert(manifest.join(curated, Seq("doc_id"), "left_anti").count() == 0,
      "release manifest contains a non-curated document")
    // epoch stamps are dense from 0 per source (full passes then the
    // remainder pass) — no source skips an epoch
    val bySrc = manifest.groupBy(col("source"))
      .agg(org.apache.spark.sql.functions.countDistinct(col("epoch"))
          .as("n_epochs"),
        org.apache.spark.sql.functions.max(col("epoch")).as("max_epoch"))
      .collect()
    bySrc.foreach { r =>
      assert(r.getAs[Long]("n_epochs") == r.getAs[Long]("max_epoch") + 1,
        s"source ${r.get(0)}: non-dense epochs")
    }
  }
}
