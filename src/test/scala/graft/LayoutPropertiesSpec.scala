package graft

import graft.contracts.Contracts
import graft.contracts.Contracts._
import graft.sources.TableLayout
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import java.nio.file.Files

/**
 * Property checks for the r10 layout/contract modules against
 * independent plain-Scala references on random inputs: the contract
 * report must reconcile with per-row quarantine verdicts under ANY
 * null/dup mixture, upsert must be idempotent and obey the replace/keep
 * algebra, and the z-value must order points by Morton block.
 */
class LayoutPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Option[String], Option[Double])]] = for {
    n <- Gen.choose(4, 24)
    rows <- Gen.listOfN(n, for {
      id <- Gen.choose(0L, 9L) // small key space forces duplicates
      et <- Gen.option(Gen.oneOf("view", "click", "weird", "bad"))
      v <- Gen.option(Gen.choose(-50.0, 150.0))
    } yield (id, et, v))
  } yield rows

  test("contract report reconciles with quarantine verdicts and a " +
    "plain-Scala reference on random null/dup mixtures") {
    val checks = Seq(
      notNull("etype"),
      inSet("etype", Seq("view", "click")),
      inRange("v", 0.0, 100.0))
    (1 to 8).foreach { s =>
      val rows = rowsGen(Gen.Parameters.default, Seed(77L * s))
        .getOrElse(fail(s"no sample for seed $s"))
      val df = rows.toDF("id", "etype", "v")
      // independent reference
      val refViol = Map(
        "not_null(etype)" -> rows.count(_._2.isEmpty).toLong,
        "in_set(etype)" -> rows.count(r =>
          !r._2.exists(Set("view", "click"))).toLong,
        "in_range(v,0.0,100.0)" -> rows.count(r =>
          !r._3.exists(x => x >= 0.0 && x <= 100.0)).toLong)
      val refDups = rows.groupBy(_._1).values
        .filter(_.size > 1).map(_.size.toLong).sum

      val report = Contracts.validate(df, checks, Seq(Seq("id")))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(report.filterNot(_._1.startsWith("unique")) == refViol,
        s"seed $s")
      assert(report("unique(id)") == refDups, s"seed $s")

      // quarantine verdicts must sum to the same per-check counts and
      // keep == no violations, row for row
      val q = Contracts.quarantine(df, checks)
        .select("violations", "keep").collect()
      checks.foreach { c =>
        assert(q.count(_.getString(0).split(";").contains(c.name)).toLong
          == refViol(c.name), s"seed $s ${c.name}")
      }
      assert(q.forall(r => r.getBoolean(1) == r.getString(0).isEmpty))
    }
  }

  test("upsert is idempotent and obeys the replace/keep algebra on " +
    "random batches") {
    def ev(rows: Seq[(Long, Int, Long, Double)]) =
      rows.toDF("event_id", "day", "user_id", "value")
        .select(col("event_id"),
          to_timestamp(format_string("2024-05-%02d 10:00:00", col("day")))
            .as("ts"),
          col("user_id"), col("value"))
    val baseGen = for {
      n <- Gen.choose(5, 30)
      rows <- Gen.listOfN(n, for {
        id <- Gen.choose(0L, 49L)
        day <- Gen.choose(1, 4)
        u <- Gen.choose(0L, 5L)
      } yield (id, day, u, 1.0))
    } yield rows.distinctBy(_._1) // event_id is the upsert key
    (1 to 5).foreach { s =>
      val base = baseGen(Gen.Parameters.default, Seed(31L * s))
        .getOrElse(fail(s"no sample $s"))
      val updates = baseGen(Gen.Parameters.default, Seed(31L * s + 7))
        .getOrElse(fail(s"no sample $s")).map(r => r.copy(_4 = 9.0))
      val dir = Files.createTempDirectory(s"layout_prop$s").toString + "/t"
      TableLayout.writeDatePartitioned(ev(base), dir)
      TableLayout.upsertDatePartitions(spark, dir, ev(updates), Seq("event_id"))
      def snapshot = TableLayout.readDatePartitioned(spark, dir)
        .select("event_id", "value").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val once = snapshot
      // reference algebra: updates win on key collision, all keys present
      val expected = (base.map(r => r._1 -> 1.0).toMap
        ++ updates.map(r => r._1 -> 9.0).toMap)
      assert(once == expected, s"seed $s")
      // idempotence: re-applying the same batch changes nothing
      TableLayout.upsertDatePartitions(spark, dir, ev(updates), Seq("event_id"))
      assert(snapshot == expected, s"seed $s (idempotence)")
    }
  }

  test("z-values match a reference bit-interleave over the scaled cells") {
    val pts = for { x <- 0 until 16; y <- 0 until 16 } yield (x.toLong, y.toLong)
    val df = pts.toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        TableLayout.zOrderValue(df, Seq("x", "y"), bits = 4).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // reference replicates the declared scaling (min/max-linear, floor
    // cast, clamp — IEEE division means cell(v) is v or v-1 here, which
    // is why this is a spec replica, not an identity assumption) and an
    // independent interleave
    def cell(v: Long): Long =
      math.min(15L, math.max(0L, (v.toDouble / 15.0 * 15.0).toLong))
    def refInterleave(cx: Long, cy: Long): Long =
      (0 until 4).map { k =>
        (((cx >> k) & 1L) << (2 * k)) | (((cy >> k) & 1L) << (2 * k + 1))
      }.reduce(_ | _)
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == refInterleave(cell(x), cell(y)), s"($x,$y)")
    }
  }
}
