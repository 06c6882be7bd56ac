package graft

import graft.privacy.Privacy
import org.apache.spark.sql.functions.col

class PrivacySpec extends SparkSpec {
  import spark.implicits._

  test("pseudonym: salted md5 of the stringified id; distinct ids diverge") {
    val out = Seq(8L, 8L, 9L).toDF("user_id")
      .select(Privacy.pseudonym(col("user_id")).as("p"))
      .collect().map(_.getString(0))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(0) == md5hex("pii:8"))
    assert(out(0) == out(1))
    assert(out(2) == md5hex("pii:9") && out(2) != out(0))
  }

  test("pseudonymize replaces the id column in place, keeping other columns") {
    val df = Seq((8L, "click"), (9L, "view")).toDF("user_id", "event_type")
    val out = Privacy.pseudonymize(df, "user_id")
    assert(out.columns.toSeq == Seq("user_id", "event_type"))
    assert(out.schema("user_id").dataType.typeName == "string")
    assert(out.collect().map(_.getString(0)).distinct.length == 2)
  }

  test("scrub: detects and redacts emails, IPs, phones; clean docs digest as-is") {
    val docs = Seq(
      (1L, "contact bob@example.com or +12025550123 now"),
      (2L, "server at 10.0.0.1 and 192.168.1.255 plus 555-123-4567"),
      (3L, "no pii here at all"))
      .toDF("doc_id", "text")
    val out = Privacy.scrub(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Int]("n_email") == 1)
    assert(out(1L).getAs[Int]("n_phone") == 1)
    assert(out(1L).getAs[Int]("n_ip") == 0)
    assert(!out(1L).getAs[Boolean]("clean"))
    assert(out(2L).getAs[Int]("n_ip") == 2)
    assert(out(2L).getAs[Int]("n_phone") == 1)
    assert(out(3L).getAs[Boolean]("clean"))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(out(1L).getAs[String]("redacted_md5") ==
      md5hex("contact [EMAIL] or [PHONE] now"))
    assert(out(3L).getAs[String]("redacted_md5") ==
      md5hex("no pii here at all"))
  }

  test("releaseAudit: k boundary is strict — n==k kept, n==k-1 suppressed") {
    // user 1 'click' ×2 (== k → kept), user 1 'view' ×1 (< k → suppressed)
    val events = Seq(
      (1L, "click", 3.0), (1L, "click", 7.0), (1L, "view", 5.0))
      .toDF("user_id", "event_type", "value")
    val out = Privacy.releaseAudit(events, k = 2)
      .collect().map(r => r.getAs[String]("event_type") ->
        ((r.getAs[Long]("n_events"), r.getAs[Double]("min_value"),
          r.getAs[Double]("max_value"), r.getAs[Boolean]("suppressed")))).toMap
    assert(out("click") == ((2L, 3.0, 7.0, false)))
    assert(out("view") == ((1L, 5.0, 5.0, true)))
  }
}
