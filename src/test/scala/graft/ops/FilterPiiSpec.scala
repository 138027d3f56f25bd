package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class FilterPiiSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("P2: ~isin keeps nulls (pandas), unlike bare SQL NOT IN") {
    val df = Seq(Some("EU"), Some("US"), None).toDF("country")
    val kept = df.filter(!col("country").isin("EU", "NV") || col("country").isNull)
      .collect().map(r => Option(r.getString(0))).toSet
    assert(kept == Set(Some("US"), None))
  }

  test("F5: recode maps listed values and passes others through") {
    val df = Seq("Tokyo", "France", "HK").toDF("c")
    val out = df.select(Recode.viaMapLiteral(col("c"), Recode.countryRecode).as("c"))
      .as[String].collect()
    assert(out.toSeq == Seq("Japan", "France", "United Kingdom"))
  }

  test("F5: broadcast-join recode agrees with map-literal recode") {
    val df = Seq("Tokyo", "France", "HK", "US").toDF("c")
    val mapping = Recode.countryRecode.toSeq.toDF("key", "value")
    val a = Recode.viaBroadcastJoin(df, "c", mapping).as[String].collect().sorted.toSeq
    val b = df.select(Recode.viaMapLiteral(col("c"), Recode.countryRecode)).as[String]
      .collect().sorted.toSeq
    assert(a == b)
  }

  test("F16: surrogate email is deterministic and injective-ish") {
    val df = Seq("alice", "bob", "alice").toDF("name")
    val out = df.select(Pii.surrogateEmail(col("name")).as("e")).as[String].collect()
    assert(out(0) == out(2) && out(0) != out(1))
    assert(out.forall(_.endsWith("@example.com")))
  }

  test("F17: masking is idempotent and keeps the domain") {
    val df = Seq("abc123@mail.example").toDF("email")
    val once = df.select(Pii.maskEmail(col("email")).as("e"))
    val twice = once.select(Pii.maskEmail(col("e")).as("e"))
    assert(once.as[String].head() == "*****@mail.example")
    assert(twice.as[String].head() == "*****@mail.example")
  }

  test("F15: domain extraction takes everything after the last '@'") {
    val df = Seq("a@b.com").toDF("email")
    assert(df.select(Pii.emailDomain(col("email"))).as[String].head() == "b.com")
  }

  test("confidentialSplit: confidential keeps email, silver masks and drops it (P5)") {
    val df = Seq(("x1", 1)).toDF("name_id", "n")
    val (conf, silver) = Pii.confidentialSplit(df, "name_id")
    assert(conf.columns.contains("email"))
    assert(!silver.columns.contains("email") && silver.columns.contains("email_enmascarados"))
    assert(silver.select("email_enmascarados").as[String].head().startsWith("*****@"))
  }

  test("scrubText redacts all three classes, is idempotent, leaves clean text alone") {
    def scrub(s: String): String =
      Seq(s).toDF("t").select(Pii.scrubText(col("t"))).as[String].head()
    val raw = "mail a.b-c%d@host.co tel 12-345-678-9012 ip 10.0.255.3 ok"
    val once = scrub(raw)
    assert(once == "mail [EMAIL] tel [PHONE] ip [IP] ok")
    assert(scrub(once) == once) // idempotent: tags match no pattern
    val clean = "no pii here just words 123 and 1.5 ratios a-b"
    assert(scrub(clean) == clean) // short digit runs / decimals untouched
    // class isolation: an email's digits never match phone/ip inside it
    assert(scrub("x 99@99.com y") == "x [EMAIL] y")
  }
}
