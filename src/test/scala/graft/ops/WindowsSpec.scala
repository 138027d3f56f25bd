package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class WindowsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    ("a", 1, 10.0), ("a", 2, 15.0), ("a", 3, 12.0),
    ("b", 4, 100.0)).toDF("grp", "seq", "v")

  test("A6: grouped diff falls back to the row's own value on the first row (pandas diff+fillna)") {
    val out = Windows.groupedDiff(fixture, Seq("grp"), Seq(col("seq")), Seq("v"))
      .orderBy("seq").select("diff_v").as[Double].collect()
    assert(out.toSeq == Seq(10.0, 5.0, -3.0, 100.0))
  }

  test("A5: grouped cumsum uses rows-unbounded-preceding frame") {
    val out = Windows.groupedCumsum(fixture, Seq("grp"), Seq(col("seq")), Seq("v"))
      .orderBy("seq").select("cumsum_v").as[Double].collect()
    assert(out.toSeq == Seq(10.0, 25.0, 37.0, 100.0))
  }

  test("inverse law: cumsum of diff reconstructs the value (per group, any data)") {
    val diffed = Windows.groupedDiff(fixture, Seq("grp"), Seq(col("seq")), Seq("v"))
    val recon = Windows.groupedCumsum(
        diffed.withColumn("v2", col("diff_v")),
        Seq("grp"), Seq(col("seq")), Seq("v2"))
      .orderBy("seq")
    val pairs = recon.select("v", "cumsum_v2").as[(Double, Double)].collect()
    pairs.foreach { case (v, r) => assert(math.abs(v - r) < 1e-9) }
  }

  test("goldAggregate orders by value columns then tiebreak, like main.py:373") {
    val out = Windows.goldAggregate(fixture, "grp", Seq("v"), Seq("v"), Seq("seq"))
    assert(out.columns.contains("diff_v") && out.columns.contains("cumsum_v"))
    // ordering by value: for group a sorted v = 10,12,15 → cumsum 10,22,37
    val a = out.filter(col("grp") === "a").orderBy("v").select("cumsum_v").as[Double].collect()
    assert(a.toSeq == Seq(10.0, 22.0, 37.0))
  }
}
