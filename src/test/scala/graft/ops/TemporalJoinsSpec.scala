package graft.ops

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("asofJoin picks the latest right row at-or-before each left time, per key") {
    val left = Seq((1L, ts(5), "a"), (1L, ts(15), "b"), (2L, ts(10), "c"))
      .toDF("k", "t", "lv")
    val right = Seq((1L, ts(1), 100L), (1L, ts(10), 200L), (2L, ts(20), 300L))
      .toDF("k", "rt", "price")
    val out = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "rt", Seq("price"))
      .select("lv", "asof_price").as[(String, Option[Long])].collect().toMap
    assert(out == Map("a" -> Some(100L), "b" -> Some(200L), "c" -> None))
  }

  test("asofJoin strict excludes right rows at exactly the left time") {
    val left = Seq((1L, ts(10), "x")).toDF("k", "t", "lv")
    val right = Seq((1L, ts(10), 1L), (1L, ts(5), 2L)).toDF("k", "rt", "v")
    val strict = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"), strict = true)
      .select("asof_v").as[Option[Long]].head()
    val loose = TemporalJoins.asofJoin(left, right, Seq("k"), "t", "rt", Seq("v"))
      .select("asof_v").as[Option[Long]].head()
    assert(strict.contains(2L))
    assert(loose.contains(1L))
  }

  test("rangeJoin finds exactly the pairs within the window, including across buckets") {
    val a = Seq((1L, 10L, ts(0)), (1L, 11L, ts(29)), (1L, 12L, ts(31)))
      .toDF("k", "id1", "t1")
    val b = Seq((1L, 20L, ts(1)), (1L, 21L, ts(30)), (2L, 22L, ts(1)))
      .toDF("k", "id2", "t2")
    // 30-minute window (1800s); (10,20) Δ=1m, (11,21) Δ=1m, (12,21) Δ=1m,
    // (10,21) Δ=30m boundary INCLUDED, (11,20) Δ=28m, (12,20) Δ=30m included;
    // key 2 never matches key 1.
    val out = TemporalJoins.rangeJoin(a, b, Seq("k"), "t1", "t2", 1800L * 1000000)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(out == Set((10L, 20L), (10L, 21L), (11L, 20L), (11L, 21L), (12L, 20L), (12L, 21L)))
  }

  test("extension registers dot_f/sum_sq_f for SQL use") {
    import org.apache.spark.sql.SparkSession
    val prev = spark // ensure the shared context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]").config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions()).getOrCreate()
      val r = s.sql("SELECT dot_f(array(1.0F,2.0F), array(3.0F,4.0F)) AS d, " +
        "sum_sq_f(array(3.0F,4.0F)) AS s").collect().head
      assert(r.getDouble(0) == 11.0 && r.getDouble(1) == 25.0)
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("injected optimizer rule rewrites dot_f(a,a) to sum_sq_f(a)") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]").config("spark.ui.enabled", "false")
        .withExtensions(new graft.GraftExtensions()).getOrCreate()
      // non-foldable input (id-dependent) so constant folding can't hide
      // the rewrite
      val df = s.sql(
        "SELECT dot_f(v, v) AS selfdot, sum_sq_f(v) AS ssq FROM " +
          "(SELECT array(cast(id AS FLOAT), 4.0F) AS v FROM range(3))")
      val optimized = df.queryExecution.optimizedPlan
      val dots = optimized.expressions
        .flatMap(_.collect { case d: org.apache.spark.sql.graft.DotProductF => d })
      val sums = optimized.expressions
        .flatMap(_.collect { case ss: org.apache.spark.sql.graft.SumSqF => ss })
      assert(dots.isEmpty, "self-dot should be rewritten away")
      assert(sums.length == 2)
      val r = df.orderBy("selfdot").collect()
      assert(r.map(_.getDouble(0)).toSeq == Seq(16.0, 17.0, 20.0))
      assert(r.map(_.getDouble(1)).toSeq == Seq(16.0, 17.0, 20.0))
      // non-self dot is untouched
      val df2 = s.sql("SELECT dot_f(v, array(2.0F)) AS d FROM " +
        "(SELECT array(cast(id AS FLOAT)) AS v FROM range(3))")
      val dots2 = df2.queryExecution.optimizedPlan.expressions
        .flatMap(_.collect { case d: org.apache.spark.sql.graft.DotProductF => d })
      assert(dots2.nonEmpty)
      assert(df2.orderBy("d").collect().map(_.getDouble(0)).toSeq == Seq(0.0, 2.0, 4.0))
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
