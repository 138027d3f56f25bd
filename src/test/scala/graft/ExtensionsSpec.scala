package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SQL front door: every native expression registered by
  * [[GraftExtensions]] must be callable from `spark.sql`, agree with its
  * Column-API twin, and keep the injected algebraic rules firing on
  * SQL-authored plans.
  */
class ExtensionsSpec extends AnyFunSuite {

  // A dedicated session: TestSpark's has no extensions and getOrCreate
  // would reuse it — clear the active/default first (the
  // RangeJoinRuleSpec pattern) so the registry actually gets built.
  private lazy val spark: SparkSession = {
    val prev = TestSpark.spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions())
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    SparkSession.setActiveSession(prev)
    SparkSession.setDefaultSession(prev)
    s
  }

  test("md5_int from SQL equals the Column-API hash (and honors byte offset)") {
    import spark.implicits._
    val df = Seq("alpha", "beta", "gamma").toDF("s")
    df.createOrReplaceTempView("t_md5")
    val viaSql = spark.sql(
      "SELECT s, md5_int(s) AS h0, md5_int(s, 4) AS h4 FROM t_md5 ORDER BY s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val viaCol = df.select($"s", graft.llm.Dedup.md5Int($"s").as("h0"),
        graft.llm.Dedup.md5Int($"s", 4).as("h4")).orderBy("s")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(viaSql.toSeq == viaCol.toSeq)
    // offset picks different digest bytes
    assert(viaSql.forall { case (_, h0, h4) => h0 != h4 })
  }

  test("shingles from SQL produces word 3-grams") {
    val out = spark.sql(
      "SELECT shingles('a b c d', 3) AS sh").collect().head.getSeq[String](0)
    assert(out == Seq("a b c", "b c d"))
  }

  test("dot_f/sum_sq_f from SQL compute vector math") {
    import spark.implicits._
    Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
      .createOrReplaceTempView("t_vec")
    val r = spark.sql(
      "SELECT dot_f(a, b) AS d, sum_sq_f(a) AS s FROM t_vec").collect().head
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 14.0)
  }

  test("DotSelfToSumSq rewrites SQL-authored self dot products") {
    import spark.implicits._
    Seq(Tuple1(Array(1f, 2f))).toDF("a").createOrReplaceTempView("t_self")
    val df = spark.sql("SELECT dot_f(a, a) AS d FROM t_self")
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("sum_sq_f") || !optimized.contains("dot_f"),
      s"DotSelfToSumSq did not fire:\n$optimized")
    assert(df.collect().head.getDouble(0) == 5.0)
  }
}
