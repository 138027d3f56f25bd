package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Semantic edges from SURVEY.md §7.4.3: coerce-cast (F8), banker's
  * rounding (F9), empty→null (F4), fills (F6/F7), %.3f format (F11).
  */
class CleaningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("F8: try_cast coerces garbage to null, then fills 0 (pandas to_numeric errors='coerce')") {
    val df = Seq("1.5", "abc", "", "2.25").toDF("x")
    val out = df.select(Cleaning.coerceNumeric(col("x")).as("x")).as[Double].collect()
    assert(out.toSeq == Seq(1.5, 0.0, 0.0, 2.25))
  }

  test("F9: bround is half-even like pandas .round, not half-up") {
    val df = Seq(0.0005, 0.0015, 0.0025).toDF("x")
    val out = df.select(bround(col("x"), 3).as("x")).as[Double].collect()
    // pandas/numpy round-half-even at the 4th decimal
    assert(out.toSeq == Seq(0.0, 0.002, 0.002))
  }

  test("F4/F6: empty string becomes null then 'Sin Dato'") {
    val df = Seq("ok", "", null).toDF("s")
    val out = df.select(Cleaning.fillString(col("s")).as("s")).as[String].collect()
    assert(out.toSeq == Seq("ok", "Sin Dato", "Sin Dato"))
  }

  test("F11: %.3f has no thousands separators (pandas '{:.3f}' fidelity)") {
    val df = Seq(1234567.5).toDF("x")
    val out = df.select(Cleaning.formatFixed(col("x")).as("x")).as[String].collect()
    assert(out.head == "1234567.500")
  }

  test("silverClean dispatches per column: numeric coerced, strings filled, others untouched") {
    val df = Seq((1L, "3.14159", ""), (2L, "bad", "x")).toDF("id", "num", "s")
    val out = Cleaning.silverClean(df, Set("num")).collect()
    assert(out.map(_.getDouble(1)).toSeq == Seq(3.142, 0.0))
    assert(out.map(_.getString(2)).toSeq == Seq("Sin Dato", "x"))
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L))
  }

  test("P3: column-count guard fails loudly") {
    val df = Seq((1, 2)).toDF("a", "b")
    intercept[IllegalArgumentException](Cleaning.requireColumns(df, 17))
  }
}
