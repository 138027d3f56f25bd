package graft.ops

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import Expectations._

class ExpectationsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some(10.0), "ok"),
    (2L, Some(-5.0), "ok"),   // violates positive_value
    (3L, None, "ok"),          // violates value_present (and positive via null)
    (4L, Some(7.0), "")        // violates label_nonempty
  ).toDF("id", "value", "label")

  test("warn mode counts violations without dropping rows") {
    val exps = Seq(
      Expectation("positive_value", col("value") > 0, Warn),
      Expectation("label_nonempty", length(col("label")) > 0, Warn))
    val obs = Observation()
    val out = withExpectations(fixture, obs, exps)
    assert(out.count() == 4) // nothing dropped
    val v = violations(obs, exps)
    assert(v("positive_value") == 2) // -5 and the null
    assert(v("label_nonempty") == 1)
    assert(obs.get("rows_observed") == 4L)
  }

  test("drop mode filters violating rows but counters see all arrivals") {
    val exps = Seq(Expectation("value_present", col("value").isNotNull, Drop))
    val obs = Observation()
    val out = withExpectations(fixture, obs, exps)
    assert(out.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
    assert(violations(obs, exps)("value_present") == 1)
  }

  test("fail mode aborts after the action when violations occurred") {
    val exps = Seq(Expectation("positive_value", col("value") > 0, Fail))
    val obs = Observation()
    withExpectations(fixture, obs, exps).count()
    val err = intercept[RuntimeException] { assertPassed(obs, exps) }
    assert(err.getMessage.contains("positive_value"))
  }

  test("clean data passes fail-mode expectations") {
    val exps = Seq(Expectation("id_positive", col("id") > 0, Fail))
    val obs = Observation()
    withExpectations(fixture, obs, exps).count()
    assertPassed(obs, exps) // no throw
  }
}
