package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Data-quality expectations over a DataFrame, in the Delta Live Tables
  * style: each expectation is a boolean predicate with a mode —
  *  - `Warn`: count violations, keep the rows;
  *  - `Drop`: count violations, filter the rows out;
  *  - `Fail`: count violations, abort the pipeline after the action if
  *    any occurred.
  *
  * Implementation rides Spark's `observe` API (a `CollectMetrics` plan
  * node): violation counters are computed INSIDE the job — one pass, no
  * second scan, exact even under retries (Spark de-duplicates metrics per
  * task attempt) — and surface through [[org.apache.spark.sql.Observation]]
  * after the first action. At 100 TB this matters: a naive
  * `df.filter(!cond).count()` quality check doubles the scan; observe is
  * free.
  *
  * Metrics are observed BEFORE Drop filtering, so counters always report
  * what arrived, not what survived.
  */
object Expectations {

  sealed trait Mode
  case object Warn extends Mode
  case object Drop extends Mode
  case object Fail extends Mode

  final case class Expectation(name: String, condition: Column, mode: Mode = Warn)

  /** Instrument `df` with violation counters (under `obs`) and apply
    * Drop-mode filters. Run an action on the result, then read
    * `obs.get` / [[assertPassed]].
    */
  def withExpectations(df: DataFrame, obs: Observation,
                       exps: Seq[Expectation]): DataFrame = {
    require(exps.nonEmpty, "no expectations given")
    val counters = exps.map(e =>
      count_if(!coalesce(e.condition, lit(false))).as(s"violations_${e.name}")) :+
      count(lit(1)).as("rows_observed")
    val observed = df.observe(obs, counters.head, counters.tail: _*)
    exps.filter(_.mode == Drop)
      .foldLeft(observed)((d, e) => d.filter(coalesce(e.condition, lit(false))))
  }

  /** Violation counts by expectation name (call after an action). */
  def violations(obs: Observation, exps: Seq[Expectation]): Map[String, Long] =
    exps.map(e => e.name ->
      obs.get(s"violations_${e.name}").asInstanceOf[Long]).toMap

  /** Throw if any Fail-mode expectation saw violations. */
  def assertPassed(obs: Observation, exps: Seq[Expectation]): Unit = {
    val failed = exps.filter(_.mode == Fail)
      .map(e => e.name -> obs.get(s"violations_${e.name}").asInstanceOf[Long])
      .filter(_._2 > 0)
    if (failed.nonEmpty)
      sys.error("expectations failed: " +
        failed.map { case (n, c) => s"$n ($c violations)" }.mkString(", "))
  }
}
