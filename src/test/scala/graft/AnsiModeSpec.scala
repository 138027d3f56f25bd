package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins that the battery runs with ANSI SQL mode ON (SURVEY §7.4 risk 2).
  *
  * Spark 4 defaults `spark.sql.ansi.enabled = true` and nothing in the
  * engine, Verify, Bench, or the test harness overrides it — so every
  * green Verify round IS an ANSI-on run, and the engine's coerce-style
  * semantics (pandas `errors='coerce'`, lenient division) are carried by
  * explicit `try_cast`/`try_divide` in the queries, never by flipping
  * the session to legacy mode. This spec makes that posture a pinned
  * fact instead of an assumption: if a future session builder (or a
  * Spark upgrade) silently turned ANSI off, the battery would stop
  * testing the strict-mode behavior the 100-TB deployment will run
  * under — and this test would say so loudly.
  */
class AnsiModeSpec extends AnyFunSuite {
  test("the shared session (mirror of Verify/Bench config) runs ANSI-on") {
    assert(TestSpark.spark.conf.get("spark.sql.ansi.enabled") == "true")
  }

  test("coerce semantics under ANSI come from try_cast, not session mode") {
    import org.apache.spark.sql.functions._
    val spark = TestSpark.spark
    import spark.implicits._
    val df = Seq("1.5", "oops").toDF("s")
    // strict ANSI cast throws on the bad row...
    intercept[Exception] {
      df.select(col("s").cast("double")).collect()
    }
    // ...while the engine's documented coerce path yields null (F8)
    val coerced = df.select(expr("try_cast(s AS double)").as("d"))
      .as[Option[Double]].collect().toSet
    assert(coerced == Set(Some(1.5), None))
  }
}
