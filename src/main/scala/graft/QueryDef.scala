package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a Spark implementation over the fixture
  * tables plus (when SQL-expressible) the equivalent DuckDB oracle SQL the
  * driver hash-compares against (see `Verify`).
  *
  * Registry conventions that keep the oracle compare stable:
  *  - every output column is explicitly aliased, identically on both sides;
  *  - results end in a deterministic ORDER BY over a unique key set
  *    (Catalyst's `EliminateSorts` removes the sort under `Bench`'s
  *    `count()`, so this costs nothing in the perf path);
  *  - float aggregates whose accumulation order differs between engines
  *    (group-by sums/avgs) are rounded in-query on both sides — sums of
  *    2-decimal data to 2 places (exact-safe), avgs to 6;
  *  - `events.ts` is emitted as a formatted string (both engines truncate
  *    sub-seconds), never as a raw nanosecond timestamp.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
