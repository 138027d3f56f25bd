package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot aggregation keys (SURVEY §7 scale levers).
  *
  * A single groupBy on a skewed key routes the hot key's entire volume
  * through one reducer. `saltedAgg` splits each key into `salts`
  * sub-keys (salt derived by hashing a caller-chosen column), partially
  * aggregates on (key, salt) — map-side combine keeps this cheap — then
  * finalizes on key alone. Two shuffles, but the first spreads the hot
  * key across `salts` reducers; the second moves only keys × salts rows.
  *
  * Algebraic aggregates only (sum/count/min/max — anything with an
  * associative merge). The result is IDENTICAL to the direct groupBy
  * (the oracle-checked q_salted_agg proves it); AQE's skew-join handles
  * join-side skew, this handles aggregation-side skew.
  */
object Skew {

  /** Sum+count per key via two-level salted aggregation. `saltFrom`
    * should be a high-cardinality column (a row id); the salt only
    * affects load spread, never the result.
    */
  def saltedAgg(df: DataFrame, key: String, salts: Int, sumCol: String,
                saltFrom: Column): DataFrame = {
    df.withColumn("__salt", pmod(xxhash64(saltFrom), lit(salts.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(sumCol).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum("__psum").as(s"sum_$sumCol"), sum("__pcnt").as("n_rows"))
  }

  /** Skew-replicated equi-join: the fact side gets a deterministic salt
    * in [0, salts), the (small) dim side is replicated once per salt,
    * and the join runs on (key, salt) — a hot fact key spreads across
    * `salts` reducers instead of melting one. Join results are IDENTICAL
    * to the unsalted join (q_salted_join proves it against the oracle).
    *
    * Use when the dim side is too big to broadcast outright but small
    * enough to replicate `salts`× through a shuffle, and AQE's runtime
    * skew splitting isn't available (e.g. the skewed side is already
    * partitioned by the join key for a later stage).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                 saltFrom: Column): DataFrame = {
    val salted = fact.withColumn("__salt", pmod(xxhash64(saltFrom), lit(salts.toLong)))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until salts).map(i => lit(i.toLong)): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }
}
