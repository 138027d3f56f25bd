package graft.typed

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.Tables

/** Typed `Dataset[T]` surface over the fixture tables (SURVEY §1.3: the
  * engine's public face is untyped DataFrame like the reference's
  * pandas, but case-class encoders are exposed where compile-time safety
  * helps — ETL boundary code, tests).
  *
  * Tradeoff, stated: typed lambdas (`filter(_.l_quantity > x)`)
  * deserialize rows and escape Catalyst — no pushdown, no codegen
  * pipeline. Use the typed surface for correctness-critical glue, keep
  * hot paths as Column expressions. q_typed_filter deliberately mixes
  * both: a Column pushdown filter then a typed projection, showing the
  * boundary.
  */
object TypedTables {

  final case class LineItem(
      l_orderkey: Long, l_partkey: Long, l_suppkey: Long, l_linenumber: Int,
      l_quantity: Double, l_extendedprice: Double, l_discount: Double,
      l_tax: Double, l_returnflag: String, l_linestatus: String,
      l_shipdate: java.time.LocalDateTime)

  final case class Order(
      o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
      o_totalprice: Double, o_orderdate: java.time.LocalDateTime,
      o_orderpriority: String)

  final case class Event(
      event_id: Long, ts: Timestamp, user_id: Long, event_type: String,
      value: Double, props: String)

  def lineitems(spark: SparkSession, sfDir: String): Dataset[LineItem] = {
    import spark.implicits._
    Tables.lineitem(spark, sfDir).as[LineItem]
  }

  def orders(spark: SparkSession, sfDir: String): Dataset[Order] = {
    import spark.implicits._
    Tables.orders(spark, sfDir).as[Order]
  }

  def events(spark: SparkSession, sfDir: String): Dataset[Event] = {
    import spark.implicits._
    Tables.events(spark, sfDir).as[Event]
  }
}
