package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.JsonNormalize

/** A1–A3 on a CoinLore-exchanges-shaped wide frame, plus the map-explode
  * alternative that avoids the wide schema entirely (SURVEY §7.4.5).
  */
class ReshapeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // One wide row of `<id>.<field>` columns, as json_normalize produces
  // for the exchanges endpoint (/root/reference/main.py:108-128).
  private def wide = Seq(("Binance", "100.5", "OKX", null: String))
    .toDF("5.name", "5.volume_usd", "7.name", "7.volume_usd")

  test("A1: melt turns the wide row into (variable, value) pairs") {
    val long = Reshape.melt(wide, Nil)
    assert(long.count() == 4)
    assert(long.columns.toSeq == Seq("variable", "value"))
  }

  test("A2: regex split extracts id and field from '<id>.<field>'") {
    val split = Reshape.regexSplitVariable(Reshape.melt(wide, Nil))
    val rows = split.select("crypto_id", "variable").as[(String, String)].collect().toSet
    assert(rows == Set(("5", "name"), ("5", "volume_usd"), ("7", "name"), ("7", "volume_usd")))
  }

  test("A3: pivot uses first(ignoreNulls) like pandas aggfunc='first'") {
    val out = Reshape.meltSplitPivot(wide, Seq("name", "volume_usd"))
      .orderBy("crypto_id").collect()
    assert(out.map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq ==
      Seq(("5", "Binance", "100.5"), ("7", "OKX", null)))
  }

  test("first(ignoreNulls) skips nulls within a key (the pandas edge)") {
    val df = Seq(("k", "f", null: String), ("k", "f", "v")).toDF("id", "variable", "value")
    val out = Reshape.pivotFirst(df, "id", "variable", "value", Seq("f")).collect()
    assert(out.head.getString(1) == "v")
  }

  test("map-explode of the raw JSON object equals melt+split+pivot (no wide schema)") {
    val json = """{"5": {"name": "Binance", "volume_usd": "100.5"},
                  | "7": {"name": "OKX", "volume_usd": null}}""".stripMargin
    val schema = StructType(Seq(StructField("name", StringType), StructField("volume_usd", StringType)))
    val viaMap = JsonNormalize.explodeWideObject(spark, json, schema)
      .orderBy("crypto_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    val viaMelt = Reshape.meltSplitPivot(wide, Seq("name", "volume_usd"))
      .orderBy("crypto_id").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(viaMap == viaMelt)
  }

  test("JsonNormalize.flatten produces dot-named columns like pd.json_normalize") {
    val df = JsonNormalize.normalize(spark,
      """[{"id": 1, "quotes": {"USD": {"price": 2.5}}}]""")
    assert(df.columns.toSet == Set("id", "quotes.USD.price"))
    assert(df.select(col("`quotes.USD.price`")).as[Double].head() == 2.5)
  }
}
