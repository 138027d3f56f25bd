package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lake.{LayerPath, LayerWriter}
import graft.ops.{Cleaning, Windows}

/** The reference's incremental (ticker) pipeline, §3.1 of SURVEY.md:
  * Bronze append → Silver clean → Gold window aggregation
  * (`/root/reference/main.py:595-635`).
  *
  * Each stage materializes to its layer (the reference's
  * materialize-between-layers design); stages are also composable
  * in-memory for tests. Column lists mirror the reference's de facto
  * schema (`columnas_incremental_float`, `/root/reference/main.py:567`).
  */
object TickerPipeline {

  /** Ticker numeric columns (`/root/reference/main.py:567`). */
  val floatCols: Set[String] = Set(
    "price_usd", "percent_change_24h", "percent_change_1h",
    "percent_change_7d", "price_btc", "market_cap_usd", "volume24",
    "volume24a", "csupply", "tsupply", "msupply")

  /** Silver stage (`procesamiento_datos_incremental`,
    * `/root/reference/main.py:298-342`): ''→NA, per-column coerce/fill.
    */
  def silver(bronze: DataFrame): DataFrame =
    Cleaning.silverClean(bronze, floatCols)

  /** Gold stage (`columnas_agregacion` call at
    * `/root/reference/main.py:632`): per-coin lag-diff of market cap and
    * volume, running sum of volume24a. `id` is the tiebreaker-bearing
    * sort per A7 (+ a unique-ish ordering for distributed determinism).
    */
  def gold(silver: DataFrame): DataFrame =
    Windows.goldAggregate(silver, grp = "id",
      diffCols = Seq("market_cap_usd", "volume24"),
      cumsumCols = Seq("volume24a"),
      tiebreak = Seq("price_usd"))

  /** Full run: bronze append → silver append → gold append, mirroring the
    * reference's layer writes (`main.py:599,622,635`).
    */
  def run(spark: SparkSession, raw: DataFrame, base: String): DataFrame = {
    val bronzePath = LayerPath(base, "Bronze", "CoinLore", "ticker")
    val silverPath = LayerPath(base, "Silver", "CoinLore", "ticker")
    val goldPath = LayerPath(base, "Gold", "CoinLore", "ticker")

    LayerWriter.write(raw, bronzePath, LayerWriter.Append)
    val silverDf = silver(LayerWriter.read(spark, bronzePath))
    LayerWriter.write(silverDf, silverPath, LayerWriter.Append)
    val goldDf = gold(LayerWriter.read(spark, silverPath))
    LayerWriter.write(goldDf, goldPath, LayerWriter.Append)
    LayerWriter.read(spark, goldPath)
  }
}
