package graft.pipelines

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end replay of the reference's two pipelines (SURVEY §3.1/§3.2)
  * on CoinLore-shaped fixtures.
  */
class PipelinesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ticker pipeline: bronze → silver(clean) → gold(windows), layer by layer") {
    val base = Files.createTempDirectory("graft-ticker").toString
    val raw = Seq(
      ("90", "BTC", "60000.5", "1000000", "500", "100"),
      ("90", "BTC", "notanumber", "1000100", "600", ""),
      ("80", "ETH", "3000.25", "500000", "", "50")
    ).toDF("id", "symbol", "price_usd", "market_cap_usd", "volume24", "volume24a")

    val gold = TickerPipeline.run(spark, raw, base)

    // layers materialized
    assert(spark.read.parquet(s"$base/Bronze/CoinLore/ticker").count() == 3)
    val silver = spark.read.parquet(s"$base/Silver/CoinLore/ticker")
    // silver: coerce+fill+round — bad/empty numerics became 0.0
    val btcBad = silver.filter(col("price_usd") === 0.0)
    assert(btcBad.count() == 1)
    // gold: diff/cumsum columns exist and first-row fallback holds
    assert(gold.columns.toSet.intersect(
      Set("diff_market_cap_usd", "diff_volume24", "cumsum_volume24a")).size == 3)
    val eth = gold.filter(col("id") === "80").select("cumsum_volume24a").as[Double].head()
    assert(eth == 50.0)
  }

  test("raw CoinLore-shaped JSON flows through extract → ticker pipeline (S4–S6 e2e)") {
    val base = Files.createTempDirectory("graft-json").toString
    val wmPath = base + "/metadata_ingestion.json"
    val wm = new graft.lake.Watermark(wmPath)
    val tickerJson =
      """[{"id": "90", "symbol": "BTC", "price_usd": "60000.5",
        |  "market_cap_usd": "1000000", "volume24": "500", "volume24a": "100"},
        | {"id": "80", "symbol": "ETH", "price_usd": "3000.25",
        |  "market_cap_usd": "500000", "volume24": "400", "volume24a": "50"}]""".stripMargin
    val fetch = () => (tickerJson, Some("Mon, 12 Aug 2024 10:11:12 GMT"))
    val raw = graft.sources.JsonNormalize.extract(spark, fetch,
      watermark = Some((wm, "ticker", "fecha_actualizacion")))
    // watermark recorded from the HTTP Date header (S2/S3)
    assert(wm.get("ticker").lastValue == "2024-08-12 10:11:12")
    // normalized frame runs the full pipeline
    val gold = TickerPipeline.run(spark, raw, base)
    assert(gold.count() == 2)
    assert(gold.columns.contains("cumsum_volume24a"))
    val btc = gold.filter(col("id") === "90")
      .select("diff_market_cap_usd").as[Double].head()
    assert(btc == 1000000.0) // first-row fallback
  }

  test("exchanges pipeline: reshape → clean → confidential/silver split with partitioned write") {
    val base = Files.createTempDirectory("graft-exch").toString
    // one wide row: 3 exchanges × 7 fields = 21 columns (≥17 guard)
    val fields = Seq("name", "name_id", "volume_usd", "active_pairs", "url", "country", "extra")
    val cols = for (id <- Seq("1", "2", "3"); f <- fields) yield s"$id.$f"
    val values = Seq(
      "Binance", "binance", "123456.789", "500", "http://b", "Cayman Islands; Tokyo", "x",
      "Kraken", "kraken", "9999.5", "200", "http://k", "US", "y",
      "EUex", "euex", "1.25", "", "http://e", "EU", "z")
    val wide = spark.createDataFrame(
      java.util.List.of(org.apache.spark.sql.Row(values: _*)),
      org.apache.spark.sql.types.StructType(
        cols.map(c => org.apache.spark.sql.types.StructField(c,
          org.apache.spark.sql.types.StringType))))

    val (conf, silver) = ExchangesPipeline.run(spark, wide, base)

    // ';'→',' then split+explode: Binance yields two country rows, recoded
    val binance = conf.filter(col("name") === "Binance")
      .select("country").as[String].collect().toSet
    assert(binance == Set("United Kingdom", "Japan"))
    // 'EU' row filtered out by ~isin (P2)
    assert(conf.filter(col("name") === "EUex").count() == 0)
    // numeric coercion + %.3f: volume_usd is a fixed-decimal string
    val kraken = conf.filter(col("name") === "Kraken")
    assert(kraken.select("volume_usd").as[String].head() == "9999.500")
    // confidential has email; silver masked + dropped
    assert(conf.columns.contains("email"))
    assert(!silver.columns.contains("email") && silver.columns.contains("email_enmascarados"))
    // silver partitioned by country on disk
    val dirs = new java.io.File(s"$base/Silver/CoinLore/exchanges")
      .listFiles().filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("country=")))
  }
}
