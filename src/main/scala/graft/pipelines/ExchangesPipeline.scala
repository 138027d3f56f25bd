package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.lake.{LayerPath, LayerWriter}
import graft.ops.{Cleaning, Pii, Recode, Reshape}

/** The reference's full (exchanges) pipeline, §3.2 of SURVEY.md:
  * Bronze overwrite → melt/split/pivot reshape → clean chain →
  * synthetic email → Confidential (unmasked) + Silver (masked,
  * partitioned by country) (`/root/reference/main.py:596-623`).
  */
object ExchangesPipeline {

  /** The 7-column projection (`/root/reference/main.py:228`). */
  val projection = Seq("id", "name", "name_id", "volume_usd", "active_pairs", "url", "country")

  /** Reshape stage (`procesamiento_melt_datos_full`,
    * `/root/reference/main.py:195-234`): one-wide-row `<id>.<field>`
    * frame → melt → regex split → pivot(first) → project. Guarded by the
    * reference's column-count check (P3).
    */
  def reshape(wide: DataFrame): DataFrame = {
    Cleaning.requireColumns(wide, 17)
    Reshape.meltSplitPivot(wide, projection.filterNot(_ == "id"))
      .withColumnRenamed("crypto_id", "id")
      .select(projection.map(col): _*)
  }

  /** Clean stage (`procesamiento_datos_full`,
    * `/root/reference/main.py:237-295`), in pipeline order: `;`→`,`
    * replace (F1), split+explode_outer (F2/F3, pandas keeps NaN rows),
    * `~isin` filter with null retention (P2), ''→null (F4), country
    * recode (F5), per-dtype fills/casts (F6–F10), `%.3f` string format
    * of volume_usd (F11).
    */
  def clean(df: DataFrame): DataFrame = {
    val explodedCountry = df
      .withColumn("country", regexp_replace(col("country"), ";", ","))
      .withColumn("country", explode_outer(split(col("country"), ", ")))
      .filter(!col("country").isin("EU", "NV") || col("country").isNull)
      .withColumn("country", Cleaning.emptyToNull(col("country")))
      .withColumn("country", Recode.viaMapLiteral(col("country"), Recode.countryRecode))
    val numeric = Seq("volume_usd", "active_pairs")
    val cleaned = explodedCountry.schema.fields.map { f =>
      if (numeric.contains(f.name))
        coalesce(col(f.name).try_cast(DoubleType), lit(0.0)).as(f.name)
      else Cleaning.fillString(col(f.name)).as(f.name)
    }
    explodedCountry.select(cleaned.toIndexedSeq: _*)
      .withColumn("volume_usd", Cleaning.formatFixed(col("volume_usd")))
  }

  /** Full run, returning (confidential, silver). Silver is partitioned by
    * `country` (`main.py:623`) — the partition-pruning lever downstream.
    */
  def run(spark: SparkSession, wide: DataFrame, base: String): (DataFrame, DataFrame) = {
    val bronzePath = LayerPath(base, "Bronze", "CoinLore", "exchanges")
    LayerWriter.write(wide, bronzePath, LayerWriter.Overwrite)

    val shaped = clean(reshape(LayerWriter.read(spark, bronzePath)))
    // Branch point (main.py:613-623). The surrogate is deterministic
    // (Pii.surrogateEmail), so the branch is correct without caching;
    // cache anyway to avoid recomputing the reshape for both writes.
    val withEmail = shaped.withColumn("email", Pii.surrogateEmail(col("name_id"))).cache()
    val masked = withEmail
      .withColumn("email_enmascarados", Pii.maskEmail(col("email")))
      .drop("email")

    LayerWriter.write(withEmail, LayerPath(base, "Confidential", "CoinLore", "exchanges"))
    LayerWriter.write(masked, LayerPath(base, "Silver", "CoinLore", "exchanges"),
      LayerWriter.Overwrite, partitionCol = Some("country"))
    (LayerWriter.read(spark, LayerPath(base, "Confidential", "CoinLore", "exchanges")),
      LayerWriter.read(spark, LayerPath(base, "Silver", "CoinLore", "exchanges")))
  }
}
