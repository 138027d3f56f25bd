package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S4–S7: the reference's ingest edge, Spark-first.
  *
  * The reference does `requests.get(...).json()` → `pd.json_normalize`
  * (`/root/reference/main.py:79-192`). Here extraction is an injected
  * fetch function (driver-side, tiny payloads — the API returns ~3 coins /
  * ~100 exchanges per call; the *data path* stays distributed because the
  * parsed JSON immediately becomes a DataFrame). For genuinely large
  * feeds the same surface would be backed by a DataSourceV2 TableProvider;
  * nothing downstream changes.
  */
object JsonNormalize {

  /** S5 (array case): array-of-objects JSON → one row per object, nested
    * structs flattened to dot-named columns like `pd.json_normalize`.
    */
  def normalize(spark: SparkSession, json: String): DataFrame = {
    import spark.implicits._
    flatten(spark.read.json(Seq(json).toDS))
  }

  /** Recursive struct flatten: `a: {b, c}` → columns `a.b`, `a.c`
    * (literal dot in the name, matching pandas output).
    */
  def flatten(df: DataFrame): DataFrame = {
    def colsOf(parent: org.apache.spark.sql.Column, st: StructType, prefix: String)
        : Seq[org.apache.spark.sql.Column] =
      st.fields.flatMap { f =>
        val full = if (prefix.isEmpty) f.name else s"$prefix.${f.name}"
        f.dataType match {
          case nested: StructType => colsOf(parent.getField(f.name), nested, full)
          case _ => Seq(parent.getField(f.name).as(full))
        }
      }.toSeq
    val top = df.schema.fields.flatMap { f =>
      f.dataType match {
        case st: StructType => colsOf(col(s"`${f.name}`"), st, f.name)
        case _ => Seq(col(s"`${f.name}`"))
      }
    }.toSeq
    df.select(top: _*)
  }

  /** S5 (wide-object case, the exchanges endpoint): a single top-level
    * JSON *object* keyed by id (`{"1": {...}, "2": {...}}`). The
    * reference normalizes this into ONE row × `<id>.<field>` columns and
    * then melts it back (SURVEY §7.4.5 flags that as planner-hostile at
    * scale). This path parses it as a map and explodes — same long-form
    * output as melt+regex-split, no wide schema ever exists.
    */
  def explodeWideObject(spark: SparkSession, json: String,
                        fieldSchema: StructType): DataFrame = {
    import spark.implicits._
    val mapType = MapType(StringType, fieldSchema)
    spark.createDataset(Seq(json))
      .select(from_json(col("value"), mapType).as("m"))
      .select(explode(col("m")).as(Seq("crypto_id", "fields")))
      .select(col("crypto_id"), col("fields.*"))
  }

  /** S6/S7: extraction composite — fetch, normalize, optionally record
    * the watermark derived from the response timestamp (S2/S3). Mirrors
    * `aplicar_extraccion_incremental` / `_full`
    * (`/root/reference/main.py:131-192`) with the fetch injected.
    */
  def extract(spark: SparkSession, fetch: () => (String, Option[String]),
              watermark: Option[(graft.lake.Watermark, String, String)] = None)
      : DataFrame = {
    val (body, httpDate) = fetch()
    val df = normalize(spark, body)
    for {
      (wm, table, column) <- watermark
      date <- httpDate
    } wm.update(table,
      graft.lake.WatermarkEntry(column, graft.lake.Watermark.fromHttpDate(date)))
    df
  }
}
