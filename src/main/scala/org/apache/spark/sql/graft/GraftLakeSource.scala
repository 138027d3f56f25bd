package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset => OffsetV1, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.{LongOffset, SerializedOffset}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

import graft.lake.VersionedTable

/** Structured Streaming SOURCE for the versioned lake — the trigger-
  * driven completion of [[graft.lake.ChangeFeedReader]]'s poll API:
  *
  * {{{
  *   spark.readStream.format("graft-lake").load(tableDir)
  * }}}
  *
  * yields the table's row-level change feed (`_commit_version`,
  * `_change_type` columns — the [[VersionedTable.changesBetween]]
  * shape) as micro-batches, with OFFSETS CHECKPOINTED BY THE ENGINE:
  * the offset IS the commit version, so a restarted query resumes from
  * its checkpoint's last committed version and re-delivers exactly the
  * in-flight batch — compose with an idempotent sink
  * ([[VersionedTable.commitAppendIdempotent]] keyed by `batchId`) for
  * end-to-end exactly-once, no hand-rolled cursor file needed.
  *
  * Built on the V1 `Source` interface rather than a DataSourceV2
  * `MicroBatchStream` — deliberately, and for the same reason Delta
  * Lake's streaming source is a V1 `Source`: `getBatch` returns a
  * DataFrame, so the lake's own scan machinery (deletion-vector
  * overlays, column-mapping alignment, per-commit file pruning —
  * everything `changesBetween` already does) is reused verbatim. A V2
  * `PartitionReader` would have to re-implement parquet + DV + mapping
  * decode outside Catalyst. The reference's medallion
  * (`/root/reference/main.py:557,599`) polls in batch; this closes the
  * "lake as a live stream" gap on top of it.
  *
  * Scale posture: each micro-batch reads ONLY the files that changed
  * hands in `(start, end]` (the incremental log drives the read — cost
  * ∝ change, never table size), and the per-batch DataFrame is a plain
  * distributed parquet scan, so a 1000-executor cluster parallelizes
  * within the batch. Offsets are O(1) JSON longs.
  */
/** One registered format, both directions: `readStream.format
  * ("graft-lake")` streams a table's change feed OUT (see
  * [[GraftLakeSource]]); `writeStream.format("graft-lake")
  * .option("appId", ...).start(tableDir)` streams INTO a table with
  * exactly-once appends and no hand-written foreachBatch — each
  * micro-batch lands through
  * [[VersionedTable.commitAppendIdempotent]] keyed by the engine's
  * batch id, so a restart's re-delivered batch commits nothing (the
  * same ledger the foreachBatch pattern uses, now behind the format
  * string). Composing both gives lake → stream → lake with offsets
  * AND delivery idempotence carried entirely by the engine + commit
  * log. */
class GraftLakeSourceProvider extends StreamSourceProvider
    with StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft-lake"

  private def tablePath(parameters: Map[String, String]): String =
    parameters.getOrElse("path", sys.error(
      "graft-lake source requires a table path: .load(<tableDir>)"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    ("graft-lake", GraftLakeSource.changeSchema(
      activeSession(sqlContext), tablePath(parameters)))

  override def createSource(sqlContext: SQLContext,
                            metadataPath: String,
                            schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): Source =
    // reuse the schema the engine already obtained via sourceSchema —
    // no second log-head probe + snapshot-schema resolution at start
    new GraftLakeSource(activeSession(sqlContext), tablePath(parameters),
      schema)

  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(), "graft-lake sink supports " +
      s"Append output mode only (got $outputMode) — aggregations stream " +
      "through foreachBatch + commitOverwriteIdempotent/replaceWhereIdempotent")
    require(partitionColumns.isEmpty, "graft-lake sink does not take " +
      "partitionBy — the lake prunes via file stats and Z-order")
    new GraftLakeSink(activeSession(sqlContext), tablePath(parameters),
      sinkAppId(parameters))
  }

  /** The sink's txn-ledger identity. Two queries writing the SAME table
    * under one appId would share one batch-id ledger — whichever
    * query's ids lag gets silently no-opped, dropped data with no
    * error — so a shared hardcoded default is forbidden: the appId is
    * the user's explicit option, or is DERIVED from the query's
    * checkpoint location (unique per query by construction — the engine
    * refuses to share checkpoints), and otherwise fails loudly. */
  private def sinkAppId(parameters: Map[String, String]): String = {
    def opt(k: String) = parameters.collectFirst {
      case (key, v) if key.equalsIgnoreCase(k) => v }
    opt("appId").orElse(opt("checkpointLocation").map(c =>
      s"graft-lake-sink@${c.stripSuffix("/")}")).getOrElse(sys.error(
      "graft-lake sink requires an explicit .option(\"appId\", ...) " +
        "(or a .option(\"checkpointLocation\", ...) to derive one): " +
        "distinct queries writing one table must not share a txn ledger"))
  }

  private def activeSession(sqlContext: SQLContext): SparkSession =
    sqlContext.asInstanceOf[org.apache.spark.sql.classic.SQLContext].sparkSession
}

/** The exactly-once streaming SINK behind `writeStream.format
  * ("graft-lake")`: every micro-batch is one idempotent lake append
  * tagged (`appId`, engine batchId). The engine re-delivers whole
  * batches on restart/failover; the commit ledger makes the replay a
  * no-op — Delta's txn-keyed sink contract. Distinct queries writing
  * the SAME table must set distinct `appId`s (their batch-id sequences
  * are independent). Blind appends: per-batch cost is O(batch) at any
  * table size — no snapshot read, no key merge. */
class GraftLakeSink(spark: SparkSession, path: String, appId: String)
    extends Sink {
  private val table = VersionedTable(spark, path)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // V1 sink contract: `data` is the engine's streaming-internal
    // frame — re-wrap its physical RDD as a batch DataFrame before
    // handing it to the lake writer (FileStreamSink/DeltaSink do the
    // same), or df.write refuses the streaming plan
    val classicSpark = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val batchDf = classicSpark.internalCreateDataFrame(
      data.queryExecution.toRdd, data.schema, isStreaming = false)
    table.commitAppendIdempotent(batchDf, appId, batchId)
    ()
  }

  override def toString: String = s"GraftLakeSink[$path, appId=$appId]"
}

object GraftLakeSource {
  /** The stream's schema: the table's CURRENT logical schema plus the
    * change-feed metadata columns. Fixed at query start (streaming
    * contract); a mid-stream schema evolution fails the query loudly on
    * the next batch's column mismatch rather than silently widening. */
  def changeSchema(spark: SparkSession, path: String): StructType = {
    val t = VersionedTable(spark, path)
    val v = t.latestVersion().getOrElse(sys.error(
      s"graft-lake source: no committed versions at $path"))
    StructType(t.read(Some(v)).schema.fields ++ Seq(
      StructField("_commit_version", IntegerType, nullable = false),
      StructField("_change_type", StringType, nullable = false)))
  }
}

class GraftLakeSource(spark: SparkSession, path: String,
                      providedSchema: Option[StructType] = None) extends Source {
  private val table = VersionedTable(spark, path)

  override val schema: StructType = providedSchema
    .getOrElse(GraftLakeSource.changeSchema(spark, path))

  /** Head of the table = head of the stream. The engine diffs this
    * against its checkpointed offset to decide whether a trigger has
    * work — an O(1) log-head probe, no file listing. */
  override def getOffset: Option[OffsetV1] =
    table.latestVersion().map(v => LongOffset(v.toLong))

  /** Changes in versions `(start, end]` — exactly
    * [[VersionedTable.changesBetween]], re-tagged `isStreaming` so the
    * engine accepts it as a micro-batch.
    *
    * `start = None` is the INITIAL batch: the SNAPSHOT at `end`
    * surfaces as inserts, all tagged `_commit_version = end` — Delta's
    * starting-snapshot behavior, and deliberately NOT a replay of the
    * historical change feed. Replaying history would (a) deliver
    * delete rows for data that no longer exists, which an insert-only
    * or delete-then-insert consumer would mis-apply into resurrected
    * rows, (b) cost O(all mutations ever), not O(current data), and
    * (c) fail outright on a table whose early versions a vacuum
    * stranded — the snapshot read needs none of them, so a fresh
    * stream bootstraps on a vacuumed table. */
  override def getBatch(start: Option[OffsetV1], end: OffsetV1): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val to = version(end)
    val changes = start match {
      case None => table.read(Some(to))
        .withColumn("_commit_version", lit(to))
        .withColumn("_change_type", lit("insert"))
      case Some(s) => table.changesBetween(version(s), to)
    }
    val aligned = changes.select(schema.fieldNames.map(col).toSeq: _*) // pin order
    val classicSpark = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classicSpark.internalCreateDataFrame(
      aligned.queryExecution.toRdd, schema, isStreaming = true)
  }

  override def stop(): Unit = ()

  /** Offsets round-trip through the checkpoint as JSON; a restarted
    * query hands them back as [[SerializedOffset]]. */
  private def version(o: OffsetV1): Int = o match {
    case l: LongOffset       => l.offset.toInt
    case s: SerializedOffset => s.json.trim.toInt
    case other               => other.json.trim.toInt
  }
}
