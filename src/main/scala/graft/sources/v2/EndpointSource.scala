package graft.sources.v2

import java.util
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSourceV2 connector for the reference's REST-ingest edge (S4,
  * `extraer_datos_incrementales`, `/root/reference/main.py:79-105`),
  * expressed as a first-class Spark table:
  *
  * {{{
  *   spark.read.format("graft-endpoint")
  *     .option("urls", "file:///a.json,file:///b.json")
  *     .load()           // => (endpoint, value, fetched_at), one row per endpoint
  * }}}
  *
  * Each endpoint becomes ONE InputPartition, so N endpoints are fetched
  * in parallel by executors — the distribution story the reference's
  * single-threaded `requests.get` lacks. The payload lands raw
  * (`value` string + fetch metadata), matching Bronze-ingest semantics;
  * parsing/normalization is downstream (`from_json`,
  * `JsonNormalize.flatten`), where Catalyst can see it.
  *
  * Zero-egress environment: only `file://` endpoints are resolvable
  * here; the fetch seam (`EndpointPartitionReader.fetch`) is where an
  * HTTP client would slot in unchanged.
  */
class EndpointSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-endpoint"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    EndpointSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new EndpointTable(properties.asScala.toMap)
}

object EndpointSource {
  val schema: StructType = StructType(Seq(
    StructField("endpoint", StringType, nullable = false),
    StructField("value", StringType, nullable = true),
    StructField("fetched_at", TimestampType, nullable = false)))

  def urls(props: Map[String, String]): Seq[String] =
    props.get("urls").orElse(props.get("url"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(throw new IllegalArgumentException(
        "graft-endpoint requires option 'urls' (comma-separated) or 'url'"))
}

private[v2] class EndpointTable(props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-endpoint(${EndpointSource.urls(props).mkString(",")})"
  override def schema(): StructType = EndpointSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new EndpointScan(EndpointSource.urls(props))
}

private[v2] class EndpointScan(urls: Seq[String])
    extends ScanBuilder with Scan with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = EndpointSource.schema
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    urls.map(u => EndpointPartition(u): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new EndpointReaderFactory
}

private[v2] case class EndpointPartition(url: String) extends InputPartition

private[v2] class EndpointReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new EndpointPartitionReader(partition.asInstanceOf[EndpointPartition].url)
}

private[v2] class EndpointPartitionReader(url: String)
    extends PartitionReader[InternalRow] {
  private var consumed = false

  /** The fetch seam: file:// here; an HTTP client in production. */
  private def fetch(u: String): String = {
    val path = if (u.startsWith("file://")) u.stripPrefix("file://") else u
    new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
  }

  override def next(): Boolean = !consumed
  override def get(): InternalRow = {
    consumed = true
    val body = fetch(url)
    InternalRow(
      UTF8String.fromString(url),
      UTF8String.fromString(body),
      System.currentTimeMillis() * 1000L)
  }
  override def close(): Unit = ()
}
