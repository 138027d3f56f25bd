package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class EndpointSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("graft-endpoint reads one row per endpoint, in parallel partitions") {
    val dir = Files.createTempDirectory("graft-endpoint")
    val a = dir.resolve("a.json")
    val b = dir.resolve("b.json")
    Files.write(a, """[{"id": 1, "price": "2.5"}]""".getBytes(StandardCharsets.UTF_8))
    Files.write(b, """[{"id": 2, "price": "7.25"}]""".getBytes(StandardCharsets.UTF_8))

    val df = spark.read.format("graft-endpoint")
      .option("urls", s"file://$a,file://$b").load()
    assert(df.schema.fieldNames.toSeq == Seq("endpoint", "value", "fetched_at"))
    assert(df.rdd.getNumPartitions == 2) // one fetch per partition
    val rows = df.orderBy("endpoint").collect()
    assert(rows.length == 2)
    assert(rows(0).getString(1).contains("\"id\": 1"))

    // downstream: raw payload -> from_json normalization (Bronze shape)
    val parsed = df.select(col("endpoint"),
        explode(from_json(col("value"), org.apache.spark.sql.types.DataType.fromDDL("array<struct<id:long, price:string>>"))).as("r"))
      .select(col("r.id"), col("r.price").try_cast("double").as("price"))
      .orderBy("id")
      .as[(Long, Double)].collect().toSeq
    assert(parsed == Seq((1L, 2.5), (2L, 7.25)))
  }

  test("missing urls option fails loudly with the option name") {
    val e = intercept[Exception] {
      spark.read.format("graft-endpoint").load().collect()
    }
    assert(e.getMessage.contains("urls"))
  }
}
