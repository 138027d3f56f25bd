package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types.{StructType, StructField, LongType, DoubleType, StringType}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class CsvIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("price", DoubleType)))

  test("clean rows parse, malformed rows quarantine with the raw line intact") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val csv =
      """id,name,price
        |1,widget,9.99
        |2,gadget,not_a_number
        |3,bolt,0.25
        |broken line without commas
        |""".stripMargin
    Files.write(java.nio.file.Paths.get(dir, "part.csv"), csv.getBytes("UTF-8"))

    val in = CsvIngest.read(spark, dir, schema)
    val clean = in.clean.as[(Long, String, Double)].collect().sortBy(_._1).toSeq
    assert(clean == Seq((1L, "widget", 9.99), (3L, "bolt", 0.25)))
    val bad = in.quarantine.as[String].collect().sorted.toSeq
    assert(bad.size == 2)
    assert(bad.exists(_.contains("not_a_number")))
    assert(bad.exists(_.contains("broken line")))
  }

  test("a fully clean file quarantines nothing") {
    val dir = Files.createTempDirectory("graft-csv2").toString
    Files.write(java.nio.file.Paths.get(dir, "ok.csv"),
      "id,name,price\n7,nut,1.5\n".getBytes("UTF-8"))
    val in = CsvIngest.read(spark, dir, schema)
    assert(in.clean.count() == 1 && in.quarantine.count() == 0)
  }
}
