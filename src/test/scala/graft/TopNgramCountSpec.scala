package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextExpressions.topNgramCount

/** TopNgramCountExpr must agree with the declarative formulation it
  * replaced (explode → groupBy(doc, gram) → max) on real fixture text,
  * and pin the edge semantics: split-keep-empty tokenization, whole
  * text as one gram when shorter than n tokens.
  */
class TopNgramCountSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("agrees with the exploded groupBy formulation on fixture documents") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("text"))
    val tok = split(col("text"), " ")
    val bigrams = zip_with(
      slice(tok, lit(1), size(tok) - 1), slice(tok, lit(2), size(tok) - 1),
      (x, y) => concat_ws(" ", x, y))
    val declarative = docs.select(col("doc_id"), explode(bigrams).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max("c").as("want"))
    val native = docs.select(col("doc_id"), topNgramCount(col("text"), 2).as("got"))
    val diff = native.join(declarative, "doc_id")
      .filter(col("got") =!= col("want")).count()
    assert(diff == 0)
  }

  test("edge semantics: repeats, empty tokens, short texts") {
    import spark.implicits._
    val cases = Seq(
      ("a b a b a", 2L),   // "a b" twice
      ("x x x x", 3L),     // "x x" three times
      ("a  b", 1L),        // double space -> empty middle token, grams distinct
      ("solo", 1L),        // shorter than n: whole text = one gram
      ("", 1L))            // single empty token
    val got = cases.map(_._1).toDF("text")
      .select(topNgramCount(col("text"), 2)).collect().map(_.getLong(0)).toSeq
    assert(got == cases.map(_._2))
  }
}
