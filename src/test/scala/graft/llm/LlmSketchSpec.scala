package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{LlmQueries3, TestSpark}

/** Property checks for the LlmQueries3 sketch/sampling tranche — the
  * invariants each structure guarantees by construction, independent of
  * the oracle value-compare.
  */
class LlmSketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val sf = "/root/testdata/sf0.001"

  private def run(name: String) =
    LlmQueries3.all.find(_.name == name).get.fn(spark, sf)

  test("count-min estimates never undercount (CMS guarantee)") {
    val rows = run("q_cms_freq").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("cms_est") >= r.getAs[Long]("exact_cnt"),
        s"CMS undercounted ${r.getAs[String]("token")}")
    }
  }

  test("bloom prefilter has zero false negatives") {
    val r = run("q_bloom_prefilter").collect().head
    val (bloom, exact, fp) = (r.getAs[Long]("n_bloom_hits"),
      r.getAs[Long]("n_exact_hits"), r.getAs[Long]("n_false_pos"))
    // every true member passes the filter: hits = members + false pos
    assert(bloom == exact + fp)
    assert(exact > 0) // the denylist sample is non-empty
  }

  test("hash split lands near 80/10/10 and is deterministic") {
    val agg = run("q_split_assign").groupBy("split")
      .agg(sum("n_docs").as("n")).collect()
      .map(r => r.getAs[String]("split") -> r.getAs[Long]("n")).toMap
    val total = agg.values.sum.toDouble
    assert(math.abs(agg("train") / total - 0.8) < 0.1)
    assert(agg.keySet == Set("train", "val", "test"))
    // determinism: a rerun assigns identical buckets
    val a = run("q_split_assign").collect().toSeq
    val b = run("q_split_assign").collect().toSeq
    assert(a == b)
  }

  test("diversity ratios are in (0, 1] and unigram TTR bounds bigram repetition") {
    run("q_ngram_diversity").collect().foreach { r =>
      val ttr = r.getAs[Double]("ttr")
      assert(ttr > 0 && ttr <= 1.0)
      val bttr = r.getAs[Double]("bigram_ttr")
      assert(bttr >= 0 && bttr <= 1.0)
    }
  }

  test("domain mix weights are inverse to actual share at fixed target") {
    val rows = run("q_domain_mix").collect()
    assert(math.abs(rows.map(_.getAs[Double]("target_share")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val w = r.getAs[Double]("weight")
      val expected = r.getAs[Double]("target_share") / r.getAs[Double]("actual_share")
      assert(math.abs(w - expected) < 1e-4)
    }
  }

  test("KMV merge of group sketches equals the sketch of the raw union stream") {
    import org.apache.spark.sql.functions._
    val spark2 = spark
    import spark2.implicits._
    // merged 'ALL' row from the registered query (built from the
    // per-group sketches alone)...
    val all = graft.CoreQueries7.all.find(_.name == "q_kmv_union").get
      .fn(spark, sf).filter(col("scope") === "ALL")
      .select("kmv_estimate").as[Long].head()
    // ...must equal a single global KMV-256 computed directly on the
    // raw keys — the associativity that makes the sketch tree-mergeable.
    val direct = graft.Tables.lineitem(spark, sf)
      .select(Dedup.md5Int(col("l_orderkey").cast("string")).as("hv"))
      .distinct().orderBy("hv").limit(256)
      .agg(floor(lit((256 - 1) * 4294967296.0) / max("hv")).cast("long"))
      .as[Long].head()
    assert(all == direct)
  }

  test("quantized cosine stays within the 0.02 drift contract") {
    val rows = run("q_embed_quantize").collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Boolean]("within_tol")))
  }
}
