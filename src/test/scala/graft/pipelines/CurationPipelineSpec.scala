package graft.pipelines

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class CurationPipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("curation flow: filter → dedup → chunk with provenance, on fixtures") {
    val docs = Tables.documents(spark, sfDir)
    val res = CurationPipeline.run(docs)
    val chunks = res.chunks.cache()
    val n = chunks.count()
    assert(n > 0)
    res.assertPassed()
    assert(res.metrics("text_nonempty") == 0) // fixture has no empty docs
    // provenance: every chunk carries its doc's quality signals
    assert(chunks.filter(col("rep_ratio").isNull || col("n_tokens").isNull).count() == 0)
    // only keep-quality docs survive
    val keptIds = graft.llm.TextAnalysis
      .gopherFilter(docs).filter(col("keep"))
      .select("doc_id").as[Long].collect().toSet
    val chunkIds = chunks.select("doc_id").distinct().as[Long].collect().toSet
    assert(chunkIds.subsetOf(keptIds))
    // chunk geometry: every chunk ≤ window tokens, non-empty
    val bad = chunks.filter(col("n_chunk_tokens") > 64 || col("n_chunk_tokens") < 1).count()
    assert(bad == 0)
    // chunk indexes are dense per doc (0..k-1)
    val dense = chunks.groupBy("doc_id")
      .agg(count(lit(1)).as("n"), max("chunk_idx").as("mx"))
      .filter(col("mx") =!= col("n") - 1).count()
    assert(dense == 0)
    // and the curated output lands in the versioned lake: one commit,
    // time-travel-able, replay-safe via keyed merge
    val path = java.nio.file.Files.createTempDirectory("graft-curated").toString + "/chunks"
    val vt = graft.lake.VersionedTable(spark, path)
    vt.insertOnlyMerge(chunks, keys = Seq("doc_id", "chunk_idx"))
    vt.insertOnlyMerge(chunks, keys = Seq("doc_id", "chunk_idx")) // replay: no-op
    assert(vt.versions() == Seq(0))
    assert(vt.read().count() == n)
    chunks.unpersist()
  }

  test("drop-mode expectation removes empty docs before chunking") {
    val docs = Seq((1L, "the quick brown fox " * 20), (2L, "")).toDF("doc_id", "text")
    val res = CurationPipeline.run(docs, CurationPipeline.Config(
      minTokens = 5, maxRepRatio = 0.9, minAlphaRatio = 0.5))
    val ids = res.chunks.select("doc_id").distinct().as[Long].collect().toSeq
    assert(ids == Seq(1L))
    assert(res.metrics("text_nonempty") == 1)
  }
}
