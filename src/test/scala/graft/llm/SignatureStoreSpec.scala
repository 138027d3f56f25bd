package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}
import graft.lake.{Scratch, VersionedTable}

/** End-to-end proof of the "persistable signature store" claim behind
  * q_dedup_incremental: banded minhash signatures written to a
  * versioned table at ingest time, read back later, and used to dedup
  * arriving batches WITHOUT re-banding the corpus — with results
  * identical to the in-memory incremental path. Also exercises the
  * operational loop: after each batch is admitted, its signatures are
  * APPENDED to the store (a new lake version), and the next batch
  * dedups against the grown corpus.
  */
class SignatureStoreSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double)] =
    df.select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect().toSet

  test("dedup from a persisted store == in-memory incremental; store grows per batch") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 4 =!= 0)
    val batch1 = docs.filter(col("doc_id") % 8 === 0)
    val batch2 = docs.filter(col("doc_id") % 8 === 4)

    val store = VersionedTable(spark, Scratch.dir("sigstore-"))
    store.commitOverwrite(Dedup.minhashSignatureStore(corpus))

    // Batch 1 against the read-back store: identical to the in-memory
    // path (and the store side never re-reads corpus text for banding).
    val fromStore1 = pairSet(Dedup.minhashPairsFromStore(
      store.read(), corpus, batch1, threshold = 0.7))
    val direct1 = pairSet(Dedup.minhashPairsIncremental(corpus, batch1, threshold = 0.7))
    assert(fromStore1 == direct1)
    assert(fromStore1.nonEmpty, "fixtures plant near-dups crossing the split")

    // Admit batch 1: append its signatures (new version, incremental
    // cost ∝ batch), then batch 2 sees the grown corpus.
    store.commitAppend(Dedup.minhashSignatureStore(batch1))
    val corpus2 = corpus.unionByName(batch1)
    val fromStore2 = pairSet(Dedup.minhashPairsFromStore(
      store.read(), corpus2, batch2, threshold = 0.7))
    val direct2 = pairSet(Dedup.minhashPairsIncremental(corpus2, batch2, threshold = 0.7))
    assert(fromStore2 == direct2)

    // The store's version history reflects the ingest log.
    assert(store.versions() == Seq(0, 1))
  }
}
