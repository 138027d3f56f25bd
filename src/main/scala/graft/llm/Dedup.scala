package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines.
  *
  * Three families, all shuffle-bounded and driver-free:
  *  - exact: group on a content hash (see LlmQueries.q_dedup_exact) — the
  *    shuffle key is 16–32 bytes/row regardless of document size;
  *  - MinHash+LSH: shingle → k minhashes → b bands → band-bucket join.
  *    Candidate pairs are generated ONLY within equal band buckets, so
  *    work stays ~linear in corpus size (an all-pairs cross join at
  *    100 TB is never constructed);
  *  - SimHash: 64-bit signature, banded bucketing, Hamming verify.
  *
  * Skew control at scale: a degenerate shingle ("the the the") can drown
  * one band bucket; `maxBucket` drops buckets larger than the cap —
  * the standard stop-shingle mitigation.
  */
object Dedup {

  /** Distinct word tokens per document, exploded. */
  private def words(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("w"))

  /** Exact word-set Jaccard for all pairs sharing ≥1 token. Exact but
    * quadratic in the worst case — callers bound the input (or use the
    * sketch variants); this is the oracle-checkable ground truth.
    */
  def wordJaccardPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val w = words(docs)
    val sizes = w.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val inter = w.as("a")
      .join(w.as("b"), col("a.w") === col("b.w") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .agg(count(lit(1)).as("overlap"))
    inter
      .join(sizes.select(col("doc_id").as("id1"), col("sz").as("sz1")), "id1")
      .join(sizes.select(col("doc_id").as("id2"), col("sz").as("sz2")), "id2")
      .withColumn("jaccard",
        col("overlap") * lit(1.0) / (col("sz1") + col("sz2") - col("overlap")))
      .filter(col("jaccard") >= threshold)
      .select("id1", "id2", "jaccard")
  }

  /** Distinct word n-gram shingles as an array column (empty when the
    * document is shorter than n tokens). */
  def shingles(text: Column, n: Int): Column = {
    val tok = split(text, " ")
    when(size(tok) >= n,
      array_distinct(transform(sequence(lit(0), size(tok) - n),
        i => array_join(slice(tok, i + 1, lit(n)), " "))))
      .otherwise(array(array_join(tok, " ")))
  }

  /** MinHash+LSH near-duplicate pairs.
    *
    * numHashes minhash permutations via seeded xxhash64 (one grouped agg,
    * no per-row loops), `bands` bands of `numHashes/bands` rows each.
    * Docs colliding in ≥1 band become candidates; candidates are verified
    * with exact n-gram Jaccard and filtered at `threshold`.
    */
  def minhashPairs(docs: DataFrame, threshold: Double, shingleN: Int = 3,
                   numHashes: Int = 32, bands: Int = 8,
                   maxBucket: Int = 1000): DataFrame = {
    val rowsPerBand = numHashes / bands
    require(bands * rowsPerBand == numHashes, "bands must divide numHashes")

    val withShingles = docs.select(col("doc_id"),
      shingles(col("text"), shingleN).as("sh"))
    val exploded = withShingles.select(col("doc_id"), explode(col("sh")).as("shingle"))

    // k minhashes in ONE aggregation pass: min over seeded hashes.
    val mhCols = (0 until numHashes).map(i =>
      min(xxhash64(col("shingle"), lit(i))).as(s"mh$i"))
    val sigs = exploded.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)

    // Band hash = hash of the band's minhash rows.
    val bandHashes = (0 until bands).map { b =>
      val rows = (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}"))
      xxhash64(rows: _*)
    }
    val banded = sigs
      .select(col("doc_id"), posexplode(array(bandHashes: _*)).as(Seq("band", "bucket")))

    // Skew guard: drop degenerate buckets before the self-join.
    val bucketCounts = banded.groupBy("band", "bucket").agg(count(lit(1)).as("bc"))
    val bounded = banded.join(
      bucketCounts.filter(col("bc") <= maxBucket).select("band", "bucket"),
      Seq("band", "bucket"))

    val candidates = bounded.as("a")
      .join(bounded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()

    // Exact verify on the candidate set only.
    val sh1 = withShingles.select(col("doc_id").as("id1"), col("sh").as("sh1"))
    val sh2 = withShingles.select(col("doc_id").as("id2"), col("sh").as("sh2"))
    candidates.join(sh1, "id1").join(sh2, "id2")
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))) * lit(1.0) /
          size(array_union(col("sh1"), col("sh2"))))
      .filter(col("jaccard") >= threshold)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** 64-bit SimHash, materialized as four 16-bit parts (ANSI-safe: no
    * 64-bit accumulation that could overflow) — parts double as the LSH
    * bands. A pair is near-duplicate when total Hamming distance across
    * parts ≤ maxHamming; exact match on ≥1 part gates candidacy.
    */
  def simhashParts(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"),
      explode(array_distinct(split(col("text"), " "))).as("w"))
      .withColumn("h", xxhash64(col("w")))
    // Per bit: +1 if set else -1; sign of the sum is the signature bit.
    val bitSums = (0 until 64).map(i =>
      sum(when(shiftright(col("h"), i).bitwiseAND(lit(1L)) === 1L, 1).otherwise(-1))
        .as(s"s$i"))
    val sums = toks.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
    val parts = (0 until 4).map { p =>
      val bits = (0 until 16).map { b =>
        (when(col(s"s${p * 16 + b}") > 0, 1).otherwise(0) * lit(1 << b))
      }
      bits.reduce(_ + _).as(s"part$p")
    }
    sums.select(col("doc_id") +: parts: _*)
  }

  def simhashPairs(docs: DataFrame, maxHamming: Int): DataFrame = {
    val parts = simhashParts(docs)
    val banded = parts.select(col("doc_id"),
      posexplode(array(col("part0"), col("part1"), col("part2"), col("part3")))
        .as(Seq("band", "bucket")))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id1"), col("b.doc_id").as("id2"))
      .distinct()
    val p1 = parts.select(col("doc_id").as("id1"), col("part0").as("x0"),
      col("part1").as("x1"), col("part2").as("x2"), col("part3").as("x3"))
    val p2 = parts.select(col("doc_id").as("id2"), col("part0").as("y0"),
      col("part1").as("y1"), col("part2").as("y2"), col("part3").as("y3"))
    candidates.join(p1, "id1").join(p2, "id2")
      .withColumn("hamming",
        (0 until 4).map(i =>
          bit_count(col(s"x$i").bitwiseXOR(col(s"y$i")))).reduce(_ + _))
      .filter(col("hamming") <= maxHamming)
      .select("id1", "id2", "hamming")
  }
}
