package graft.llm

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Tables, TestSpark}

class LlmSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("minhash LSH finds planted near-duplicates and skips unrelated docs") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // near-dup of 1
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val pairs = Dedup.minhashPairs(docs, threshold = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhash candidates agree with exact jaccard on the fixtures (no false accepts)") {
    val docs = Tables.documents(spark, sf)
    val out = Dedup.minhashPairs(docs, threshold = 0.7).collect()
    assert(out.nonEmpty) // the corpus has planted near-dups
    out.foreach(r => assert(r.getDouble(2) >= 0.7))
  }

  test("simhash: identical docs have hamming 0; disjoint docs don't collide at ≤6") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "uno dos tres cuatro cinco seis siete ocho")
    ).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(docs, maxHamming = 6)
      .select("id1", "id2", "hamming").as[(Long, Long, Int)].collect()
    assert(pairs.exists { case (a, b, h) => a == 1 && b == 2 && h == 0 })
    assert(!pairs.exists { case (a, b, _) => Set(a, b).contains(3L) })
  }

  test("shingles: 3-grams of a short doc degrade to the whole text") {
    val out = Seq((1L, "a b")).toDF("doc_id", "text")
      .select(Dedup.shingles(col("text"), 3).as("sh")).as[Seq[String]].head()
    assert(out == Seq("a b"))
  }

  test("cosine: orthogonal → 0, identical → 1") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 2.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    val out = df.select(round(Similarity.cosine(col("a"), col("b")), 9).as("c"))
      .as[Double].collect()
    assert(out.toSeq == Seq(0.0, 1.0))
  }

  test("LSH ANN output is consistent with brute-force cosine for every returned pair") {
    val corpus = Tables.embeddings(spark, sf)
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 500)
      .select("query_id", "neighbor_id", "cosine").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val lsh = Similarity.lshTopK(corpus, queries, k = 10)
      .select("query_id", "neighbor_id", "cosine").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (q, n, c) => assert(math.abs(brute((q, n)) - c) < 1e-9) }
  }

  test("IVF ANN returns cosines consistent with brute force; neighbors come from probed cells") {
    val corpus = Tables.embeddings(spark, sf)
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 500)
      .select("query_id", "neighbor_id", "cosine").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val ivf = Similarity.ivfTopK(corpus, queries, k = 10)
      .select("query_id", "neighbor_id", "cosine").as[(Long, Long, Double)].collect()
    assert(ivf.nonEmpty)
    ivf.foreach { case (q, n, c) => assert(math.abs(brute((q, n)) - c) < 1e-9) }
  }

  test("IVF-PQ: ADC scores equal the flat PQ scan on every shared (query, neighbor)") {
    // the cell restriction changes WHICH pairs are scored, never their
    // score: codebooks, code assignment, and LUT are shared chains
    val corpus = Tables.embeddings(spark, sf)
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val flat = Similarity.pqTopK(corpus, queries, k = 500)
      .select("query_id", "neighbor_id", "adc").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val ivfpq = Similarity.ivfPqTopK(corpus, queries, k = 10)
      .select("query_id", "neighbor_id", "adc").as[(Long, Long, Double)].collect()
    assert(ivfpq.nonEmpty)
    val shared = ivfpq.filter { case (q, n, _) => flat.contains((q, n)) }
    assert(shared.nonEmpty, "no candidate overlap with the flat PQ top-500")
    shared.foreach { case (q, n, a) =>
      assert(math.abs(flat((q, n)) - a) < 1e-9, s"ADC mismatch at ($q,$n)")
    }
  }

  test("PQ ANN: ADC scores are non-negative, ranked ascending, and never self-matches") {
    val corpus = Tables.embeddings(spark, sf)
    val queries = corpus.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val pq = Similarity.pqTopK(corpus, queries, k = 10)
      .select("query_id", "neighbor_id", "adc", "rn")
      .as[(Long, Long, Double, Int)].collect()
    assert(pq.nonEmpty)
    pq.groupBy(_._1).foreach { case (q, rows) =>
      assert(rows.map(_._4).sorted.toSeq == (1 to rows.length),
        s"query $q: rn not contiguous from 1")
      val byRn = rows.sortBy(_._4)
      assert(byRn.map(_._3).sliding(2).forall(p => p.head <= p.last + 1e-9),
        s"query $q: adc not ascending with rn")
      assert(rows.forall { case (_, n, a, _) => n != q && a >= -1e-9 })
    }
  }

  test("k-means partitions the corpus and a Lloyd update does not increase inertia") {
    val embs = Tables.embeddings(spark, sf)
    val n = embs.count()
    def profile(rounds: Int) = graft.llm.Clustering.kmeans(embs, k = 4, rounds = rounds)
      .select("cluster", "n_members", "inertia")
      .as[(Long, Long, Double)].collect()
    val one = profile(1)
    val two = profile(2)
    assert(two.map(_._2).sum == n, "clusters must partition the corpus")
    assert(one.map(_._2).sum == n)
    assert(two.map(_._3).sum <= one.map(_._3).sum + 1e-6,
      s"Lloyd update increased inertia: ${one.map(_._3).sum} -> ${two.map(_._3).sum}")
  }

  test("embedding-cosine dedup: LSH pairs are a subset of exact pairs with matching cosines") {
    val embs = Tables.embeddings(spark, sf).filter(col("vec_id") < 300)
    val exact = Dedup.embeddingCosinePairsExact(embs, 0.3)
      .select("id1", "id2", "cosine").as[(Long, Long, Double)]
      .collect().map(t => (t._1, t._2) -> t._3).toMap
    val lsh = Dedup.embeddingCosinePairsLsh(embs, 0.3)
      .select("id1", "id2", "cosine").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty)
    lsh.foreach { case (a, b, c) =>
      assert(exact.contains((a, b)), s"LSH produced pair ($a,$b) not in exact set")
      assert(math.abs(exact((a, b)) - c) < 1e-9)
    }
  }

  test("MinHash UDAF signature equals the k-aggregate expression form, bit for bit") {
    import graft.functions.MinHashAgg
    val docs = Tables.documents(spark, sf).limit(50)
    val hashes = docs.select(col("doc_id"),
      explode(Dedup.shingles(col("text"), 3)).as("shingle"))
      .select(col("doc_id"), xxhash64(col("shingle")).as("h"))
    val viaUdaf = hashes.groupBy("doc_id")
      .agg(MinHashAgg.minhashSig(32)(col("h")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val mhCols = (0 until 32).map(i => min(xxhash64(col("h"), lit(i))).as(s"mh$i"))
    val viaExprs = hashes.groupBy("doc_id").agg(mhCols.head, mhCols.tail: _*)
      .collect().map(r => r.getLong(0) -> (1 to 32).map(r.getLong(_)).toSeq).toMap
    assert(viaUdaf == viaExprs)
  }

  test("connected components merge transitive chains and leave singletons alone") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("HLL approx distinct stays within 5% of the exact count per group") {
    val li = Tables.lineitem(spark, sf)
    val approx = li.groupBy("l_returnflag")
      .agg(approx_count_distinct("l_partkey").as("a"))
      .as[(String, Long)].collect().toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("e"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k) - e).toDouble / e < 0.05,
        s"$k: approx ${approx(k)} vs exact $e")
    }
  }

  test("distributed CC path produces the same labels as the local union-find") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (5L, 6L), (6L, 7L), (7L, 8L))
      .toDF("id1", "id2")
    val local = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    val dist = Dedup.connectedComponents(pairs, localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == dist)
    assert(local(8L) == 5L && local(3L) == 1L && local(11L) == 10L)
  }

  test("CC signals non-convergence instead of returning part-propagated labels") {
    // A 12-node chain has diameter 11: min-label propagation moves the
    // minimum one hop per iteration, so maxIter=5 CANNOT converge — the
    // no-silent-caps contract is an explicit failure, never truncated
    // labels that silently split a real cluster.
    val chain = (0L until 11L).map(i => (i, i + 1)).toDF("id1", "id2")
    val e = intercept[IllegalStateException] {
      Dedup.connectedComponents(chain, maxIter = 5, localThreshold = 0).collect()
    }
    assert(e.getMessage.contains("did not converge"))
    // With enough iterations the same chain fully converges to min-id 0.
    val ok = Dedup.connectedComponents(chain, maxIter = 15, localThreshold = 0)
      .as[(Long, Long)].collect().toMap
    assert(ok.size == 12 && ok.values.forall(_ == 0L))
  }

  test("dedupSurvivors keeps the canonical member per cluster plus all unpaired docs") {
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id1", "id2")
    val survivors = Dedup.dedupSurvivors(docs, pairs).as[Long].collect().toSet
    assert(survivors == Set(1L, 10L, 99L))
  }

  test("fixture dedup end-to-end: survivors = docs minus non-canonical near-dups") {
    val docs = Tables.documents(spark, sf)
    val pairs = Dedup.minhashPairs(docs, 0.7)
    val survivors = Dedup.dedupSurvivors(docs.select("doc_id"), pairs).count()
    val casualties = Dedup.connectedComponents(pairs)
      .filter(col("id") =!= col("component")).count()
    assert(survivors == docs.count() - casualties)
    assert(casualties > 0) // the corpus has planted near-dups
  }

  test("language-id picks the language whose markers dominate") {
    val docs = Seq(
      (1L, "the cat and the dog is a pet"),
      (2L, "el perro y la casa de que y"),
      (3L, "zzz qqq www")).toDF("doc_id", "text")
    val out = TextAnalysis.languageId(docs)
      .select("doc_id", "predicted_lang").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "es")
    assert(out(3L) == "und")
  }

  test("text stats compute token/stopword counts") {
    val out = TextAnalysis.textStats(Seq((1L, "the quick a fox")).toDF("doc_id", "text"))
      .select("n_tokens", "n_stopwords", "stopword_ratio")
      .as[(Long, Long, Double)].head()
    assert(out == ((4L, 2L, 0.5)))
  }

  test("rolling fingerprint is stable under a far-from-window edit, changes under full rewrite") {
    def fp(text: String): Long =
      TextAnalysis.rollingFingerprint(Seq((1L, text)).toDF("doc_id", "text"), window = 3)
        .select("fingerprint").as[Long].head()
    val base = "a b c d e f g h i j"
    // The minimum window hash is position-independent content; appending
    // tokens can only lower it or keep it — equality holds when the
    // minimal window survives.
    val appended = fp(base + " zz")
    assert(fp(base) == fp(base))
    assert(appended <= fp(base))
    assert(fp("completely different words entirely here now") != fp(base))
    // Exact values precomputed with DuckDB's replay of the same integer
    // math (md5-hex token hash, Horner base 131 mod 1e9+7) — pins the
    // cross-engine contract the q_fingerprint_rolling oracle relies on.
    assert(fp(base) == 27032613L)
    assert(fp("short text") == 193455525L) // < window tokens → whole-doc Horner
  }

  test("Md5IntExpr matches the cross-engine md5-prefix contract") {
    // DuckDB: ('0x' || substr(md5('hello'), 1, 8))::BIGINT = 1564557354
    // (md5('hello') = 5d41402a...; byte offset 4 → bc4b2a76).
    val out = Seq("hello").toDF("s")
      .select(Dedup.md5Int(col("s")).as("h0"), Dedup.md5Int(col("s"), 4).as("h4"))
      .as[(Long, Long)].head()
    assert(out._1 == 0x5d41402aL && out._1 == 1564557354L)
    assert(out._2 == 0xbc4b2a76L)
  }

  test("exactSubstrCoverage: overlap telescoping, short-doc dups, clean docs") {
    // doc 1 and 2 share the 8-token run "a b c d e f g h" (doc 2 shifted
    // by one leading token, so its dup windows start at pos 1); doc 3 is
    // clean; docs 4/5 are identical SHORT (<8 tokens) docs — whole-text
    // windows must still collide. Doc 1's tail repeats the run's first
    // token but breaks the window, so no extra coverage.
    val docs = Seq(
      (1L, "a b c d e f g h x y z w q r s t"),
      (2L, "k a b c d e f g h m n o p u v"),
      (3L, "entirely different tokens with no repeats here at all ok"),
      (4L, "tiny shared doc"),
      (5L, "tiny shared doc")).toDF("doc_id", "text")
    val out = TextAnalysis.exactSubstrCoverage(docs, 8)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect()
    // doc 1: one dup window at pos 0 → 8 tokens of 16
    assert(out(0) == ((1L, 16L, 8L, 0.5)))
    // doc 2: same run at pos 1 → 8 of 15
    assert(out(1)._3 == 8L && out(1)._2 == 15L)
    // doc 3: clean
    assert(out(2)._3 == 0L && out(2)._4 == 0.0)
    // docs 4/5: whole-doc windows (wlen=3) collide → full coverage
    assert(out(3) == ((4L, 3L, 3L, 1.0)) && out(4) == ((5L, 3L, 3L, 1.0)))

    // overlapping dup windows telescope: "a b c a b c a b c a" (10 toks)
    // repeated twice across docs → every window dup; coverage = all 10.
    val rep = Seq((1L, "a b c a b c a b c a"), (2L, "a b c a b c a b c a"))
      .toDF("doc_id", "text")
    val cov = TextAnalysis.exactSubstrCoverage(rep, 8)
      .as[(Long, Long, Long, Double)].collect()
    assert(cov.forall(r => r._2 == 10L && r._3 == 10L && r._4 == 1.0))
  }

  test("multimodal: batched stub decode preserves rows and emits fixed-dim features") {
    val docs = Tables.documents(spark, sf).limit(100)
    val feats = Multimodal.extractFeatures(Multimodal.asMediaRecords(docs), batchSize = 7)
    val rows = feats.collect()
    assert(rows.length == 100)
    assert(rows.forall(_.feature.length == 8))
    assert(rows.forall(_.n_bytes > 0))
    // deterministic: re-run equals
    val again = Multimodal.extractFeatures(Multimodal.asMediaRecords(docs), batchSize = 64)
      .collect().map(f => f.doc_id -> f.feature.toSeq).toMap
    rows.foreach(f => assert(again(f.doc_id) == f.feature.toSeq))
  }

  test("chunkSemanticPairs raises loudly on chunk_idx >= 10000 instead of colliding cids") {
    // stride=1/window=2 makes a 10k-token doc overflow the cid encoding
    // without materializing a 240k-token fixture
    val longDoc = (0 until 10002).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, longDoc), (2L, "short doc text here")).toDF("doc_id", "text")
    val e = intercept[Throwable] {
      Dedup.chunkSemanticPairs(docs, window = 2, stride = 1).collect()
    }
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("would collide"),
      s"expected the cid-overflow raise, got: $chain")
    // below the limit the same shape runs clean (no false raise)
    val ok = Seq((1L, (0 until 50).map(i => s"w$i").mkString(" ")))
      .toDF("doc_id", "text")
    Dedup.chunkSemanticPairs(ok, window = 2, stride = 1).collect()
  }

  test("incremental minhash == full pipeline filtered to batch-touching pairs") {
    val docs = Tables.documents(spark, sf)
    val isBatch = col("doc_id") % 4 === 0
    val full = Dedup.minhashPairs(docs, threshold = 0.7)
      .filter(col("id1") % 4 === 0 || col("id2") % 4 === 0)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect().toSet
    val inc = Dedup.minhashPairsIncremental(
        docs.filter(!isBatch), docs.filter(isBatch), threshold = 0.7)
      .select("id1", "id2", "jaccard").as[(Long, Long, Double)].collect().toSet
    assert(inc == full, s"incremental=${inc.size} full-filtered=${full.size}")
    assert(inc.nonEmpty) // the corpus has planted near-dups crossing the split
    // no corpus-internal pair ever surfaces
    inc.foreach { case (a, b, _) => assert(a % 4 == 0 || b % 4 == 0) }
  }
}
