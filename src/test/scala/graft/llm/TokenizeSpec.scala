package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the greedy-BPE edge semantics of the double-space merge
  * encoding (Tokenize.scala) that q_bpe_train's oracle replays — the
  * cases a reviewer has to hand-verify otherwise: overlapping merge
  * sites, adjacent merge sites, single-token and empty docs, and the
  * round-trip token count.
  */
class TokenizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(texts: String*): DataFrame =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), Tokenize.encode(col("text")).as("s"))

  private def rule(pa: String, pb: String): DataFrame =
    Seq((pa, pb, 1L)).toDF("pa", "pb", "cnt")

  private def tokensAfter(df: DataFrame): Seq[Seq[String]] =
    df.orderBy("doc_id").select(Tokenize.tokensOf(col("s")))
      .as[Seq[String]].collect().toSeq

  test("greedy left-to-right: 'a a a' under (a,a) merges once, not twice") {
    val out = tokensAfter(Tokenize.applyMerge(corpus("a a a"), rule("a", "a"), last = true))
    assert(out == Seq(Seq("aa", "a")))
  }

  test("adjacent merge sites both fire: 'a b a b' under (a,b)") {
    val out = tokensAfter(Tokenize.applyMerge(corpus("a b a b"), rule("a", "b"), last = true))
    assert(out == Seq(Seq("ab", "ab")))
  }

  test("merged token does not re-match its own rule's parts: 'a ab b' under (a,b)") {
    // only the literal (a, b) adjacency merges; the pre-existing "ab"
    // token and the merged output never cascade within a round
    val out = tokensAfter(Tokenize.applyMerge(corpus("a ab b"), rule("a", "b"), last = true))
    assert(out == Seq(Seq("a", "ab", "b")))
  }

  test("single-token and empty docs pass through unchanged") {
    val out = tokensAfter(Tokenize.applyMerge(corpus("solo", ""), rule("a", "b"), last = true))
    assert(out == Seq(Seq("solo"), Seq("")))
  }

  test("pair counts: adjacency multiset with duplicates, empty docs contribute none") {
    val pc = Tokenize.pairCounts(corpus("x y x y x", "", "z"))
      .as[(String, String, Long)].collect().toSet
    assert(pc == Set(("x", "y", 2L), ("y", "x", 2L)))
  }

  test("argmax rule tie-breaks by pair ascending after count descending") {
    val top = Tokenize.topRule(Tokenize.pairCounts(corpus("b c", "a d", "a d b c")))
      .as[(String, String, Long)].collect().toSeq
    // (a,d) and (b,c) both count 2 — (a,d) wins the ascending tie-break
    assert(top == Seq(("a", "d", 2L)))
  }

  test("token count drops by the number of applications, not the pair count") {
    val c = corpus("a a a a") // pair (a,a) counted 3 times, merges twice
    val before = Tokenize.nTokens(c).as[Long].head()
    val merged = Tokenize.applyMerge(c, rule("a", "a"), last = true)
    assert(before == 4L)
    assert(Tokenize.nTokens(merged).as[Long].head() == 2L)
    assert(tokensAfter(merged) == Seq(Seq("aa", "aa")))
  }

  // ---- the train() loop API (round 13) --------------------------------

  private val fixtureTexts = Seq(
    "the cat sat on the mat",
    "the cat ran to the mat",
    "a cat and the cat sat",
    "the mat the cat the hat",
    "on the mat sat a cat")

  test("trainMerges: each round's rule equals the per-round primitives' argmax") {
    // replay the loop with topRule/applyMerge by hand and compare
    val c0 = corpus(fixtureTexts: _*)
    val loop = Tokenize.trainMerges(c0, maxMerges = 3, minCount = 1L)
    var cur = c0
    val expected = (0 until 3).map { _ =>
      val r = Tokenize.topRule(Tokenize.pairCounts(cur))
        .as[(String, String, Long)].head()
      cur = Tokenize.applyMerge(cur, rule(r._1, r._2), last = true)
      r
    }
    assert(loop.merges.map(m => (m.pa, m.pb, m.cnt)) == expected)
    // token accounting: nTokensAfter of each merge matches a direct count
    assert(loop.merges.last.nTokensAfter ==
      Tokenize.nTokens(cur).as[Long].head())
    assert(!loop.converged)
  }

  test("trainMerges converges: stops when no pair reaches minCount") {
    // every adjacency distinct → all counts 1 → minCount=2 accepts nothing
    val res = Tokenize.trainMerges(corpus("u v w", "x y z"), maxMerges = 10,
      minCount = 2L)
    assert(res.merges.isEmpty && res.converged)
    // "the cat" repeats 5×; train until dry at minCount=2 — must stop
    // before maxMerges with every accepted rule's count ≥ 2
    val dry = Tokenize.trainMerges(corpus(fixtureTexts: _*), maxMerges = 100,
      minCount = 2L)
    assert(dry.converged && dry.merges.nonEmpty && dry.merges.size < 100)
    assert(dry.merges.forall(_.cnt >= 2L))
    // monotone compression: token totals strictly decrease round-over-round
    val totals = dry.merges.map(_.nTokensAfter)
    assert(totals == totals.sorted.reverse && totals.distinct == totals)
  }

  test("train(vocabSize) round-trips: re-applying the merges table reproduces the trained corpus") {
    val c0 = corpus(fixtureTexts: _*)
    // distinct base tokens: the cat sat on mat ran to a and hat
    val base = 10
    val res = Tokenize.train(c0, vocabSize = base + 4, minCount = 1L,
      checkpointEvery = 2)
    assert(res.baseVocabSize == base)
    assert(res.merges.size == 4)
    val reapplied = Tokenize.applyMergesTo(c0, res.merges)
    assert(tokensAfter(reapplied) == tokensAfter(res.corpus))
    // the merges table IS the tokenizer: applying it to unseen text uses
    // learned units ("the cat" was merged during training)
    val firstMerge = res.merges.head
    val unseen = Tokenize.applyMergesTo(
      corpus(s"${firstMerge.pa} ${firstMerge.pb} q"), res.merges)
    assert(tokensAfter(unseen).head.contains(firstMerge.pa + firstMerge.pb))
  }
}
