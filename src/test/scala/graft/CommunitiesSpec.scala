package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.llm.Communities

/** The two LPA execution paths (one-task simulation vs distributed
  * rounds) are an adaptive pair like connectedComponents' — they must
  * produce identical labels on any input, since the gate that picks
  * between them is a size heuristic, not a semantic switch.
  */
class CommunitiesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // Two 4-cliques joined by one bridge edge, plus an isolated pair:
  // communities should resolve to the min id of each clique and stay
  // stable (label == label_next everywhere) within 4+1 rounds.
  private val pairs = Seq(
    (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
    (10L, 11L), (10L, 12L), (10L, 13L), (11L, 12L), (11L, 13L), (12L, 13L),
    (4L, 10L), // bridge
    (20L, 21L))

  private def run(threshold: Long) = {
    import spark.implicits._
    Communities.labelPropagation(pairs.toDF("id1", "id2"), rounds = 4,
        localThreshold = threshold)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
  }

  test("local and distributed paths agree row-for-row") {
    assert(run(1000000L) == run(0L))
  }

  test("cliques converge to min-id labels and are stable") {
    val out = run(1000000L).map { case (id, l, ln) => id -> (l, ln) }.toMap
    assert(out.values.forall { case (l, ln) => l == ln }, "unstable labels")
    assert(Seq(1L, 2L, 3L, 4L).map(out(_)._1).distinct == Seq(1L))
    assert(Seq(10L, 11L, 12L, 13L).map(out(_)._1).distinct == Seq(10L))
    assert(out(20L)._1 == 20L && out(21L)._1 == 20L)
  }
}
