package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.StringSimilarity

/** JaroWinklerExpr semantics pinned against DuckDB's
  * `jaro_winkler_similarity` (expected values computed there verbatim) —
  * the oracle for q_jaro_linkage replays the same function, so these are
  * the cross-engine contract: standard Winkler (0.1 prefix weight, cap
  * 4, 0.7 boost threshold), empty-side → 0 including both-empty.
  */
class JaroWinklerSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  // (a, b, duckdb jaro_winkler_similarity(a, b))
  private val cases = Seq(
    ("martha", "marhta", 0.9611111111111111),   // classic transposition
    ("dixon", "dicksonx", 0.8133333333333332),  // length mismatch
    ("abcdef", "abzzzz", 0.5555555555555555),   // jaro ≤ 0.7: NO prefix boost
    ("CRATE", "TRACE", 0.7333333333333334),     // just above boost, prefix 0
    ("prefix", "prefixxxxx", 0.92),             // prefix cap at 4
    ("jellyfish", "smellyfish", 0.8962962962962964),
    ("abcdexyz", "abcfexyz", 0.9416666666666667),
    ("goldenrod lavender", "goldenrod lace", 0.9301587301587302),
    ("ab", "ba", 0.0),                          // window 0: no matches
    ("x", "y", 0.0),
    ("a", "a", 1.0),
    ("abc", "abc", 1.0),
    ("", "abc", 0.0),
    ("", "", 0.0)                               // DuckDB: both empty → 0
  )

  test("jaroWinkler matches DuckDB bit-for-bit on the pinned cases") {
    import spark.implicits._
    val got = cases.map { case (a, b, _) => (a, b) }.toDF("a", "b")
      .select(StringSimilarity.jaroWinkler($"a", $"b"))
      .collect().map(_.getDouble(0))
    cases.zip(got).foreach { case ((a, b, want), have) =>
      assert(have == want, s"jaro_winkler('$a','$b')")
    }
  }

  test("non-ASCII compares by UTF-16 code unit — the documented DuckDB divergence boundary") {
    // 'é' is ONE UTF-16 code unit here but TWO bytes in DuckDB's
    // byte-wise comparison, so the engines agree only on ASCII:
    //   ours:  café(4 units) vs cafe → m=3, jaro 2.5/3, prefix 3
    //          → 0.88333…
    //   DuckDB: café(5 bytes) vs cafe → m=3, jaro (3/5+3/4+1)/3,
    //          prefix 3 → 0.84833…
    // This pins OUR semantics (character-level, arguably the more
    // useful linkage behavior); the oracle-checked q_jaro_linkage
    // runs on ASCII fixture names where the two coincide.
    import spark.implicits._
    val have = Seq(("café", "cafe")).toDF("a", "b")
      .select(StringSimilarity.jaroWinkler($"a", $"b"))
      .collect().head.getDouble(0)
    assert(math.abs(have - 0.8833333333333333) < 1e-12,
      s"UTF-16 code-unit semantics changed: $have")
  }

  test("null on either side is null, and the expression survives codegen in a filter") {
    import spark.implicits._
    val df = Seq((Option("abc"), Option("abd")), (None, Option("x")),
      (Option("x"), None)).toDF("a", "b")
    val out = df.select(StringSimilarity.jaroWinkler($"a", $"b").as("j"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(out(1).isEmpty && out(2).isEmpty && out(0).nonEmpty)
    // filter path (whole-stage codegen): symmetric, bounded in [0,1]
    val n = df.filter(StringSimilarity.jaroWinkler($"a", $"b") >= 0.0 &&
      StringSimilarity.jaroWinkler($"b", $"a") <= 1.0).count()
    assert(n == 1)
  }
}
