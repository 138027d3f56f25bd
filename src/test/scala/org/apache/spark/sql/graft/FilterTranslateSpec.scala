package org.apache.spark.sql.graft

import org.apache.spark.sql.sources._
import org.scalatest.funsuite.AnyFunSuite

/** The pushdown translation's safety rule (GraftLakeRelation.translate):
  * the translated predicate is applied as a REAL row filter inside the
  * relation, so only SUPERSET (weaker-or-equal) translations may
  * surface — a stricter predicate silently loses rows before the
  * engine's re-applied copy can see them. The one construct that flips
  * a safe superset into an unsafe subset is NOT over a PARTIAL
  * translation.
  */
class FilterTranslateSpec extends AnyFunSuite {
  private def t(f: Filter) = GraftLakeRelation.translate(f)

  test("leaves and full compounds translate exactly") {
    assert(t(EqualTo("a", 1)).exists(_._2))
    assert(t(And(EqualTo("a", 1), LessThan("b", 5))).exists(_._2))
    assert(t(Or(EqualTo("a", 1), IsNull("b"))).exists(_._2))
    assert(t(Not(EqualTo("a", 1))).exists(_._2))
  }

  test("And with an untranslatable side degrades to an INEXACT superset; Or/unknown drop whole") {
    val partial = And(EqualTo("a", 1), AlwaysTrue)
    assert(t(partial).exists(p => !p._2), "partial And must be usable but inexact")
    assert(t(Or(EqualTo("a", 1), AlwaysTrue)).isEmpty,
      "a half-applied disjunction would be STRICTER than the original")
    assert(t(AlwaysTrue).isEmpty)
  }

  test("Not never negates an inexact translation (NOT of a superset is a subset = lost rows)") {
    val partial = And(EqualTo("a", 1), AlwaysTrue)
    assert(t(Not(partial)).isEmpty,
      "Not(And(a, untranslatable)) as Not(a) would silently drop rows " +
        "where a holds and the other conjunct fails")
    // inexactness propagates through Or into Not too
    val orPartial = Or(And(EqualTo("a", 1), AlwaysTrue), EqualTo("b", 2))
    t(orPartial).foreach { case (_, exact) => assert(!exact) }
    assert(t(Not(orPartial)).isEmpty)
    // double negation of an exact child stays safe
    assert(t(Not(Not(EqualTo("a", 1)))).exists(_._2))
  }
}
