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

  /** A filter shape the lake deliberately has no translation for —
    * collated comparisons don't reduce to naive `===` semantics, so NOT
    * translating them is the correct (unpruned) behavior, which makes
    * one a faithful stand-in for every unknown future filter.
    * (AlwaysTrue used to play this role, but TRUNCATE's deleteWhere
    * synthesizes AlwaysTrue for real, so it now translates exactly.) */
  private def Opaque(): Filter = CollatedEqualTo("a", "x",
    org.apache.spark.sql.types.StringType)

  test("leaves and full compounds translate exactly") {
    assert(t(EqualTo("a", 1)).exists(_._2))
    assert(t(And(EqualTo("a", 1), LessThan("b", 5))).exists(_._2))
    assert(t(Or(EqualTo("a", 1), IsNull("b"))).exists(_._2))
    assert(t(Not(EqualTo("a", 1))).exists(_._2))
  }

  test("And with an untranslatable side degrades to an INEXACT superset; Or/unknown drop whole") {
    val partial = And(EqualTo("a", 1), Opaque())
    assert(t(partial).exists(p => !p._2), "partial And must be usable but inexact")
    assert(t(Or(EqualTo("a", 1), Opaque())).isEmpty,
      "a half-applied disjunction would be STRICTER than the original")
    assert(t(Opaque()).isEmpty)
    // the constant filters DO translate (TRUNCATE routes through
    // deleteWhere(AlwaysTrue)) — exactly, on both polarities
    assert(t(AlwaysTrue).exists(_._2) && t(AlwaysFalse).exists(_._2))
  }

  test("Not never negates an inexact translation (NOT of a superset is a subset = lost rows)") {
    val partial = And(EqualTo("a", 1), Opaque())
    assert(t(Not(partial)).isEmpty,
      "Not(And(a, untranslatable)) as Not(a) would silently drop rows " +
        "where a holds and the other conjunct fails")
    // inexactness propagates through Or into Not too
    val orPartial = Or(And(EqualTo("a", 1), Opaque()), EqualTo("b", 2))
    t(orPartial).foreach { case (_, exact) => assert(!exact) }
    assert(t(Not(orPartial)).isEmpty)
    // double negation of an exact child stays safe
    assert(t(Not(Not(EqualTo("a", 1)))).exists(_._2))
  }
}
