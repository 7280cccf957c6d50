package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Largest-remainder apportionment invariants of t23's kernel
  * ([[TextAnalysis.mixtureBudget]]) on hand-built count tables: the
  * targets always sum to exactly the budget, weight order is respected,
  * and the degenerate budget < |sources| case still resolves
  * deterministically. */
class MixtureBudgetSpec extends AnyFunSuite with SparkFixture {

  private def run(counts: Seq[(String, Long)], budget: Long): Map[String, Long] = {
    val s = spark
    import s.implicits._
    TextAnalysis.mixtureBudget(counts.toDF("source", "n_docs"), budget)
      .collect()
      .map(r => r.getString(0) -> r.getLong(3))
      .toMap
  }

  test("targets sum to exactly the budget (no drift from flooring)") {
    val t = run(Seq("a" -> 100L, "b" -> 250L, "c" -> 7L, "d" -> 1L), 1000L)
    assert(t.values.sum == 1000L)
  }

  test("sqrt weighting upweights small sources but keeps the order") {
    val t = run(Seq("big" -> 10000L, "small" -> 100L), 1000L)
    // plain proportional would give small ~1%; sqrt gives it ~9%
    assert(t("small") > 1000L / 100)
    assert(t("big") > t("small"))
    assert(t.values.sum == 1000L)
  }

  test("a single source takes the whole budget") {
    assert(run(Seq("only" -> 42L), 1000L) == Map("only" -> 1000L))
  }

  test("budget below the source count: remainders pick deterministically") {
    val t = run(Seq("a" -> 9L, "b" -> 9L, "c" -> 9L, "d" -> 9L), 2L)
    assert(t.values.sum == 2L)
    // equal weights → base 0, equal remainders → name tiebreak
    assert(t == Map("a" -> 1L, "b" -> 1L, "c" -> 0L, "d" -> 0L))
  }

  test("equal counts split a divisible budget evenly") {
    val t = run(Seq("a" -> 64L, "b" -> 64L, "c" -> 64L, "d" -> 64L), 1000L)
    assert(t.values.sum == 1000L)
    assert(t.values.max - t.values.min <= 1)
  }
}
