package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** The iterative components operator on synthetic graphs — convergence
  * over long diameters (many label-propagation rounds), disjoint
  * components, and isolated-vertex exclusion. */
class GraphOpsSpec extends AnyFunSuite with SparkFixture {

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val s = spark
    import s.implicits._
    GraphOps.components(edges.toDF("da", "db"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("a long path converges to one component (diameter >> 1 round)") {
    // path 10-11-12-...-29: diameter 19, forces many propagation rounds
    val path = (10L until 29L).map(i => (i, i + 1))
    val comps = run(path)
    assert(comps.size == 20)
    assert(comps.values.toSet == Set(10L))
  }

  test("disjoint components get distinct min labels") {
    val comps = run(Seq((1L, 2L), (2L, 3L), (7L, 9L), (20L, 21L)))
    assert(comps == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      7L -> 7L, 9L -> 7L,
      20L -> 20L, 21L -> 20L))
  }

  test("edge order and direction don't matter") {
    val a = run(Seq((5L, 3L), (3L, 8L)))
    val b = run(Seq((8L, 3L), (5L, 3L)))
    assert(a == b)
    assert(a.values.toSet == Set(3L))
  }
}
