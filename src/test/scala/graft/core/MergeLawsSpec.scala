package graft.core

import graft.core.graph.{Dag, Selector}
import graft.core.model._
import graft.core.yaml._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests (SURVEY §5 "improvement, not parity"): algebraic laws of
  * the safe_update merge, NamedList round-trips, and the selector algebra
  * over random DAGs. Uses raw ScalaCheck generators with fixed seeds (no
  * scalatest-plus bridge in the dependency set) — 100 deterministic cases
  * per law. */
class MergeLawsSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb))(t => f(t._1, t._2))
  private def forAll3[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C])(
      f: (A, B, C) => Unit): Unit =
    forAll(Gen.zip(ga, gb, gc))(t => f(t._1, t._2, t._3))

  // ---- generators -------------------------------------------------------
  // YNull is a deletion MARKER in merge sources (the reference's
  // None-deletes), so a map containing YNull is not a merge fixed point;
  // the identity/idempotence laws are stated over null-free maps and the
  // deletion behavior is asserted separately.
  private val keyGen: Gen[String] = Gen.oneOf("a", "b", "c", "d", "name", "v")
  private def yGen(depth: Int, withNull: Boolean): Gen[Y] = {
    val scalars: Seq[Y] =
      Seq(YStr("s"), YInt(1), YBool(true)) ++ (if (withNull) Seq(YNull) else Nil)
    if (depth <= 0) Gen.oneOf(scalars)
    else Gen.frequency(
      3 -> Gen.oneOf(scalars),
      1 -> Gen.listOfN(2, yGen(depth - 1, withNull)).map(l => YList(l.toVector)),
      2 -> mapGen(depth - 1, withNull))
  }
  private def mapGen(depth: Int, withNull: Boolean): Gen[YMap] =
    Gen.listOfN(3, Gen.zip(keyGen, yGen(depth, withNull)))
      .map(kvs => YMap(kvs.toMap.toVector)) // dedup keys
  private val anyMap: Gen[YMap] = mapGen(2, withNull = true)
  private val nullFreeMap: Gen[YMap] = mapGen(2, withNull = false)

  test("safeUpdate: right identity and idempotence on null-free maps") {
    forAll(nullFreeMap) { m =>
      assert(Merge.safeUpdate(m, YMap.empty) == m)
      assert(Merge.safeUpdate(m, m) == m)
    }
  }

  test("safeUpdate: overrides win and siblings survive") {
    forAll2(anyMap, anyMap) { (base, over) =>
      val merged = Merge.safeUpdate(base, over).asMap
      over.entries.foreach { case (k, v) =>
        v match {
          case _: YMap => () // recursive merge (with YNull stripping) applies
          case YNull => assert(!merged.contains(k)) // None deletes
          case _ => assert(merged.get(k).contains(v))
        }
      }
      base.entries.foreach { case (k, v) =>
        if (!over.contains(k)) assert(merged.get(k).contains(v))
      }
    }
  }

  test("safeUpdate: YNull deletes at any depth and deletion is idempotent") {
    forAll(nullFreeMap) { m =>
      val key = m.keys.headOption.getOrElse("a")
      val deleted = Merge.safeUpdate(m, YMap.of(key -> YNull))
      assert(!deleted.contains(key))
      assert(Merge.safeUpdate(deleted, YMap.of(key -> YNull)) == deleted)
    }
  }

  test("safeUpdate: repeated application of the same patch is stable") {
    // not full associativity (a scalar override RESETS a nested map — the
    // reference behaves the same), but patch application must be stable:
    // applying a patch twice equals applying it once
    forAll2(anyMap, anyMap) { (base, patch) =>
      val once = Merge.safeUpdate(base, patch)
      assert(Merge.safeUpdate(once, patch) == once)
    }
  }

  test("NamedList: toIndexed/fromIndexed round-trips keyed lists") {
    val entryGen = for {
      n <- Gen.oneOf("x", "y", "z")
      v <- Gen.choose(1, 9)
    } yield YMap.of("name" -> YStr(n), "v" -> YInt(v))
    val listGen = Gen.listOfN(3, entryGen).map { es =>
      // unique names, order preserved
      YList(es.groupBy(_.apply("name").asStr).map(_._2.head).toVector)
    }
    forAll(listGen) { l =>
      val indexed = Merge.toIndexed(l, "name")
      val back = Merge.fromIndexed(indexed, "name")
      assert(back.asList.items.toSet == l.items.toSet)
    }
  }

  // ---- selector algebra over random DAGs --------------------------------
  private def randomManifest(edges: Seq[(Int, Int)], n: Int): Manifest = {
    val nodes = (0 until n).map { i =>
      val deps = edges.collect { case (p, c) if c == i => s"model.p.m$p" }
      val m = ModelNode(s"model.p.m$i", s"m$i", "p", s"models/m$i.sql", "",
        dependsOn = DependsOn(deps.toVector))
      m.uniqueId -> m
    }.toMap
    Manifest("p", nodes = nodes)
  }
  private val dagGen: Gen[Manifest] = for {
    n <- Gen.choose(2, 8)
    edges <- Gen.listOf(Gen.zip(Gen.choose(0, n - 1), Gen.choose(0, n - 1)))
  } yield randomManifest(edges.collect { case (a, b) if a < b => (a, b) }, n)

  test("selector: union of tokens = union of singleton selections") {
    forAll3(dagGen, Gen.choose(0, 7), Gen.choose(0, 7)) { (m, i, j) =>
      val a = s"m${i % m.nodes.size}+"
      val b = s"+m${j % m.nodes.size}"
      assert(Selector.select(m, Seq(a, b)) ==
        (Selector.select(m, Seq(a)) ++ Selector.select(m, Seq(b))))
    }
  }

  test("selector: exclude removes exactly the excluded closure") {
    forAll2(dagGen, Gen.choose(0, 7)) { (m, i) =>
      val x = s"m${i % m.nodes.size}"
      val all = m.nodes.keySet.map(_.stripPrefix("model.p."))
      val result = Selector.select(m, all.toSeq, Seq(s"$x+"))
      assert(result == m.nodes.keySet -- Selector.select(m, Seq(s"$x+")))
    }
  }

  test("ancestors and descendants are inverse relations") {
    forAll(dagGen) { m =>
      m.nodes.keySet.foreach { a =>
        Dag.descendants(m.childMap, a).foreach { d =>
          assert(Dag.ancestors(m.parentMap, d).contains(a))
        }
      }
    }
  }

  test("topoSort respects every edge") {
    forAll(dagGen) { m =>
      val order = Dag.topoSort(m.nodes.keySet, m.parentMap)
      val pos = order.zipWithIndex.toMap
      m.nodes.values.foreach { node =>
        node.dependsOn.nodes.foreach { p =>
          assert(pos(p) < pos(node.uniqueId))
        }
      }
    }
  }
}
