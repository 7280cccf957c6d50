package graft.functions

import graft.SparkFixture
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** KMV sketch laws, pinned against brute force:
  *  - the sketch IS the k smallest distinct values, in any arrival order
  *    and partitioning;
  *  - merge(sketch(A), sketch(B)) == sketch(A ∪ B) (the mergeability the
  *    map-side partial aggregation and any cross-source rollup rely on);
  *  - duplicated input changes nothing (the sketch sees a SET).
  * Raw ScalaCheck generators with fixed seeds, MergeLawsSpec-style (no
  * scalatest-plus bridge in the dependency set); fewer cases than a pure
  * law because each case runs a Spark job. */
class KmvAggSpec extends AnyFunSuite with SparkFixture {

  private val K = 8

  private def forAll[A](gen: Gen[A], n: Int = 12)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def brute(values: Seq[Long]): Vector[Long] =
    values.distinct.sorted.take(K).toVector

  private def viaAgg(values: Seq[Long], partitions: Int): Vector[Long] = {
    val s = spark
    import s.implicits._
    val df = s.sparkContext.parallelize(values, math.max(partitions, 1)).toDF("h")
    df.agg(KmvAgg($"h", K).as("kmv")).collect()
      .head.getSeq[Long](0).toVector
  }

  test("sketch equals the k smallest distinct values (any partitioning)") {
    val gen = for {
      vs <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000L))
      parts <- Gen.chooseNum(1, 5)
    } yield (vs, parts)
    forAll(gen) { case (vs, parts) =>
      assert(viaAgg(vs, parts) == brute(vs))
    }
  }

  test("duplication is invisible: sketch(xs ++ xs) == sketch(xs)") {
    val xs = Seq(5L, 3L, 99L, 3L, 7L, 12L, 1L, 88L, 42L, 17L, 5L)
    assert(viaAgg(xs ++ xs, 3) == viaAgg(xs, 2))
    assert(viaAgg(xs, 2) == brute(xs))
  }

  test("merge law: union of group sketches == sketch of the union") {
    val s = spark
    import s.implicits._
    forAll(Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0, 1), Gen.chooseNum(0L, 500L))), n = 8) { tagged =>
      val df = tagged.toDF("g", "h")
      // per-group sketches, then re-aggregate the exploded sketches:
      // exactly the "merge partial sketches" path a rollup takes
      val merged = df.groupBy($"g").agg(KmvAgg($"h", K).as("kmv"))
        .select(org.apache.spark.sql.functions.explode($"kmv").as("h"))
        .agg(KmvAgg($"h", K).as("kmv"))
        .collect().head.getSeq[Long](0).toVector
      assert(merged == brute(tagged.map(_._2)))
    }
  }

  test("fewer than k distinct values: the sketch holds all of them") {
    assert(viaAgg(Seq(9L, 2L, 9L, 2L, 4L), 2) == Vector(2L, 4L, 9L))
  }
}
