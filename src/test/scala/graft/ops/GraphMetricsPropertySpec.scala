package graft.ops

import graft.SparkFixture
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the g10/g11 integer-moment formulas: on random
  * graphs with random source labelings, the Spark pipelines must equal
  * in-memory references computed straight from the definitions (Pearson
  * over stubs; Newman Q over the partition). Catches moment-arithmetic
  * slips the hand-built GraphOpsSpec cases can't enumerate. */
class GraphMetricsPropertySpec extends AnyFunSuite with SparkFixture {

  private def forAll[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** random simple graph: n vertices, m undirected edges, no self loops */
  private val graphGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.chooseNum(2, 12)
    m <- Gen.chooseNum(1, 20)
    edges <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(0, n - 1)
      b <- Gen.chooseNum(0, n - 1) if a != b
    } yield (math.min(a, b).toLong, math.max(a, b).toLong))
  } yield edges.distinct

  private def refAssortativity(edges: Seq[(Long, Long)]): Option[Double] = {
    val stubs = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val deg = stubs.groupBy(_._1).map { case (v, s) => v -> s.size.toLong }
    val xy = stubs.map { case (a, b) => (deg(a), deg(b)) }
    val m = xy.size.toLong
    val sx = xy.map(_._1).sum
    val sxx = xy.map(p => p._1 * p._1).sum
    val sxy = xy.map(p => p._1 * p._2).sum
    val den = m * sxx - sx * sx
    if (den == 0) None
    else Some(round6((m * sxy - sx * sx).toDouble / den.toDouble))
  }

  private def refModularity(
      edges: Seq[(Long, Long)], lab: Map[Long, String]): (Long, Double) = {
    val m = edges.size.toLong
    val intra = edges.count { case (a, b) => lab(a) == lab(b) }.toLong
    val dmass = edges.flatMap { case (a, b) => Seq(lab(a), lab(b)) }
      .groupBy(identity).map(_._2.size.toLong)
    val dsq = dmass.map(d => d * d).sum
    (intra, round6((4L * m * intra - dsq).toDouble / (4L * m * m).toDouble))
  }

  test("g10 assortativity equals the stub-Pearson reference on random graphs") {
    val s = spark
    import s.implicits._
    forAll(graphGen, 25) { edges =>
      if (edges.nonEmpty) {
        val r = GraphOps.assortativity(edges.toDF("da", "db")).collect().head
        val got = if (r.isNullAt(1)) None else Some(r.getDouble(1))
        assert(r.getLong(0) == edges.size.toLong, s"edges=$edges")
        assert(got == refAssortativity(edges), s"edges=$edges")
      }
    }
  }

  test("g11 modularity equals the Newman-Q reference on random labelings") {
    val s = spark
    import s.implicits._
    val gen = for {
      edges <- graphGen if edges.nonEmpty
      nSrc <- Gen.chooseNum(1, 3)
      verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
      labels <- Gen.listOfN(verts.size, Gen.chooseNum(0, nSrc - 1))
    } yield (edges, verts.zip(labels.map(l => s"s$l")).toMap)
    forAll(gen, 25) { case (edges, lab) =>
      val docs = lab.toSeq.toDF("doc_id", "source")
      val r = GraphOps.sourceModularity(edges.toDF("da", "db"), docs)
        .collect().head
      val (intra, q) = refModularity(edges, lab)
      assert(r.getLong(0) == edges.size.toLong, s"edges=$edges lab=$lab")
      assert(r.getLong(1) == intra, s"edges=$edges lab=$lab")
      assert(r.getDouble(3) == q, s"edges=$edges lab=$lab")
    }
  }
}
