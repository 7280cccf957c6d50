package graft.ops

import graft.SparkFixture
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for the round's curation arithmetic: on random small
  * corpora (tiny vocabulary so duplication actually arises), the Spark
  * pipelines must equal in-memory references computed straight from the
  * definitions — rolling-window dup coverage (d24) and unigram
  * commonness scoring (t35). Catches off-by-one window/ppm slips the
  * hand-built cases can't enumerate. */
class CurationPropertySpec extends AnyFunSuite with SparkFixture {

  private def forAll[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  /** random corpus: 3–10 docs over a 6-word vocabulary, 1–24 words each,
    * docs assigned round-robin to two sources */
  private val corpusGen: Gen[Seq[(Long, String, String)]] = for {
    nDocs <- Gen.chooseNum(3, 10)
    docs <- Gen.listOfN(nDocs, for {
      len <- Gen.chooseNum(1, 24)
      ws <- Gen.listOfN(len, Gen.oneOf("ash", "birch", "cedar", "dune",
        "elm", "fir"))
    } yield ws.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) =>
    (i.toLong, if (i % 2 == 0) "sA" else "sB", t)
  }

  private def grams10(text: String): Seq[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < 10) Seq.empty
    else (0 to ws.length - 10).map(i => ws.slice(i, i + 10).mkString(" ")).distinct
  }

  test("d24 coverage equals the brute-force rolling-window reference") {
    val s = spark
    import s.implicits._
    forAll(corpusGen, 25) { corpus =>
      val byDoc = corpus.map { case (id, src, t) => (id, src, grams10(t)) }
        .filter(_._3.nonEmpty)
      val docsPerGram = byDoc.flatMap { case (id, _, gs) => gs.map(_ -> id) }
        .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
      val ref = byDoc.groupBy(_._2).map { case (src, ds) =>
        val perDoc = ds.map { case (_, _, gs) =>
          (gs.size.toLong, gs.count(g => docsPerGram(g) >= 2).toLong)
        }
        val total = perDoc.map(_._1).sum
        val dup = perDoc.map(_._2).sum
        src -> ((total, dup, 1000000L * dup / total,
          perDoc.count(p => 2 * p._2 > p._1).toLong))
      }
      val got = Dedup.dupSpanCoverage(
        corpus.toDF("doc_id", "source", "text")).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      assert(got == ref, s"corpus: $corpus")
    }
  }

  test("s22 greedy maximin equals the brute-force reference on random vectors") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions.{sqrt => fsqrt}
    val vecGen: Gen[Seq[(Long, Array[Double])]] = for {
      n <- Gen.chooseNum(3, 8)
      vs <- Gen.listOfN(n, Gen.listOfN(3,
        Gen.chooseNum(-5, 5).map(_.toDouble)))
      if vs.forall(v => v.exists(_ != 0.0)) // nonzero norms only
    } yield vs.zipWithIndex.map { case (v, i) => (i.toLong, v.toArray) }
    def round6(x: Double): Double =
      BigDecimal(x).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP)
        .toDouble
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      round6(d / (math.sqrt(na) * math.sqrt(nb)))
    }
    def brute(vs: Seq[(Long, Array[Double])], k: Int): Seq[(Int, Long)] = {
      var chosen = Vector(vs.map(_._1).min)
      val byId = vs.toMap
      (2 to math.min(k, vs.size)).foreach { _ =>
        val next = vs.filterNot(v => chosen.contains(v._1))
          .map { case (id, v) =>
            (chosen.map(c => cos(byId(c), v)).max, id)
          }.minBy { case (ms, id) => (ms, id) }
        chosen :+= next._2
      }
      chosen.zipWithIndex.map { case (id, i) => (i + 1, id) }
    }
    forAll(vecGen, 20) { vs =>
      val df = vs.toDF("vec_id", "v")
        .withColumn("norm", fsqrt(graft.functions.DotProduct(
          org.apache.spark.sql.functions.col("v"),
          org.apache.spark.sql.functions.col("v"))))
      val k = math.min(3, vs.size)
      val got = Similarity.kcenter(df, k).collect()
        .map(r => (r.getInt(0), r.getLong(1))).toSeq
      assert(got == brute(vs, k), s"vectors: ${vs.map(_._2.toSeq)}")
    }
  }

  test("t35 commonness equals the brute-force unigram reference") {
    val s = spark
    import s.implicits._
    forAll(corpusGen, 25) { corpus =>
      val toks = corpus.flatMap { case (id, _, t) =>
        t.split(" ", -1).map(id -> _)
      }
      val cnt = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val total = cnt.values.sum
      val cppm = cnt.map { case (w, c) => w -> 1000000L * c / total }
      val ref = toks.groupBy(_._1).map { case (id, ts) =>
        val sums = ts.map(t => cppm(t._2))
        id -> ((ts.size.toLong, sums.sum,
          sums.sum.toDouble / ts.size,
          sums.count(_ < TextAnalysis.RareCppm).toLong))
      }
      val got = TextAnalysis.surprisalProfile(
        corpus.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text"))
        .collect()
        .map(r => r.getLong(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap
      assert(got == ref, s"corpus: $corpus")
    }
  }

  test("t41 invariant: no near-dup pair ever straddles a split boundary") {
    val s2 = spark
    import s2.implicits._
    val dir = "/root/testdata/sf0.01"
    val split = TextAnalysis.t41(s2, dir)
      .select($"doc_id", $"split")
    val pairs = Dedup.jaccardPairs(s2, dir, 0.5)
    val straddling = pairs
      .join(split.select($"doc_id".as("da"), $"split".as("sa")), Seq("da"))
      .join(split.select($"doc_id".as("db"), $"split".as("sb")), Seq("db"))
      .filter($"sa" =!= $"sb")
      .count()
    assert(straddling == 0L)
    // and the same join over t08's doc-grain split DOES leak (the d18
    // finding t41 exists to fix) — guard against a vacuous graph
    assert(pairs.count() > 0)
    val t08s = TextAnalysis.t08(s2, dir).select($"doc_id", $"split")
    val t08Straddle = pairs
      .join(t08s.select($"doc_id".as("da"), $"split".as("sa")), Seq("da"))
      .join(t08s.select($"doc_id".as("db"), $"split".as("sb")), Seq("db"))
      .filter($"sa" =!= $"sb").count()
    assert(t08Straddle > 0L, "expected doc-grain leakage on this corpus")
  }
}
