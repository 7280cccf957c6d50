package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Semantics of the round-7 additions: cross-doc n-gram novelty (t31),
  * hourly autocorrelation (q48), and the retrieval-mining pair
  * s18 (label-diversified top-k) / s19 (IVF-bounded hard negatives). */
class NoveltyMiningSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("t31: a duplicated doc pair contributes zero novel grams; a unique doc is 100% novel") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("src1", "a b c d"), // doc pair: every gram has df = 2
      ("src1", "a b c d"),
      ("src2", "x y z w") // unique: both grams df = 1
    ).toDF("source", "text")
    val out = TextAnalysis.ngramNovelty(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
      .toMap
    assert(out("src1") == ((2L, 4L, 0L, 0.0)))
    assert(out("src2") == ((1L, 2L, 2L, 1.0)))
  }

  test("t31: a gram shared across sources is novel in neither") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("srcA", "p q r"), // "p q r" in both sources → df = 2, novel nowhere
      ("srcB", "p q r s") // "q r s" only here → 1 novel of 2
    ).toDF("source", "text")
    val out = TextAnalysis.ngramNovelty(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(2), r.getLong(3))))
      .toMap
    assert(out("srcA") == ((1L, 0L)))
    assert(out("srcB") == ((2L, 1L)))
  }

  test("q48: a perfectly 24-periodic pulse train has lag-24 r = 1") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    // 96 hours; count 5 at hour ≡ 0 (mod 24), else 1 → exact periodicity
    val rows = (0 until 96).flatMap { h =>
      val n = if (h % 24 == 0) 5 else 1
      Seq.fill(n)(h)
    }
    val events = rows.toDF("h")
      .select((to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_interval(0, 0, 0, 0, h, 0, 0)")).as("ts"))
    val out = Temporal.hourlyAutocorr(events).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(out(24) == ((72L, Some(1.0))))
    // lag-1 pairs exist but are NOT perfectly correlated
    assert(out(1)._1 == 95L)
    assert(out(1)._2.exists(r => r < 1.0))
  }

  test("q48: a constant series has zero variance → autocorr NULL, pairs still counted") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.functions._
    val events = (0 until 48).toDF("h")
      .select((to_timestamp(lit("2024-01-01 00:00:00")) +
        expr("make_interval(0, 0, 0, 0, h, 0, 0)")).as("ts"))
    val out = Temporal.hourlyAutocorr(events).collect()
      .map(r => r.getInt(0) -> ((r.getLong(1), Option(r.get(2)))))
      .toMap
    assert(out(1) == ((47L, None)))
    assert(out(24) == ((24L, None)))
  }

  test("s18: at most 2 neighbors per (query, label); ranks are 1,2 with descending sim") {
    val rows = Similarity.s18(spark, dir).collect()
    assert(rows.nonEmpty)
    val byGroup = rows.groupBy(r => (r.getLong(0), r.getInt(1)))
    byGroup.foreach { case ((qid, label), g) =>
      assert(g.length <= 2, s"quota exceeded for ($qid, $label)")
      val ranked = g.sortBy(_.getInt(2))
      assert(ranked.map(_.getInt(2)).toSeq == (1 to g.length).toSeq)
      val sims = ranked.map(_.getDouble(4)).toSeq
      assert(sims == sims.sorted.reverse, s"sims not descending for ($qid, $label)")
      g.foreach(r => assert(r.getLong(3) != qid, "query returned as its own neighbor"))
    }
  }

  test("s19: every mined negative has a different label from its anchor") {
    val rows = Similarity.s19(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) != r.getInt(4),
        s"anchor ${r.getLong(0)} mined a same-label 'negative' ${r.getLong(3)}")
    }
    rows.groupBy(_.getLong(0)).foreach { case (aid, g) =>
      assert(g.length <= 3, s"anchor $aid has more than 3 negatives")
      assert(g.map(_.getInt(2)).sorted.toSeq == (1 to g.length).toSeq)
    }
  }
}
