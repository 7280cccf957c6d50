package graft.ops

import graft.SparkFixture
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Property pin for q43's kernel: on random hourly count profiles
  * (bursts, silent-hour gaps, short series), the Spark pipeline must
  * equal an independent in-memory reference that recomputes the dense
  * spine, the trailing 24-hour integer moments, and the identical IEEE
  * z-formula. Catches window-frame off-by-ones and spine edge cases the
  * hand-built TemporalSpec scenarios can't enumerate. */
class AnomalyPropertySpec extends AnyFunSuite with SparkFixture {

  private def forAll[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  /** counts per hour (index 0 = 2024-05-01 00:00) → event timestamps. */
  private def eventsOf(counts: Seq[Int]): Seq[Timestamp] =
    counts.zipWithIndex.flatMap { case (n, h) =>
      (0 until n).map { i =>
        Timestamp.valueOf(
          f"2024-05-${1 + h / 24}%02d ${h % 24}%02d:${i % 60}%02d:${(i * 7) % 60}%02d")
      }
    }

  private def round6(v: Double): Double =
    BigDecimal(v).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Independent reference: dense spine over the observed range, then
    * the q43 moment formula per full-baseline hour. */
  private def reference(counts: Seq[Int]): Seq[(String, Long, Double, Option[Double], Long)] = {
    val nz = counts.zipWithIndex.filter(_._1 > 0).map(_._2)
    if (nz.isEmpty) return Nil
    val dense = (nz.min to nz.max).map(h => (h, counts(h).toLong))
    dense.zipWithIndex.drop(24).map { case ((h, cnt), i) =>
      val win = dense.slice(i - 24, i).map(_._2)
      val s1 = win.sum
      val s2 = win.map(c => c * c).sum
      val mean = s1.toDouble / 24.0d
      val varr = (24.0d * s2.toDouble - s1.toDouble * s1.toDouble) / (24.0d * 23.0d)
      val z =
        if (varr > 0.0d) Some(round6((cnt.toDouble - mean) / math.sqrt(varr)))
        else None
      val hour = f"2024-05-${1 + h / 24}%02d ${h % 24}%02d:00:00"
      (hour, cnt, round6(mean), z, if (z.exists(v => math.abs(v) > 3.0d)) 1L else 0L)
    }
  }

  test("q43 kernel equals the in-memory reference on random profiles") {
    val s = spark
    import s.implicits._
    val gen = for {
      n <- Gen.chooseNum(1, 40)
      counts <- Gen.listOfN(n, Gen.frequency(
        3 -> Gen.const(0), // silent hours are the interesting case
        10 -> Gen.chooseNum(1, 12),
        1 -> Gen.chooseNum(40, 80))) // bursts
    } yield counts
    var nonTrivial = 0
    forAll(gen, 40) { counts0 =>
      // ensure at least one event so the observed spine is non-empty
      val counts = if (counts0.forall(_ == 0)) counts0.updated(0, 1) else counts0
      val df = eventsOf(counts).toDF("ts")
      val got = Temporal.hourlyAnomaly(df).collect().map { r =>
        (r.getString(0), r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3)), r.getLong(4))
      }.toSeq
      val want = reference(counts)
      assert(got == want, s"counts=$counts")
      if (want.nonEmpty) nonTrivial += 1
    }
    // the generator must actually produce scored (≥ 25-hour) series
    assert(nonTrivial >= 5, s"only $nonTrivial profiles reached the baseline")
  }
}
