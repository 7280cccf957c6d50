package graft.ops

import graft.SparkFixture
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

/** Property pins for the stream-shape kernels added this round: on random
  * multi-user event streams (ts ties, interleavings, session-boundary
  * gaps), q49's transition matrix and q50's session path trigrams must
  * equal independent in-memory references that re-derive the per-user
  * (ts, event_id) total order, the floor-div ppm, and the ≥30-min
  * session-break rule. Catches window off-by-ones and tie-handling the
  * hand-built TransitionFusionSpec scenarios can't enumerate. */
class TransitionPropertySpec extends AnyFunSuite with SparkFixture {

  private def forAll[A](gen: Gen[A], n: Int)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val types = Vector("a", "b", "c")

  /** (event_id, user_id, type_idx, offset_minutes) — minute offsets so
    * some gaps cross the 30-minute session boundary and ties happen. */
  private val streamGen: Gen[List[(Long, Long, Int, Int)]] = for {
    n <- Gen.chooseNum(0, 40)
    rows <- Gen.listOfN(n, for {
      u <- Gen.chooseNum(1, 3)
      t <- Gen.chooseNum(0, types.length - 1)
      off <- Gen.chooseNum(0, 200)
    } yield (u.toLong, t, off))
  } yield rows.zipWithIndex.map { case ((u, t, off), i) =>
    ((i + 1).toLong, u, t, off)
  }

  private def tsOf(offMin: Int): Timestamp =
    Timestamp.valueOf(f"2024-05-01 ${offMin / 60}%02d:${offMin % 60}%02d:00")

  private def perUserOrdered(rows: List[(Long, Long, Int, Int)]) =
    rows.groupBy(_._2).view.mapValues(
      _.sortBy(r => (r._4, r._1))).toMap // (offset, event_id) total order

  test("q49 kernel equals the in-memory reference on random streams") {
    val s = spark
    import s.implicits._
    forAll(streamGen, 30) { rows =>
      // reference: per-user adjacent pairs, then row-conditional ppm
      val pairs = perUserOrdered(rows).values.flatMap { es =>
        es.zip(es.drop(1)).map { case (a, b) => (types(a._3), types(b._3)) }
      }.toSeq
      val counts = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val totals = pairs.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val expect = counts.toSeq.map { case ((f, t), n) =>
        (f, t, n, 1000000L * n / totals(f))
      }.sortBy(r => (r._1, r._2))
      val df = rows.map { case (id, u, t, off) => (id, u, types(t), tsOf(off)) }
        .toDF("event_id", "user_id", "event_type", "ts")
      val got = Temporal.transitionMatrix(df).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == expect, s"stream: $rows")
    }
  }

  test("q50 kernel equals the in-memory reference on random streams") {
    val s = spark
    import s.implicits._
    forAll(streamGen, 30) { rows =>
      // reference: split each user's ordered stream at gaps >= 30 min,
      // then count in-session type trigrams; top-20 by (n desc, path)
      val tris = perUserOrdered(rows).values.flatMap { es =>
        val sessions = es.foldLeft(List.empty[List[(Long, Long, Int, Int)]]) {
          case (acc, e) => acc match {
            case cur :: rest if e._4 - cur.head._4 < 30 =>
              (e :: cur) :: rest // cur is reversed; head = latest event
            case _ => List(e) :: acc
          }
        }.map(_.reverse)
        sessions.flatMap { sess =>
          sess.sliding(3).filter(_.length == 3).map(w =>
            (types(w(0)._3), types(w(1)._3), types(w(2)._3)))
        }
      }.toSeq
      val expect = tris.groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .map { case ((a, b, c), n) => (a, b, c, n) }
        .sortBy(r => (-r._4, r._1, r._2, r._3))
        .take(20)
      val df = rows.map { case (id, u, t, off) => (id, u, types(t), tsOf(off)) }
        .toDF("event_id", "user_id", "event_type", "ts")
      val got = Temporal.pathTrigrams(df).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      assert(got == expect, s"stream: $rows")
    }
  }
}
