package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** t29's atomic packing fold on hand-built token streams: exact fits,
  * overflow-opens-a-window, oversized-doc-alone, and per-source
  * independence (window size 10 for readable arithmetic). */
class AtomicPackSpec extends AnyFunSuite with SparkFixture {

  /** (doc_id, source, tokens) rows → (source → (windows, total, waste, ppm)). */
  private def pack(rows: Seq[(Long, String, Long)], w: Long = 10L)
      : Map[String, (Long, Long, Long, Long)] = {
    val s = spark
    import s.implicits._
    TextAnalysis.atomicPack(rows.toDS(), w).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
  }

  test("docs fill a window exactly: one window, zero waste") {
    assert(pack(Seq((1L, "a", 4L), (2L, "a", 6L))) ==
      Map("a" -> ((1L, 10L, 0L, 0L))))
  }

  test("a doc that would overflow opens the next window; slack is waste") {
    // 7 then 5: window 1 holds 7 (waste 3), window 2 holds 5 (waste 5)
    assert(pack(Seq((1L, "a", 7L), (2L, "a", 5L))) ==
      Map("a" -> ((2L, 12L, 8L, 400000L))))
  }

  test("an oversized doc sits alone and counts no negative slack") {
    // 25 > 10: alone in window 1 (no slack), then 4 in window 2 (waste 6)
    assert(pack(Seq((1L, "a", 25L), (2L, "a", 4L))) ==
      Map("a" -> ((2L, 29L, 6L, 300000L))))
  }

  test("placement follows doc_id order, not input order") {
    // doc_id order: (1,3),(2,4) fit w1 (fill 7, waste 3); (3,9)
    // overflows → w2 fill 9 (waste 1)
    val got = pack(Seq((3L, "a", 9L), (1L, "a", 3L), (2L, "a", 4L)))
    assert(got == Map("a" -> ((2L, 16L, 4L, 200000L))))
  }

  test("sources pack independently") {
    val got = pack(Seq((1L, "a", 10L), (1L, "b", 1L)))
    assert(got == Map(
      "a" -> ((1L, 10L, 0L, 0L)),
      "b" -> ((1L, 1L, 9L, 900000L))))
  }
}
