package graft.ops

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** t25's sliding-window chunker on hand-built docs: tail alignment,
  * sub-window docs, exact-boundary docs, and full coverage/overlap of the
  * emitted chunks (size 8, stride 4 — the registered configuration). */
class ChunkStrideSpec extends AnyFunSuite with SparkFixture {

  /** text → (chunk_no, chunk_text, chunk_len) in chunk order. */
  private def chunksOf(text: String, size: Int = 8, stride: Int = 4): Seq[(Int, String, Int)] = {
    val s = spark
    import s.implicits._
    val df = Seq((1L, text)).toDF("doc_id", "text")
    TextAnalysis.chunkStride(df, size, stride).collect()
      .map(r => (r.getInt(1), r.getString(2), r.getInt(3))).toSeq
  }

  private def toks(n: Int): String = (1 to n).map(i => s"w$i").mkString(" ")

  test("a doc shorter than the window yields exactly one short chunk") {
    assert(chunksOf(toks(3)) == Seq((0, "w1 w2 w3", 3)))
  }

  test("a doc exactly one window long yields one full chunk") {
    assert(chunksOf(toks(8)) == Seq((0, toks(8), 8)))
  }

  test("one token past the window forces a second, tail-aligned chunk") {
    val got = chunksOf(toks(9))
    assert(got == Seq(
      (0, (1 to 8).map(i => s"w$i").mkString(" "), 8),
      (1, (5 to 9).map(i => s"w$i").mkString(" "), 5)))
  }

  test("stride-aligned tail: n=12 stops at start 4, not a ghost start 8") {
    val got = chunksOf(toks(12))
    assert(got.map(_._1) == Seq(0, 1))
    assert(got(1) == ((1, (5 to 12).map(i => s"w$i").mkString(" "), 8)))
  }

  test("every token is covered and consecutive chunks overlap by size-stride") {
    for (n <- Seq(1, 4, 8, 11, 16, 23)) {
      val got = chunksOf(toks(n))
      // coverage: the union of [start, start+len) spans all n tokens
      val covered = got.flatMap { case (no, _, len) => (no * 4) until (no * 4 + len) }.toSet
      assert(covered == (0 until n).toSet, s"n=$n gap: ${(0 until n).toSet -- covered}")
      // consecutive full chunks overlap by 4 tokens (size 8 - stride 4)
      got.sliding(2).foreach {
        case Seq((a, _, la), (b, _, _)) if la == 8 =>
          assert(b * 4 < a * 4 + la, s"n=$n: chunks $a,$b do not overlap")
        case _ =>
      }
    }
  }
}
