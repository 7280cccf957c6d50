package graft.ops

import graft.{SparkEntry, SparkFixture}
import org.scalatest.funsuite.AnyFunSuite

/** Every registered query must plan and execute at sf0.001 — the in-suite
  * regression guard between DuckDB-oracle verification runs. Row counts
  * are asserted non-negative only; exact values are the oracle's job. */
class QueriesSmokeSpec extends AnyFunSuite with SparkFixture {

  private val dir = "/root/testdata/sf0.001"

  test("every SparkEntry query executes; every query has an oracle") {
    val queries = SparkEntry.queries
    val oracles = SparkEntry.oracleSql
    assert(queries.nonEmpty)
    // the correctness gate only covers queries that declare an oracle —
    // a query without one silently skips verification, so fail here
    assert(queries.keySet == oracles.keySet,
      s"queries without oracle: ${queries.keySet -- oracles.keySet}")
    val failures = queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try { fn(spark, dir).queryExecution.toRdd.count(); None }
      catch { case e: Throwable => Some(s"$name: ${e.getMessage}") }
    }
    assert(failures.isEmpty, failures.mkString("\n"))
  }

  test("the flagship entry answers rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("t17: all-empty-text corpus yields NULL bytes_per_char (div parity)") {
    // Spark's Divide NULLs on zero; DuckDB's IEEE division gives inf/NaN.
    // t17 pins BOTH to NULL via an explicit guard — exercise the branch
    // the real testdata never hits with an all-empty fixture.
    val s = spark
    import s.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft_t17").toString
    Seq((1L, "", "en", "web", 0L), (2L, "", "en", "web", 0L),
      (3L, "", "de", "mail", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val rows = TextAnalysis.t17(s, tmp).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("mail", "web"))
    assert(rows.forall(_.isNullAt(rows.head.fieldIndex("bytes_per_char"))))
    assert(rows.map(r => r.getAs[Long]("total_chars")).forall(_ == 0L))
    // dir-switch staleness guard: tables ABSENT from the fixture dir must
    // error on use, not silently serve the previous dir's rows
    intercept[Exception](s.table("lineitem"))
  }

  test("m05 finds the duplicate payload groups that exist at sf0.1") {
    // sf0.01 (the oracle gate) has zero exact-dup texts, so the gate only
    // proves the empty case; pin the positive case at the SF that has dups
    val rows = Multimodal.m05(spark, "/root/testdata/sf0.1").collect()
    assert(rows.length == 8, s"expected 8 dup groups, got ${rows.length}")
    assert(rows.forall(_.getLong(1) >= 2), "every group must have copies")
  }

  test("the new dedup audits are non-vacuous on the shipped data") {
    // guard against a future data refresh silently making these gates
    // prove only the empty case (the m05 lesson): each audit must have
    // something to report at the SF it is graded on
    val d25 = Dedup.d25(spark, "/root/testdata/sf0.01").collect().head
    assert(d25.getAs[Long]("n_pairs") > 0 &&
      d25.getAs[Long]("missed_ppm") > 0,
      s"d25 found no cross-shard pairs: $d25")
    val d26 = Dedup.d26(spark, "/root/testdata/sf0.01").collect()
    assert(d26.exists(_.getAs[Long]("n_near_hist") > 0),
      "d26 found no near-dups against history")
    val d27 = Dedup.d27(spark, "/root/testdata/sf0.01").collect().head
    assert(d27.getAs[Long]("n_clusters") > 0 &&
      d27.getAs[Long]("n_differs") > 0,
      s"d27 keeper policies never disagree: $d27")
    val g16 = GraphOps.g16(spark, "/root/testdata/sf0.01").collect()
    assert(g16.nonEmpty && g16.map(_.getAs[Long]("n_components")).sum > 1,
      "g16 found no component-size spread")
  }
}
