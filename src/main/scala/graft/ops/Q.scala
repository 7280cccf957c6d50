package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One verifiable operator: a Spark implementation plus (when the
  * semantics are SQL-expressible) an equivalent DuckDB oracle query.
  *
  * Determinism contract (so the driver's hash compare is exact):
  *  - non-integer measures are aggregated in DECIMAL and only then cast
  *    to DOUBLE (same bits in any engine / any partitioning);
  *  - dates/timestamps are emitted as formatted strings;
  *  - every result carries a total ORDER BY on a unique key.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None,
    /** headline queries are the ones Bench times */
    headline: Boolean = false)

object Q {
  /** All registered operators, in registration order. */
  def registry: Seq[Q] =
    Relational.all ++ Temporal.all ++ TextAnalysis.all ++ Dedup.all ++
      Similarity.all ++ GraphOps.all ++ Multimodal.all

  /** Total-order the result of a NARROW (shuffle-free) pipeline.
    *
    * A bare `orderBy` plants a range exchange whose partitioner SAMPLES
    * the child — and for an all-map child that sampling job re-executes
    * the entire scan+compute pipeline, doubling the query. Materializing
    * the (small, post-aggregation/projection) result once and sorting
    * from it runs the expensive pipeline exactly once; queries whose sort
    * input is already a shuffle output don't need this (AQE's
    * materialized stages make their sampling pass free). */
  private[ops] def sortedNarrow(df: DataFrame, cols: org.apache.spark.sql.Column*): DataFrame =
    // lazy: materializes on the sampling pass and is reused by the real
    // exchange — same single execution of the pipeline, but the query's
    // explain keeps the full pre-checkpoint plan for inspection
    df.localCheckpoint(eager = false).orderBy(cols: _*)

  /** Threshold-switched broadcast for a CORPUS-GROWING build side.
    *
    * A forced `broadcast()` on a frame whose size tracks the corpus (a
    * dedup drop-list, a contamination flag set) is a 100 TB OOM; a bare
    * hint-free join is scale-safe but plans an exchange on the PROBE
    * side, whose shuffle files are written even when AQE later converts
    * the join to broadcast — a measured ~0.5–1 s of pure overhead per
    * corpus-sized probe at bench SF. This helper takes the third path
    * the round-7 verdict asked for: materialize the build side once
    * (lazy local checkpoint, so the measuring count and the join share
    * one execution), MEASURE it, and broadcast only under an explicit
    * row cap — the zero-probe-shuffle plan whenever the frame is
    * genuinely small, with a hard guarantee that an unbounded frame
    * degrades to a shuffle join instead of an executor OOM.
    *
    * The default cap (2M rows) is sized for id-only frames: ~16 MB of
    * longs, well inside any executor's broadcast budget; callers with
    * wider rows should pass a tighter cap. */
  private[graft] def boundedBroadcast(df: DataFrame, maxRows: Long = 2_000_000L): DataFrame = {
    val pinned = df.localCheckpoint(eager = false)
    if (pinned.count() <= maxRows)
      org.apache.spark.sql.functions.broadcast(pinned)
    else pinned
  }
}
