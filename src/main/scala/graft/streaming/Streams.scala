package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Structured Streaming forms of the temporal operators (SURVEY §2.F
  * "incremental/streaming-flavored materialization"; the batch forms live
  * in [[graft.ops.Temporal]]).
  *
  * Each transform takes a (possibly streaming) events DataFrame with the
  * `events` table schema (`event_id, user_id, event_type, ts, value`) and
  * returns a lazily-planned result; callers pick the sink. The aggregates
  * mirror their batch twins exactly (decimal-then-double sums) so a
  * backfill (batch) and the live path (stream) produce identical rows —
  * the kappa-architecture property a governed pipeline needs.
  *
  * Scale: all stateful ops key their state by (window/session, group key)
  * and rely on watermarks to bound state size — state is O(open windows),
  * not O(history). `foreachBatch` merges are idempotent per unique_key, so
  * replays after failure are safe.
  */
object Streams {

  /** Hourly per-type rollup with a watermark — the windowed-aggregation
    * core of q13_events_hourly. Append-mode emits each (hour, type) row
    * exactly once, when the watermark passes the window end. Row-shape
    * deltas vs the batch projection, stated so reconciliation is a
    * translation, not a surprise: `hour` is the raw window-start
    * timestamp (batch formats it to 'yyyy-MM-dd HH:mm'), and q13's
    * n_users column is absent (COUNT DISTINCT is unsupported in
    * append-mode streaming; the t19-style KMV sketch is the streaming
    * answer when approximate user counts are needed). The counts and
    * decimal-then-double sums are bit-identical to batch — the kappa
    * property StreamsSpec pins on this op compares against THIS
    * function's batch execution. */
  def hourly(events: DataFrame, watermarkDelay: String = "1 hour"): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(
        count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"))
      .select($"w.start".as("hour"), $"event_type", $"n_events", $"total_value")
  }

  /** 30-minute-gap sessionization via native `session_window` — streaming
    * twin of q17_sessionize; sessions close (and emit, in append mode)
    * once the watermark passes last-event + gap. */
  def sessions(
      events: DataFrame,
      gap: String = "30 minutes",
      watermarkDelay: String = "30 minutes"): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy($"user_id", session_window($"ts", gap).as("sw"))
      .agg(
        count(lit(1)).as("n_events"),
        sum($"value".cast(DecimalType(18, 6))).cast(DoubleType).as("total_value"))
      .select($"user_id", $"sw.start".as("session_start"),
        $"sw.end".as("session_end"), $"n_events", $"total_value")
  }

  final case class Evt(user_id: Long, ts: Timestamp, value: Double)
  final case class Session(
      user_id: Long, session_start: Timestamp, session_end: Timestamp,
      n_events: Long, total_value: Double)
  /** Open-session accumulator carried in GroupState. */
  final case class SessionState(
      start: Long, lastTs: Long, n: Long, total: Double)

  /** Custom-state sessionization via `flatMapGroupsWithState` with
    * event-time timeout — the escape hatch for session semantics
    * `session_window` can't express (per-event state updates, value-
    * dependent gap rules, emit-on-update). Semantics here match
    * [[sessions]]: gap-separated runs, session_end = last event + gap.
    *
    * State per user is ONE open session (constant size); the event-time
    * timeout fires when the watermark passes lastTs + gap, emitting and
    * clearing the state — so total state is O(active users). */
  def sessionsStateful(
      events: Dataset[Evt],
      gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "30 minutes"): Dataset[Session] = {
    val s = events.sparkSession
    import s.implicits._

    def emit(uid: Long, st: SessionState): Session =
      Session(uid, new Timestamp(st.start), new Timestamp(st.lastTs + gapMs),
        st.n, st.total)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[Evt], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(emit(uid, _)).toSeq
            state.remove()
            out.iterator
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(st) if t - st.lastTs < gapMs =>
                  // a LATE-but-within-watermark event may precede the
                  // session's current bounds: extend start backward and
                  // never move lastTs backward — native session_window
                  // merges windows the same way (kappa parity)
                  open = Some(SessionState(math.min(st.start, t),
                    math.max(st.lastTs, t), st.n + 1, st.total + e.value))
                case Some(st) =>
                  closed += emit(uid, st)
                  open = Some(SessionState(t, t, 1, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1, e.value))
              }
            }
            open.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.lastTs + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Streaming exact dedup: drops rows whose key was already seen, with
    * state bounded by the watermark (`dropDuplicatesWithinWatermark`) —
    * the streaming twin of d01's exact dedup for an ingest pipeline.
    * State is O(keys inside the watermark window), not O(history). */
  def dedup(events: DataFrame, keyCols: Seq[String],
      watermarkDelay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Time-bounded stream-stream join: each click joins the purchases of
    * the same user in the preceding 10 minutes. Both sides carry
    * watermarks and the range predicate bounds join state on both sides
    * (Spark drops buffered rows once the watermark passes the bound). */
  def clickPurchaseJoin(
      clicks: DataFrame, purchases: DataFrame,
      watermarkDelay: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", watermarkDelay)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val p = purchases.withWatermark("ts", watermarkDelay)
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("value").as("purchase_value"))
    c.join(p,
      c("user_id") === p("p_user") &&
        p("purchase_ts") <= c("click_ts") &&
        p("purchase_ts") >= c("click_ts") - expr("INTERVAL 10 MINUTES"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("purchase_ts"), col("purchase_value"))
  }

  /** Durable run discriminator tied to the CHECKPOINT's lifetime: read
    * from `<checkpoint>/graft_run_id`, created on first use. Recovery
    * from an existing checkpoint reuses the id (so a replayed micro-batch
    * overwrites exactly its own partition); a fresh or wiped checkpoint
    * gets a new id, so its batch numbering (restarting at 0) can never
    * collide with — or overwrite — partitions a previous run wrote to the
    * same sink. */
  /** localCheckpoint + the persistent-RDD ids it registered, captured
    * under a lock (concurrent queries on one session must never claim
    * each other's blocks); eager materialization runs OUTSIDE the lock.
    * foreachBatch bodies unpersist their own ids at batch end — the
    * blocks otherwise free only on driver GC and accumulate for the
    * stream's lifetime (the CLAUDE.md eviction lesson). */
  private val checkpointLock = new Object
  private def trackedCheckpoint(df: DataFrame, eager: Boolean): (DataFrame, Set[Int]) = {
    val sc = df.sparkSession.sparkContext
    val (out, ids) = checkpointLock.synchronized {
      val before = sc.getPersistentRDDs.keySet.toSet
      val o = df.localCheckpoint(eager = false)
      (o, sc.getPersistentRDDs.keySet.toSet -- before)
    }
    if (eager) out.queryExecution.toRdd.count()
    (out, ids)
  }
  private def unpersistIds(spark: SparkSession, ids: Set[Int]): Unit =
    ids.foreach(id => spark.sparkContext.getPersistentRDDs.get(id)
      .foreach(_.unpersist(blocking = false)))

  private def checkpointRunId(spark: SparkSession, checkpoint: String): String = {
    val p = new org.apache.hadoop.fs.Path(checkpoint, "graft_run_id")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    def readId(): String =
      if (!fs.exists(p)) ""
      else {
        val in = fs.open(p)
        try scala.io.Source.fromInputStream(in).mkString.trim finally in.close()
      }
    val existing = readId()
    if (existing.nonEmpty) existing
    else {
      // a blank read means either "never created" or "crash between
      // create and write" — both regenerate. Write-to-temp + rename so a
      // crash mid-write can never leave a half-written id behind (an
      // empty run_id would round-trip through a partition column as
      // NULL and break the replay-exclusion filter).
      if (fs.exists(p)) fs.delete(p, false)
      val id = java.util.UUID.randomUUID().toString
      val tmp = new org.apache.hadoop.fs.Path(checkpoint, s"graft_run_id.tmp-$id")
      val out = fs.create(tmp, true)
      try out.write(id.getBytes("UTF-8")) finally out.close()
      if (fs.rename(tmp, p)) id
      else {
        // rename=false means EITHER a lost concurrent race (their id is
        // now readable — reuse it) or a filesystem refusal (HDFS returns
        // false rather than throwing). An empty re-read must fail loudly:
        // "" as run_id round-trips through the partition column as NULL
        // and breaks the replay-exclusion filter.
        fs.delete(tmp, false)
        val theirs = readId()
        if (theirs.nonEmpty) theirs
        else throw new java.io.IOException(
          s"could not persist run id under $checkpoint (rename refused and no id present)")
      }
    }
  }

  /** Unpersist `cached` when the given query terminates — the static
    * broadcast side of an ingest (eval-gram set) is cached for the
    * query's lifetime, and a long-lived session launching many
    * AvailableNow ingests must not accumulate orphaned cached RDDs. */
  private def unpersistOnTermination(q: StreamingQuery, cached: DataFrame): Unit = {
    val spark = cached.sparkSession
    val listener: org.apache.spark.sql.streaming.StreamingQueryListener =
      new org.apache.spark.sql.streaming.StreamingQueryListener {
        override def onQueryStarted(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryStartedEvent): Unit = ()
        override def onQueryProgress(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryProgressEvent): Unit = ()
        override def onQueryTerminated(
            e: org.apache.spark.sql.streaming.StreamingQueryListener.QueryTerminatedEvent): Unit =
          if (e.id == q.id) {
            cached.unpersist()
            spark.streams.removeListener(this)
          }
      }
    spark.streams.addListener(listener)
    // missed-event guard: an AvailableNow query over a tiny source can
    // terminate BEFORE the listener registers; unpersist is idempotent,
    // so firing both paths in the race window is harmless
    if (!q.isActive) {
      cached.unpersist()
      spark.streams.removeListener(listener)
    }
  }

  /** Read a persistent index/target sink, treating ONLY "not created yet"
    * as absent: a missing path, or an existing-but-contentless dir (no
    * schema to infer), map to None. Any OTHER failure — throttling,
    * permissions, corrupt footers — rethrows so the micro-batch fails
    * and the engine retries it: swallowing those (the old
    * `Try(...).toOption` pattern) would run the batch against EMPTY
    * history and permanently admit duplicates. */
  private def readIfPresent(spark: SparkSession, path: String): Option[DataFrame] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(p)) None
    else
      try Some(spark.read.parquet(path))
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition != null &&
              e.getCondition.startsWith("UNABLE_TO_INFER_SCHEMA") => None
      }
  }

  /** Streaming near-duplicate suppression — the ingest-side twin of the
    * batch MinHash+LSH pass (d03): per micro-batch, each document's
    * 64-perm minhash signature is computed map-side (compiled
    * `MinHash64` kernel — no shuffle) and banded; a document is dropped
    * when any of its band keys collides with the persistent band-key
    * index (a near-dup of an ALREADY-ACCEPTED doc) or with a
    * lower-doc_id batchmate. Accepted docs land in `outPath`, their band
    * keys in `indexPath` — so the index grows only with accepted content.
    *
    * Replay safety: both sinks are partitioned by (`run_id`, `batch_id`)
    * and written with dynamic partition overwrite, so re-running a
    * micro-batch replaces exactly its own partition in each sink
    * (idempotent even if a failure hit between the two writes); the
    * history check ignores only the current (run, batch) index partition,
    * so a replay recomputes the same accepted set rather than colliding
    * with its failed first attempt. The run id is durable in the
    * checkpoint ([[checkpointRunId]]): restarting against the same
    * sinks with a FRESH checkpoint (batch numbering restarts at 0)
    * neither overwrites nor ignores a previous run's partitions.
    *
    * Scale: the index is O(accepted docs × 32) longs, partitioned by
    * batch; the per-batch work is one broadcast-able join against it.
    * False-positive band collisions are the LSH tradeoff — callers
    * wanting exact Jaccard confirmation run d03's verification on the
    * collided pairs. */
  def nearDupIngest(
      docs: DataFrame,
      outPath: String,
      indexPath: String,
      checkpoint: String): StreamingQuery = {
    val runId = checkpointRunId(docs.sparkSession, checkpoint)
    docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val spark = batch0.sparkSession
        import spark.implicits._
        // pin the micro-batch ONCE: both the signature pass and the
        // accepted anti-join read it, and each action on the raw batch
        // frame would re-execute the source read
        val (batch, srcIds) = trackedCheckpoint(batch0, eager = false)
        val perDoc = batch
          // fused tokenize+shingle kernel — THE batch d03 expression;
          // <3-word docs have no shingles and are excluded (empty-array
          // filter), never hashed to a degenerate signature
          .select($"doc_id",
            graft.functions.ShingleKernels.shinglesText($"text", 3).as("arr"))
          .filter(size($"arr") > 0)
          .select($"doc_id",
            graft.functions.ShingleKernels.minHash64($"arr").as("sigs"))
        val (keys, keyIds) =
          trackedCheckpoint(graft.ops.Dedup.bandKeys(perDoc), eager = true)
        val histDup = readIfPresent(spark, indexPath) match {
          case None => spark.emptyDataset[Long].toDF("drop_id")
          case Some(hist) => keys.join(
            hist
              // a replay must not collide with its own failed attempt —
              // but ONLY its own (run, batch) partition is excluded; a
              // previous run's batch 0 is genuine history
              .filter(!($"run_id" === runId && $"batch_id" === batchId))
              .select($"b", $"key"),
            Seq("b", "key"))
            .select($"doc_id".as("drop_id")).distinct()
        }
        // within-batch: the lowest doc_id owning a band key wins
        // (columns renamed per step: the owner/drop frames derive from
        // `keys`, and shared attribute ids across a self-join are
        // ambiguous to the analyzer)
        val owners = keys
          .select($"b".as("ob"), $"key".as("ok"), $"doc_id".as("od"))
          .groupBy($"ob", $"ok").agg(min($"od").as("owner"))
        val batchDup = keys
          .join(owners, $"b" === $"ob" && $"key" === $"ok")
          .filter($"doc_id" > $"owner")
          .select($"doc_id".as("drop_id")).distinct()
        val (dropIds, dropIdSet) =
          trackedCheckpoint(histDup.union(batchDup).distinct(), eager = true)
        val accepted = batch
          .join(dropIds, batch("doc_id") === dropIds("drop_id"), "left_anti")
        keys.join(dropIds, keys("doc_id") === dropIds("drop_id"), "left_anti")
          .select($"b", $"key", $"doc_id",
            lit(runId).as("run_id"), lit(batchId).as("batch_id"))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("run_id", "batch_id").parquet(indexPath)
        accepted
          .withColumn("run_id", lit(runId)).withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("run_id", "batch_id").parquet(outPath)
        unpersistIds(spark, srcIds ++ keyIds ++ dropIdSet)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming eval-set decontamination — the ingest twin of batch d06:
    * per micro-batch, each document is 4-gram shingled map-side (compiled
    * [[graft.functions.ShingleKernels]] kernel); a document is dropped
    * when any gram hits the static eval-set gram index, and clean
    * documents append to `outPath`. Runs inside foreachBatch so the
    * contaminated-id set is an ordinary broadcast semi-join + anti-join
    * (a stream-side transform would make "doc has ANY hit" a stateful
    * stream self-join — here every micro-batch is stateless).
    *
    * Replay safety: output is partitioned by (`run_id`, `batch_id`) with
    * dynamic partition overwrite, so a re-run of a failed micro-batch
    * replaces exactly its own partition, and a fresh-checkpoint restart
    * against the same sink cannot overwrite a previous run's batches
    * (same recipe as [[nearDupIngest]]).
    *
    * Scale: eval sets are small next to the corpus (~10⁵ docs vs ~10⁹),
    * so their distinct grams BROADCAST; the streaming side is never
    * shuffled — gram explosion, probe, and anti-join are all map-side.
    * The distinct gram set is computed ONCE and cached before the query
    * starts — not recomputed per micro-batch (it is static). */
  def decontaminateIngest(
      docs: DataFrame,
      evalGrams: DataFrame,
      outPath: String,
      checkpoint: String): StreamingQuery = {
    val s0 = docs.sparkSession
    val runId = checkpointRunId(s0, checkpoint)
    val gramSet = evalGrams.select(col("g")).distinct().cache()
    gramSet.count() // materialize once, before the first micro-batch
    val q = docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val contaminated = batch
          // fused kernel, THE batch d06/grams4 expression; <4-word docs
          // yield an empty array that explode drops
          .select($"doc_id",
            explode(graft.functions.ShingleKernels.shinglesText($"text", 4)).as("g"))
          .join(broadcast(gramSet), Seq("g"), "left_semi")
          .select($"doc_id").distinct()
        batch.join(contaminated, Seq("doc_id"), "left_anti")
          .withColumn("run_id", lit(runId)).withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("run_id", "batch_id").parquet(outPath)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    unpersistOnTermination(q, gramSet)
    q
  }

  /** Streaming curation funnel — the ingest twin of batch d14's exact
    * and contamination stages: per micro-batch, every document is
    * flagged exact-dup (its content hash was accepted in an earlier
    * batch, or a lower-id doc in THIS batch owns the hash) and
    * contaminated (any 4-gram hits the static eval gram set), then the
    * per-source survivor counts for the batch append to `countersPath`.
    * `SUM` over that sink per source IS the running funnel — the live
    * "how much data survives" meter.
    *
    * The hash index sink (`indexPath`) carries one 16-byte digest per
    * accepted document — never text — and both sinks partition by
    * (`run_id`, `batch_id`) with dynamic partition overwrite, so a
    * replayed micro-batch replaces exactly its own partitions and the
    * summed counters stay correct across failures (the
    * [[nearDupIngest]] recipe). The near-dup stage is deliberately
    * absent: it needs the full pair graph, which is the batch path's
    * job (d14); streaming funnels report the stages that are decidable
    * per document.
    *
    * Scale: the eval gram set broadcasts (cached once, before the first
    * micro-batch); the history probe is a semi-join against 16-byte
    * hashes; everything else is batch-local. */
  def funnelIngest(
      docs: DataFrame,
      evalGrams: DataFrame,
      countersPath: String,
      indexPath: String,
      checkpoint: String): StreamingQuery = {
    val s0 = docs.sparkSession
    val runId = checkpointRunId(s0, checkpoint)
    val gramSet = evalGrams.select(col("g")).distinct().cache()
    gramSet.count() // materialize once, before the first micro-batch
    val q = docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        // unhex: store the REAL 16-byte digest, not the 32-char hex
        // string (half the index); coalesce: a NULL text must dedup
        // deterministically (as the empty document) — a NULL h would
        // match NOTHING in either join and every null-text duplicate
        // would be admitted forever
        val (hashed, hashedIds) = trackedCheckpoint(batch
          .select($"doc_id", $"source", $"text",
            unhex(md5(coalesce($"text", lit("")).cast(BinaryType))).as("h")),
          eager = true)
        val hist = readIfPresent(s, indexPath) match {
          // Array[Byte], not String: the empty fallback must carry the
          // SAME BinaryType column the populated index has, or the very
          // first batch's semi-join plans string-vs-binary
          case None => s.emptyDataset[Array[Byte]].toDF("h")
          case Some(ix) =>
            // index-format guard: pre-binary indexes stored h as a
            // 32-char hex STRING. Joining those against binary digests
            // would match nothing and silently re-admit every historical
            // duplicate — fail loudly instead (delete the index or
            // migrate it with unhex(h) to keep its history).
            val ht = ix.schema("h").dataType
            if (ht != org.apache.spark.sql.types.BinaryType)
              throw new IllegalStateException(
                s"funnel index at $indexPath stores 'h' as $ht, but this " +
                  "version writes 16-byte binary digests (unhex(md5)). " +
                  "Migrate the index (select unhex(h) as h, run_id, " +
                  "batch_id) or delete it to rebuild history.")
            ix.filter(!($"run_id" === runId && $"batch_id" === batchId))
              .select($"h").distinct()
        }
        val histDup = hashed.join(hist, Seq("h"), "left_semi").select($"doc_id")
        val owners = hashed.groupBy($"h").agg(min($"doc_id").as("owner"))
        val batchDup = hashed.join(owners, Seq("h"))
          .filter($"doc_id" > $"owner").select($"doc_id")
        val (dupIds, dupIdSet) = trackedCheckpoint(
          histDup.union(batchDup).distinct().withColumn("e", lit(true)),
          eager = true)
        val contamIds = hashed
          .select($"doc_id",
            explode(graft.functions.ShingleKernels.shinglesText($"text", 4)).as("g"))
          .join(broadcast(gramSet), Seq("g"), "left_semi")
          .select($"doc_id").distinct()
          .withColumn("cf", lit(true))
        val counters = hashed.select($"doc_id", $"source")
          .join(dupIds, Seq("doc_id"), "left")
          .join(contamIds, Seq("doc_id"), "left")
          .select($"source",
            coalesce($"e", lit(false)).as("e"),
            coalesce($"cf", lit(false)).as("cf"))
          .groupBy($"source")
          .agg(
            count(lit(1)).as("n_docs"),
            sum(when(!$"e", 1L).otherwise(0L)).as("n_after_exact"),
            sum(when(!$"e" && !$"cf", 1L).otherwise(0L)).as("n_clean"))
        // accepted (first-seen) hashes extend the index for later batches
        hashed.join(dupIds.select($"doc_id"), Seq("doc_id"), "left_anti")
          .select($"h").distinct()
          .withColumn("run_id", lit(runId)).withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("run_id", "batch_id").parquet(indexPath)
        counters
          .withColumn("run_id", lit(runId)).withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("run_id", "batch_id").parquet(countersPath)
        unpersistIds(s, hashedIds ++ dupIdSet)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    unpersistOnTermination(q, gramSet)
    q
  }

  /** Distinct 4-grams of a static eval-set corpus — the broadcast side of
    * [[decontaminate]]. */
  def evalGramsOf(evalDocs: DataFrame): DataFrame = {
    val s = evalDocs.sparkSession
    import s.implicits._
    evalDocs
      .select(explode(
        graft.functions.ShingleKernels.shinglesText($"text", 4)).as("g"))
      .distinct()
  }

  /** Trending n-grams — the streaming twin of batch t12's corpus
    * frequency table: trigram counts per event-time window, closing (and
    * emitting once, append mode) when the watermark passes the window
    * end. Input needs (ts, text). At scale the groupBy key is
    * (window, trigram): partial aggregation is map-side, state is
    * O(open windows × distinct trigrams in them), bounded by the
    * watermark — the live path of an LM-style frequency pipeline. */
  def trendingNgrams(
      docs: DataFrame,
      windowLen: String = "1 hour",
      watermarkDelay: String = "1 hour"): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .withWatermark("ts", watermarkDelay)
      // multiplicity-counted trigrams — THE batch t12 kernel
      // (ngram_counts_text), not a hand-synced copy: per-doc counts come
      // out of the fused scan and only (gram, count) rows reach the
      // windowed aggregation (map-side partials sum the counts)
      .select($"ts", explode(
        graft.functions.ShingleKernels.ngramCountsText($"text", 3)).as("gc"))
      .groupBy(window($"ts", windowLen).as("w"), $"gc.g".as("trigram"))
      .agg(sum($"gc.c").as("n"))
      .select($"w.start".as("window_start"), $"trigram", $"n")
  }

  /** Streaming curation gate — PII scrub + quality filter on a document
    * stream, built from the SAME Column expressions as the batch ops
    * (t13's scrub regexes, t02's quality predicate): the unified
    * batch/stream property means a backfill and the live ingest produce
    * byte-identical rows. Stateless (narrow per-row transforms, no
    * watermark, no state store) — the scrub pipelines at source
    * parallelism, which is what a 100 TB/day ingest needs.
    *
    * Input needs (doc_id, text); emits (doc_id, text_scrubbed,
    * n_redactions, n_tokens, is_quality) for every arriving doc. */
  def scrubIngest(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    import graft.ops.TextAnalysis.{scrubPii, redactionCount, qualityGate}
    val ws = split($"text", " ")
    docs.select(
      $"doc_id",
      scrubPii($"text").as("text_scrubbed"),
      redactionCount($"text").as("n_redactions"),
      size(ws).cast(LongType).as("n_tokens"),
      qualityGate(ws).as("is_quality"))
  }

  /** Streaming surprisal gate — the serving twin of batch t35: documents
    * arriving on the stream are scored against a FROZEN unigram LM
    * (batch-trained over the reference corpus by
    * [[graft.ops.TextAnalysis.unigramLm]] — the standard split: train
    * offline where the full corpus is visible, score online per row) and
    * a document survives only when its mean token commonness reaches
    * `minMeanCppm`. The mean test runs in exact integers
    * (`csum ≥ minMeanCppm · n` — no division, no floats), so the gate
    * decision is bit-identical to scoring the same rows in batch.
    *
    * An out-of-vocabulary token — impossible in batch t35, routine on a
    * live stream — scores cppm 0 (rarer than anything the LM saw), which
    * is exactly the pressure the gate exists to apply.
    *
    * Runs inside foreachBatch: the vocabulary-sized LM broadcasts; per
    * micro-batch the gram probe, per-doc rollup and the survivors'
    * semi-join are batch-local (no state store — the LM is the state,
    * and it is read-only). Output partitions by (`run_id`, `batch_id`)
    * with dynamic partition overwrite — a replayed micro-batch replaces
    * exactly its own partition (the [[nearDupIngest]] recipe).
    *
    * Scale: LM size is vocabulary, ≪ corpus, broadcast-safe by the same
    * argument as batch t35; everything stream-side is one explode + one
    * broadcast join + a batch-local doc rollup — no shuffle of text. */
  def surprisalGateIngest(
      docs: DataFrame,
      lm: DataFrame, // (term, cppm) from TextAnalysis.unigramLm
      minMeanCppm: Long,
      outPath: String,
      checkpoint: String): StreamingQuery = {
    val s0 = docs.sparkSession
    val runId = checkpointRunId(s0, checkpoint)
    val lmCached = lm.cache()
    lmCached.count() // materialize once, before the first micro-batch
    val q = docs.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val s = batch.sparkSession
        import s.implicits._
        val accepted = batch
          .select($"doc_id", explode(split($"text", " ")).as("term"))
          .join(broadcast(lmCached), Seq("term"), "left")
          .groupBy($"doc_id")
          .agg(
            count(lit(1)).as("n"),
            sum(coalesce($"cppm", lit(0L))).as("csum"))
          .filter($"csum" >= lit(minMeanCppm) * $"n")
          .select($"doc_id")
        batch.join(accepted, Seq("doc_id"), "left_semi")
          .withColumn("run_id", lit(runId)).withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("run_id", "batch_id").parquet(outPath)
      }
      .trigger(Trigger.AvailableNow())
      .start()
    unpersistOnTermination(q, lmCached)
    q
  }

  /** Streaming component maintenance — the live twin of batch g18: a
    * stream of near-dup EDGES (the band tier's output) folds into a
    * persistent component-label store per micro-batch via the same
    * contraction step ([[graft.ops.GraphOps.incrementalLabels]]): batch
    * edges contract through the previous labels, components run only on
    * the contracted graph, and a full label SNAPSHOT lands in the store.
    * The full-history closure never re-runs — each micro-batch pays
    * |batch edges| + the contracted graph.
    *
    * Replay safety: snapshots are partitioned by (run_id, batch_id) and
    * carry a seq number = 1 + the latest seq EXCLUDING this (run, batch)
    * partition — so a replayed micro-batch reads the same previous
    * snapshot, recomputes the same labels (re-applying edges is a no-op
    * by the min-id argument on [[graft.ops.GraphOps.incrementalLabels]]),
    * and dynamic-overwrites exactly its own partition; a fresh-checkpoint
    * restart reads the previous run's latest snapshot as genuine history
    * (the [[nearDupIngest]] recipe). Readers take `seq = max(seq)`.
    *
    * Scale: the label store is pairs-sized (≪ corpus); snapshots are
    * full copies of it, prunable by seq. */
  def componentIngest(
      edges: DataFrame,
      labelPath: String,
      checkpoint: String): StreamingQuery = {
    val runId = checkpointRunId(edges.sparkSession, checkpoint)
    edges.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        import spark.implicits._
        val e = batch
          .select(least($"da", $"db").as("da"), greatest($"da", $"db").as("db"))
          .filter($"da" =!= $"db").distinct()
        val prev = readIfPresent(spark, labelPath)
          .map(_.filter(!($"run_id" === lit(runId) && $"batch_id" === lit(batchId))))
        val (prevSeq, oldLab) = prev match {
          case None => (0L, None)
          case Some(df) =>
            val m = df.agg(max($"seq")).head()
            if (m.isNullAt(0)) (0L, None)
            else (m.getLong(0), Some(
              df.filter($"seq" === m.getLong(0)).select($"doc_id", $"component")))
        }
        val updated = oldLab match {
          case None => graft.ops.GraphOps.components(e)
          case Some(lab) => graft.ops.GraphOps.incrementalLabels(lab, e)
        }
        updated
          .withColumn("seq", lit(prevSeq + 1L))
          .withColumn("run_id", lit(runId)).withColumn("batch_id", lit(batchId))
          .write.mode("overwrite").option("partitionOverwriteMode", "dynamic")
          .partitionBy("run_id", "batch_id").parquet(labelPath)
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** Streaming learned-BPE fertility gate — the live twin of batch t39:
    * every arriving document is encoded with the FROZEN merge table a
    * batch [[graft.ops.TextAnalysis.bpeMerges]] run trained, via the
    * same compiled [[graft.functions.BpeEncode]] kernel, so backfill and
    * ingest compute bit-identical pieces-per-word ppm and make the same
    * keep/drop call. High fertility (many pieces per word) means the
    * tokenizer fragments the text — out-of-domain or junk relative to
    * the training corpus, the signal multilingual curation reads before
    * paying sequence-length budget for a document.
    *
    * The merge table rides the kernel as a literal (K rows, frozen at
    * deploy — the tokenizer-artifact pattern), so this is stateless
    * narrow per-row work: no join, no state store, source parallelism.
    * Wordless docs pass (nothing to gate). */
  def bpeFertilityGate(docs: DataFrame, merges: Seq[(String, String)],
      maxPiecesPerWordPpm: Long): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .select($"doc_id",
        graft.functions.BpeEncode($"text", merges).as("e"))
      .select($"doc_id", $"e.n_words".as("n_words"),
        $"e.n_pieces".as("n_pieces"))
      .withColumn("pieces_per_word_ppm",
        when($"n_words" > 0, expr("(1000000 * n_pieces) div n_words")))
      .withColumn("passes",
        coalesce($"pieces_per_word_ppm" <= maxPiecesPerWordPpm, lit(true)))
  }

  /** Streaming DSIR selection gate — the serving twin of batch t46: every
    * arriving document is scored against a FROZEN hashed-n-gram
    * importance-weight vector (batch-fit offline by
    * [[graft.ops.TextAnalysis.dsirWeights]] over the reference corpus —
    * B longs, bounded by the hash width, never by vocabulary or corpus)
    * and kept when its int64 dot-product score reaches `minScore` (the
    * batch side exports the threshold as a t45-style exact quantile of
    * training-corpus scores). Kernel, weights and arithmetic are the
    * batch op's own, so ingest and backfill make bit-identical keep
    * decisions — the kappa property, pinned by StreamsSpec.
    *
    * Stateless narrow per-row work (no watermark, no state store, no
    * join — the weight vector rides in as a literal): pipelines at
    * source parallelism like [[scrubIngest]] and [[rulesGateIngest]],
    * which this composes with in a real curation ingest. */
  def dsirGate(docs: DataFrame, weightsPpm: Seq[Long], minScore: Long): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    require(weightsPpm.nonEmpty, "weight vector must be non-empty")
    docs
      .select($"doc_id",
        graft.functions.HashedBowCounts($"text", weightsPpm.length).as("cnts"),
        lit(weightsPpm.toArray).as("w"))
      .select($"doc_id",
        aggregate(zip_with($"cnts", $"w", (c, w) => c * w),
          lit(0L), (a, x) => a + x).as("score"))
      .withColumn("keep", $"score" >= minScore)
  }

  /** Streaming Count-Min frequency sketch — the live state twin of the
    * 4×1024 CMS that batch t50 error-audits: arriving documents fold
    * into the running (r, b, cell) count table via the SAME disjoint
    * md5-slice row hashes ([[graft.ops.TextAnalysis.cmsBucket]]), so any
    * closed prefix of the stream holds cells bit-identical to a batch
    * rebuild over the same rows (exact integer counts + commutative
    * addition — the kappa property, pinned by StreamsSpec). Downstream
    * heavy-hitter cutoffs and mixture weights read estimates that batch
    * and ingest agree on exactly.
    *
    * State is ≤ [[graft.ops.TextAnalysis.CmsRows]]·
    * [[graft.ops.TextAnalysis.CmsWidth]] = 4096 cells, CONSTANT in
    * stream length — that is the point of a CMS, and why this aggregate
    * runs forever without a watermark (update or complete mode; the
    * in-partition explode map-side-combines to ≤ 4096 partials per
    * task exactly like batch t50). */
  def cmsIngest(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    graft.ops.TextAnalysis.cmsCells(
      docs.select(explode(split($"text", " ")).as("w")))
  }

  /** Streaming language-label gate — the live twin of batch
    * t51_nb_langid: arriving labeled documents are classified against
    * the FROZEN batch-trained Naive-Bayes table (add-one-smoothed
    * integer-ppm likelihoods + priors, batch-fit by
    * [[graft.ops.TextAnalysis.nbModel]]) through the VERBATIM batch
    * scoring expression ([[graft.ops.TextAnalysis.nbClassify]] — literal
    * model, compiled zip_with dot products, lang-ascending argmax), so
    * ingest and backfill predict bit-identically (kappa). A doc whose
    * prediction disagrees with its label routes to review — the t38/s28
    * mislabel-quarantine pattern with a trained classifier behind it.
    *
    * Stateless NARROW per-row work: the |langs|·(B+1) model is
    * parameter-bounded and rides in as literals — no state store, no
    * watermark, no join; pipelines at source parallelism like
    * [[scrubIngest]] and [[rulesGateIngest]]. */
  def nbGate(docs: DataFrame, model: Seq[(String, Long, Seq[Long])]): DataFrame =
    graft.ops.TextAnalysis.nbClassify(docs, model)

  /** Streaming k-anonymity release gate — the serving twin of batch
    * t47: every arriving document is checked against a FROZEN
    * quasi-identifier class map (batch-fit offline by
    * [[graft.ops.TextAnalysis.qiClasses]] over the reference corpus)
    * and flagged when its (lang, source, length-bucket) class has
    * fewer than k members there. A document landing in a sub-k class —
    * or in a class the reference corpus has never seen (csize absent →
    * 0) — is a re-identification risk the release pipeline holds back
    * for suppression or coarsening, BEFORE it reaches a published
    * shard; the batch audit then prices the aggregate risk.
    *
    * The class map is bounded by the QI domain (|langs|·|sources|·|len
    * buckets|, never by corpus), so it broadcasts under the SURVEY §8
    * fixed-domain rule and the stream-static left join stays stateless
    * narrow work: no watermark, no state store — pipelines at source
    * parallelism like [[scrubIngest]], which it composes with in a
    * real release ingest. Bucket arithmetic is the batch op's own
    * (`n_chars div 200`), so ingest and backfill flag bit-identically
    * — the kappa property, pinned by StreamsSpec. */
  def kAnonGate(docs: DataFrame, classSizes: DataFrame, k: Long): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .withColumn("len_bucket", expr("n_chars div 200"))
      .join(broadcast(classSizes), Seq("lang", "source", "len_bucket"), "left")
      .select($"doc_id", $"lang", $"source", $"len_bucket",
        coalesce($"csize", lit(0L)).as("csize"))
      .withColumn("release_ok", $"csize" >= k)
  }

  /** Streaming label-integrity gate — the live twin of batch
    * s28_silhouette_audit: incoming (vec_id, label, embedding) rows are
    * scored against FROZEN batch-fit fixed-point centroids
    * ([[graft.ops.Similarity.fitCentroids]]); a vector not strictly
    * closest to its claimed label's centroid routes to review
    * (mislabeled ingest, drifted encoder, or out-of-distribution data).
    *
    * Stateless and NARROW — the centroids embed as literals (bounded
    * label domain, s22's k-row rule), every distance is the compiled
    * exact-integer SqDistLong, no state, no watermark, no join — so the
    * gate runs at scan speed and flags bit-identically to an s28-style
    * batch backfill over the same rows (the kappa property, pinned by
    * StreamsSpec). */
  def centroidGate(vecs: DataFrame, cents: Seq[(Int, Seq[Long])]): DataFrame = {
    val s = vecs.sparkSession
    import s.implicits._
    val q = vecs.select($"vec_id", $"label",
      graft.ops.Similarity.quantized.as("qe"))
    val (own, other) = graft.ops.Similarity.silhouetteCols(cents, $"label", $"qe")
    q.select($"vec_id", $"label", own.as("own_d2"), other.as("other_d2"))
      // a label the batch fit never saw yields NULL own_d2 — precisely
      // the corrupted/new-label ingest this gate exists to catch, so it
      // must flag false (route to review), never NULL (which would
      // vanish from BOTH filter(label_ok) and filter(!label_ok))
      .withColumn("label_ok",
        coalesce($"own_d2" < $"other_d2", lit(false)))
  }

  /** Streaming quality-rules gate — the live twin of batch t37: every
    * arriving document is flagged by the SAME four rule Columns
    * ([[graft.ops.TextAnalysis.ruleFailures]] — token-count bounds,
    * integer-cross-multiplied mean word length, stopword floor,
    * top-bigram dominance), so backfill and ingest make bit-identical
    * keep/drop decisions. Stateless narrow per-row work (no watermark,
    * no state store) — pipelines at source parallelism like
    * [[scrubIngest]], which this composes with in a real ingest.
    *
    * Emits (doc_id, f_len, f_wordlen, f_stop, f_rep, passes) for every
    * arriving doc; the caller filters on `passes` or routes failures to
    * a quarantine sink. */
  def rulesGateIngest(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val flags = graft.ops.TextAnalysis.ruleFailures($"text")
    // NULL text NULLs every rule Column, and a NULL `passes` escapes
    // BOTH filter(passes) and filter(!passes) — the centroidGate
    // NULL-escape. Unevaluable rules FAIL the gate (flag 1, passes
    // false): a null-text doc routes to quarantine, never vanishes.
    docs.select($"doc_id" +:
      (flags.map { case (n, c) =>
        coalesce(c.cast("long"), lit(1L)).as(s"f_$n") } :+
        coalesce(flags.map(_._2).reduce(_ || _).unary_!, lit(false))
          .as("passes")): _*)
  }

  /** Running per-source vocabulary estimate emitted by [[vocabSketch]]. */
  final case class VocabEstimate(source: String, kmv_size: Long, est_distinct: Double)

  /** Streaming vocabulary-size sketch — the live twin of batch
    * t19_kmv_distinct: a per-source K-Minimum-Values state folded over
    * the document stream via `mapGroupsWithState`, emitting the updated
    * distinct-token estimate every micro-batch (update mode).
    *
    * The state is the ascending min-k hash array itself — O(k) longs per
    * source, CONSTANT in stream length, which is why this runs forever
    * without a watermark: unlike counting distinct tokens (state =
    * vocabulary), the sketch never grows past k. Hashing and the fold
    * rule are the batch op's own definitions
    * ([[graft.ops.TextAnalysis.tokenHash48]], `KmvAgg.fold`), so the
    * stream converges to byte-identical estimates with a batch backfill
    * — the kappa property, pinned end-to-end by StreamsSpec. */
  def vocabSketch(docs: DataFrame, k: Int = 64): Dataset[VocabEstimate] = {
    val s = docs.sparkSession
    import s.implicits._
    val kth = (k - 1).toLong * graft.ops.TextAnalysis.KmvRange48
    docs
      .select($"source", explode(split($"text", " ")).as("w"))
      .select($"source", graft.ops.TextAnalysis.tokenHash48($"w").as("hv"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], VocabEstimate](GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[(String, Long)], state: GroupState[Array[Long]]) =>
          val next = graft.functions.KmvAgg.fold(
            state.getOption.getOrElse(Array.empty[Long]), k, rows.map(_._2))
          state.update(next)
          val est =
            if (next.length < k) next.length.toDouble
            else kth.toDouble / next(k - 1)
          VocabEstimate(src, next.length.toLong, est)
      }
  }

  /** Per-language NB sufficient statistics emitted by [[nbCountsIngest]]. */
  final case class NbLangCounts(lang: String, n_docs: Long, tokens: Long,
      counts: Seq[Long])

  /** Streaming Naive-Bayes model maintenance — the TRAINING half of t51
    * as live state: arriving labeled documents fold their hashed-bucket
    * token counts into a per-language accumulator (mapGroupsWithState),
    * emitting the refreshed sufficient statistics (doc count, token
    * total, per-bucket counts) for every language that received data in
    * a micro-batch (update mode). The add-one-smoothed ppm table derives
    * from these statistics exactly as [[graft.ops.TextAnalysis.nbModel]]
    * derives it from a batch fit — so a model refreshed from the stream
    * is bit-identical to retraining on the closed prefix (kappa, pinned
    * by StreamsSpec), and the serving [[nbGate]] can hot-swap it without
    * a backfill.
    *
    * State is ONE (B+2)-long vector per language — bounded by
    * |langs|·(B+2), CONSTANT in stream length (the hashing trick's
    * point: the feature space never grows), so no watermark is needed.
    * Featurization is the batch kernel itself (HashedBowCounts), so
    * stream and backfill count identically. */
  def nbCountsIngest(docs: DataFrame): Dataset[NbLangCounts] = {
    val s = docs.sparkSession
    import s.implicits._
    val B = graft.ops.TextAnalysis.HashBuckets
    docs
      .select($"lang",
        graft.functions.HashedBowCounts($"text", B).as("cnts"))
      .as[(String, Seq[Long])]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], NbLangCounts](GroupStateTimeout.NoTimeout) {
        (lang: String, rows: Iterator[(String, Seq[Long])],
            state: GroupState[Array[Long]]) =>
          // layout: [0] = n_docs, [1..B] = per-bucket counts
          val acc = state.getOption.getOrElse(new Array[Long](B + 1))
          rows.foreach { case (_, cnts) =>
            acc(0) += 1
            var i = 0
            while (i < B) { acc(i + 1) += cnts(i); i += 1 }
          }
          state.update(acc)
          NbLangCounts(lang, acc(0), acc.drop(1).sum, acc.drop(1).toSeq)
      }
  }

  /** Latest-state row emitted by [[latestState]]. */
  final case class Latest(
      user_id: Long, event_type: String, event_id: Long,
      last_ts: Timestamp, value: Double)
  /** Compact per-key state: the winning (ts, event_id, value) triple. */
  final case class LatestS(tsMs: Long, event_id: Long, value: Double)

  /** Streaming latest-state compaction — the live twin of batch
    * q39_compaction: maintain, per (user_id, event_type), the most
    * recent event (ties broken by event_id), emitting the refreshed
    * snapshot row for every key that received data in a micro-batch
    * (update mode). This is the changelog→table primitive: the sink
    * upserts each emitted row and always holds the current snapshot.
    *
    * Ordering is (ts, event_id) — exactly the batch op's struct-max key
    * — and the fold is max-commutative, so ANY arrival order converges
    * to the same snapshot: late or replayed events that lose the
    * comparison mutate nothing (replay-idempotent by algebra, not by
    * sink bookkeeping). State is ONE constant-size triple per live key —
    * O(distinct keys), independent of stream length, so no watermark is
    * needed (keys here are bounded; an unbounded key domain would add a
    * TTL timeout). */
  def latestState(events: Dataset[Ev2]): Dataset[Latest] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .mapGroupsWithState[LatestS, Latest](GroupStateTimeout.NoTimeout) {
        case ((uid, et), rows, state) =>
          val best = rows.foldLeft(state.getOption) { (acc, e) =>
            val t = e.ts.getTime
            acc match {
              case Some(b) if b.tsMs > t ||
                  (b.tsMs == t && b.event_id > e.event_id) => acc
              case _ => Some(LatestS(t, e.event_id, e.value))
            }
          }
          best.foreach(state.update)
          val b = best.get // rows is non-empty for non-timeout invocations
          Latest(uid, et, b.event_id, new Timestamp(b.tsMs), b.value)
      }
  }

  /** Full event row for [[latestState]] (the `events` table schema). */
  final case class Ev2(event_id: Long, user_id: Long, event_type: String,
      ts: Timestamp, value: Double)

  /** New-user row emitted by [[firstSeen]]. */
  final case class FirstSeen(user_id: Long, first_ts: Timestamp)

  /** Streaming first-seen detection — the live twin of batch q40's
    * first-event reduction: emit each user exactly once, on the first
    * micro-batch that contains them. Downstream, a daily count of these
    * emissions IS the live audience-growth curve.
    *
    * State per user is a single empty-marker entry (the key itself), so
    * memory is O(distinct users ever seen) — the same lower bound any
    * exact first-seen answer needs. Replays re-deliver only events whose
    * user is already marked, and marked users emit nothing — idempotent
    * without sink cooperation. (Exact-once caveat shared with q40: a
    * genuinely unbounded user domain would swap the marker set for a
    * TTL'd state or a bloom-with-repair pattern.) */
  def firstSeen(events: Dataset[Ev2]): Dataset[FirstSeen] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Boolean, FirstSeen](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev2], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // the user's earliest event in this batch is the first sighting
            Iterator.single(FirstSeen(uid,
              rows.map(_.ts).minBy(_.getTime)))
          }
      }
  }

  /** Rolling 7-day distinct actives — the live twin of batch
    * q41_rolling_active, in NATIVE operators end to end: the sliding
    * `window(ts, 7 days, 1 day)` assigns each event to the 7 report
    * windows it is visible from (the same contribution expansion the
    * batch op does with an explicit explode), a watermarked
    * `dropDuplicates` collapses (window, user) — so state holds each
    * pair once, not per event — and an append-mode count finalizes each
    * window exactly once when the watermark passes its end.
    *
    * This chains two stateful operators (dedup → windowed agg); Spark
    * propagates the watermark between them, and both stores evict as
    * windows expire — state is O(open windows · active users), bounded
    * by the watermark, never O(history). `report_day` is the window's
    * last covered day (end − 1 day), matching the batch op's key. */
  def activeWindows(events: DataFrame, watermarkDelay: String = "1 day"): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .select(window($"ts", "7 days", "1 day").as("w"), $"user_id")
      .dropDuplicates("w", "user_id")
      .groupBy($"w")
      .agg(count(lit(1)).as("active_users_7d"))
      .select(
        date_format(date_sub($"w.end", 1), "yyyy-MM-dd").as("report_day"),
        $"active_users_7d")
  }

  /** Closed SCD2 interval emitted by [[scdIngest]]. */
  final case class ScdInterval(
      user_id: Long, run_id: Long, state: String,
      valid_from: Timestamp, valid_to: Timestamp, n_events: Long)
  /** Per-user open run: current state and its interval bookkeeping. */
  final case class ScdS(runId: Long, state: String, validFromMs: Long,
      nEvents: Long, lastTsMs: Long, lastEventId: Long)

  /** Streaming SCD type-2 interval build — the live twin of batch
    * q42_scd2_intervals: per user, maintain the open state run; when an
    * arriving event carries a DIFFERENT event_type, emit the now-closed
    * interval (valid_to = the new run's first timestamp, exactly the
    * batch op's lead() semantics) and open the next run. Append mode:
    * only closed intervals are emitted — the open run lives in state
    * until a state change closes it, so the sink is append-only history.
    *
    * Within a micro-batch events are sorted by (ts, event_id) — the
    * batch op's total order — so any intra-batch arrival order yields
    * the same intervals. ACROSS batches the fold assumes per-user
    * event-time monotonicity (an event older than the open run's last
    * seen (ts, event_id) is dropped as late data): unlike q39's
    * max-fold, interval history is order-sensitive by nature, so the
    * batch q42 over the full log remains the replayable source of truth
    * and this ingest is the low-latency approximation a watermarked
    * buffer would make exact.
    *
    * State is ONE constant-size run per live user — O(users), stream-
    * length independent. */
  def scdIngest(events: Dataset[Ev2]): Dataset[ScdInterval] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ScdS, ScdInterval](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev2], state: GroupState[ScdS]) =>
          val ordered = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var st = state.getOption.orNull
          val closed = Seq.newBuilder[ScdInterval]
          ordered.foreach { e =>
            val t = e.ts.getTime
            if (st == null) {
              st = ScdS(1L, e.event_type, t, 1L, t, e.event_id)
            } else if (t < st.lastTsMs ||
                (t == st.lastTsMs && e.event_id <= st.lastEventId)) {
              // late or replayed: older than the open run's frontier — drop
            } else if (e.event_type == st.state) {
              st = st.copy(nEvents = st.nEvents + 1, lastTsMs = t,
                lastEventId = e.event_id)
            } else {
              closed += ScdInterval(uid, st.runId, st.state,
                new Timestamp(st.validFromMs), new Timestamp(t), st.nEvents)
              st = ScdS(st.runId + 1, e.event_type, t, 1L, t, e.event_id)
            }
          }
          if (st != null) state.update(st)
          closed.result().iterator
      }
  }

  /** Scored closed hour emitted by [[anomalyIngest]] — the batch
    * q43 row shape. Emitted only once the trailing 24-hour baseline is
    * full, exactly like the batch gate (q43 filters n_base = 24), so the
    * closed-prefix row SET matches batch output; z is null when the
    * baseline has zero variance. */
  final case class HourScore(hour: String, cnt: Long, mean_cnt: Option[Double],
      z: Option[Double], is_spike: Long)
  /** Anomaly fold state: the open hour's running count plus the trailing
    * ring of closed-hour counts (most recent last, ≤ 24). */
  final case class AnomalyS(openHourMs: Long, openCnt: Long, ring: Seq[Long])

  /** Streaming hourly volume anomaly — the live twin of batch
    * q43_hourly_anomaly: maintain the open hour's count; when an event
    * for a LATER hour arrives, close the hour (zero-filling any silent
    * hours between, exactly like the batch spine) and score it against
    * the trailing 24 closed hours with the batch op's integer-moment
    * z-formula. Append mode: each hour emits once, when it closes; the
    * open hour lives in state.
    *
    * The fold is keyed by a single constant — the GLOBAL hourly series
    * is one ring of 24 longs, so "one key" is one tiny state row, not a
    * bottleneck — BUT `flatMapGroupsWithState` performs no partial
    * aggregation of its own (that machinery exists only for
    * Aggregator-based aggs), so the raw events are pre-reduced to
    * per-partition (hour, count) partials with a narrow `mapPartitions`
    * before the shuffle: only ≤ partitions × distinct-hours tiny rows
    * ever reach (or are buffered by) the state task. Events older than
    * the open hour are dropped as late data (cf. scdIngest's frontier
    * rule); the batch q43 over the full log stays the replayable source
    * of truth.
    *
    * Rows are emitted only once 24 closed hours exist — identical to the
    * batch gate, so stream output ≡ batch output on the closed prefix
    * (the kappa property StreamsSpec pins). A single corrupt far-future
    * timestamp would otherwise zero-fill unboundedly AND poison the
    * frontier so every genuine event reads as late forever: the fill is
    * bounded at [[MaxFillHours]] and a violation fails the batch loudly
    * (corrupt input is a data bug to fix upstream, not silently absorb). */
  val MaxFillHours: Long = 24L * 366L

  def anomalyIngest(events: Dataset[Ev2]): Dataset[HourScore] = {
    val s = events.sparkSession
    import s.implicits._
    val HourMs = 3600000L
    def fmt(ms: Long): String =
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(ms))
    def round6(v: Double): Double =
      BigDecimal(v).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
    // identical arithmetic to the batch op: exact integer moments, then
    // one fixed tree of IEEE ops. None until the 24-hour baseline fills
    // — the batch output has no such rows, so neither does the stream.
    def score(hourMs: Long, cnt: Long, ring: Seq[Long]): Option[HourScore] = {
      if (ring.size < 24) None
      else {
        val s1 = ring.sum
        val s2 = ring.map(c => c * c).sum
        val mean = s1.toDouble / 24.0d
        val varr = (24.0d * s2.toDouble - s1.toDouble * s1.toDouble) / (24.0d * 23.0d)
        val z = if (varr > 0.0d) Some(round6((cnt.toDouble - mean) / math.sqrt(varr))) else None
        Some(HourScore(fmt(hourMs), cnt, Some(round6(mean)), z,
          if (z.exists(v => math.abs(v) > 3.0d)) 1L else 0L))
      }
    }
    // narrow per-partition pre-reduction: (hour, count) partials
    val hourly: Dataset[(Long, Long)] = events.mapPartitions { it =>
      val m = scala.collection.mutable.LongMap.empty[Long]
      it.foreach { e =>
        val t = e.ts.getTime
        val hm = t - java.lang.Math.floorMod(t, HourMs)
        m.update(hm, m.getOrElse(hm, 0L) + 1L)
      }
      m.iterator
    }
    hourly
      .groupByKey(_ => 0L)
      .flatMapGroupsWithState[AnomalyS, HourScore](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: Long, rows: Iterator[(Long, Long)], state: GroupState[AnomalyS]) =>
          val ordered = rows.toSeq.sortBy(_._1)
          var st = state.getOption.orNull
          val out = Seq.newBuilder[HourScore]
          def closeInto(ring: Seq[Long], cnt: Long): Seq[Long] =
            (ring :+ cnt).takeRight(24)
          ordered.foreach { case (hm, cnt) =>
            if (st == null) st = AnomalyS(hm, cnt, Nil)
            else if (hm < st.openHourMs) () // late: older than the open hour
            else if (hm == st.openHourMs) st = st.copy(openCnt = st.openCnt + cnt)
            else {
              val gapHours = (hm - st.openHourMs) / HourMs
              if (gapHours > MaxFillHours)
                throw new IllegalStateException(
                  s"anomalyIngest: event hour ${fmt(hm)} is $gapHours hours past " +
                    s"the open hour ${fmt(st.openHourMs)} (max $MaxFillHours) — " +
                    "corrupt timestamp? failing the batch instead of poisoning state")
              // close the open hour, then zero-fill silent hours up to hm
              out ++= score(st.openHourMs, st.openCnt, st.ring)
              var ring = closeInto(st.ring, st.openCnt)
              var h = st.openHourMs + HourMs
              while (h < hm) {
                out ++= score(h, 0L, ring)
                ring = closeInto(ring, 0L)
                h += HourMs
              }
              st = AnomalyS(hm, cnt, ring)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Inter-arrival gap emitted by [[gapIngest]] — the rows batch q46
    * histograms. */
  final case class GapObs(user_id: Long, event_type: String, gap_s: Long)

  /** Last-seen frontier per (user, type): micros + event_id tiebreak. */
  final case class GapS(lastUs: Long, lastEventId: Long)

  /** Funnel-stage state: first-completion micros per stage, -1 = unset. */
  final case class FunnelS(t0: Long, t1: Long, t2: Long)
  /** Stage-completion row emitted by [[conversionIngest]]:
    * stage 0 = signup, 1 = click-within-48h, 2 = purchase-within-48h. */
  final case class StageHit(user_id: Long, stage: Int, us: Long)

  /** Streaming ordered conversion funnel — the live twin of batch q23
    * (signup → click ≤ 48 h later → purchase ≤ 48 h after that, each
    * stage keyed to the FIRST qualifying event): a per-user
    * `flatMapGroupsWithState` state machine holding three micros
    * (O(users) state, nothing grows with history) that emits one
    * [[StageHit]] the moment a stage first completes. Counting hits per
    * stage over the output IS the live funnel; on in-order delivery the
    * totals equal batch q23's per-stage counts (the scdIngest frontier
    * caveat: an out-of-order signup older than the recorded first one
    * cannot retroactively re-run the funnel — the batch op over the full
    * log stays the replayable source of truth). */
  def conversionIngest(events: Dataset[Ev2]): Dataset[StageHit] = {
    val s = events.sparkSession
    import s.implicits._
    val win = 48L * 3600 * 1000000 // 48 h in micros
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelS, StageHit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev2], state: GroupState[FunnelS]) =>
          var st = state.getOption.getOrElse(FunnelS(-1L, -1L, -1L))
          val out = Seq.newBuilder[StageHit]
          rows.toSeq.sortBy(e => (usOf(e.ts), e.event_id)).foreach { e =>
            val us = usOf(e.ts)
            e.event_type match {
              case "signup" if st.t0 < 0 =>
                st = st.copy(t0 = us); out += StageHit(uid, 0, us)
              case "click" if st.t0 >= 0 && st.t1 < 0 &&
                  us > st.t0 && us <= st.t0 + win =>
                st = st.copy(t1 = us); out += StageHit(uid, 1, us)
              case "purchase" if st.t1 >= 0 && st.t2 < 0 &&
                  us > st.t1 && us <= st.t1 + win =>
                st = st.copy(t2 = us); out += StageHit(uid, 2, us)
              case _ => ()
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  /** Streaming inter-arrival gap extraction — the live twin of batch
    * q46's lag window: for each (user, event_type) stream, emit the gap
    * (whole seconds, floored from exact integer micros) between every
    * event and its predecessor. Downstream, any histogram of these rows
    * IS the live cadence profile; the batch op over the full log stays
    * the replayable source of truth.
    *
    * State per (user, type) is ONE frontier row (last micros + event_id)
    * — the same O(keys) lower bound the lag itself needs; nothing grows
    * with history. Ties on the timestamp emit a 0-second gap exactly
    * like the batch window's (ts, event_id) ordering; an event at or
    * behind the stored frontier is late or replayed and is dropped
    * (cf. scdIngest's frontier rule — batch and stream agree on any
    * in-order delivery, however it is micro-batched). */
  /** Exact integer micros from the Timestamp's (epoch-second, nanos)
    * pair — getTime alone would truncate to millis and break parity
    * with the batch ops' unix_micros. Shared by every frontier ingest. */
  private def usOf(t: Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  def gapIngest(events: Dataset[Ev2]): Dataset[GapObs] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[GapS, GapObs](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: (Long, String), rows: Iterator[Ev2], state: GroupState[GapS]) =>
          val (uid, etype) = key
          val ordered = rows.toSeq.sortBy(e => (usOf(e.ts), e.event_id))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[GapObs]
          ordered.foreach { e =>
            val us = usOf(e.ts)
            if (st == null) st = GapS(us, e.event_id)
            else if (us < st.lastUs ||
                (us == st.lastUs && e.event_id <= st.lastEventId)) {
              // late or replayed: at or behind the frontier — drop
            } else {
              out += GapObs(uid, etype, (us - st.lastUs) / 1000000L)
              st = GapS(us, e.event_id)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Transition observation emitted by [[transitionIngest]] — the rows
    * batch q49 counts into the matrix. */
  final case class TransObs(user_id: Long, from_type: String, to_type: String)

  /** Per-user frontier: last event's (micros, event_id, type). */
  final case class TransS(lastUs: Long, lastEventId: Long, lastType: String)

  /** Streaming event-type transition extraction — the live twin of batch
    * q49's lead window: for each user stream, emit the (from_type →
    * to_type) observation between every event and its predecessor.
    * Downstream, any count of these rows IS the live transition matrix
    * (grouped count + row-conditional ppm exactly as the batch op); the
    * batch op over the full log stays the replayable source of truth.
    *
    * State per user is ONE frontier row — the same O(users) bound as
    * firstSeen; nothing grows with history. Ordering inside a micro-batch
    * is (ts micros, event_id), the batch window's total order; an event
    * at or behind the frontier is late or replayed and is dropped
    * (gapIngest's frontier rule — stream equals batch on any in-order
    * delivery, however it is micro-batched). */
  def transitionIngest(events: Dataset[Ev2]): Dataset[TransObs] = {
    val s = events.sparkSession
    import s.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[TransS, TransObs](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Ev2], state: GroupState[TransS]) =>
          val ordered = rows.toSeq.sortBy(e => (usOf(e.ts), e.event_id))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[TransObs]
          ordered.foreach { e =>
            val us = usOf(e.ts)
            if (st == null) st = TransS(us, e.event_id, e.event_type)
            else if (us < st.lastUs ||
                (us == st.lastUs && e.event_id <= st.lastEventId)) {
              // late or replayed: at or behind the frontier — drop
            } else {
              out += TransObs(uid, st.lastType, e.event_type)
              st = TransS(us, e.event_id, e.event_type)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Streaming incremental materialization: each micro-batch is merged
    * into the parquet target by `uniqueKey` (delete-insert, the parquet
    * analog of MERGE INTO — same semantics as the batch Runner's
    * incremental path). Idempotent per key, so micro-batch replays after
    * failure converge. */
  def incrementalMerge(
      stream: DataFrame,
      path: String,
      checkpoint: String,
      uniqueKey: String): StreamingQuery =
    stream.writeStream
      .outputMode(OutputMode.Append)
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val target = new org.apache.hadoop.fs.Path(path)
        val tmp = new org.apache.hadoop.fs.Path(path + "__tmp")
        val fs = target.getFileSystem(spark.sessionState.newHadoopConf())
        // crash recovery: a previous attempt may have died between
        // deleting the target and renaming the (complete) tmp over it —
        // finish that swap before reading history, or the merge would
        // silently restart from the current batch alone
        // ... and only a COMPLETE tmp: a crash DURING the very first
        // batch's tmp write leaves a partial directory (no _SUCCESS
        // marker) that must never be promoted — corrupt footers would
        // wedge every subsequent retry on the readIfPresent rethrow
        if (fs.exists(tmp) &&
            fs.exists(new org.apache.hadoop.fs.Path(tmp, "_SUCCESS")) &&
            readIfPresent(spark, path).isEmpty) {
          fs.delete(target, true)
          fs.rename(tmp, target)
        }
        val deduped = batch.dropDuplicates(uniqueKey)
        val merged = readIfPresent(spark, path) match {
          case None => deduped
          case Some(existing) =>
            existing.join(deduped.select(col(uniqueKey)), Seq(uniqueKey), "left_anti")
              .unionByName(deduped)
        }
        // write the full merged state to tmp, then swap by directory
        // rename: the vulnerable delete→rename window is covered by the
        // recovery above (tmp IS the complete state), and the rename
        // halves the I/O of the old copy-back
        fs.delete(tmp, true)
        merged.write.parquet(tmp.toString)
        fs.delete(target, true)
        if (!fs.rename(tmp, target))
          throw new java.io.IOException(
            s"incrementalMerge: rename $tmp -> $target failed")
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
