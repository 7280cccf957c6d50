package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every registered query at SPARK_GRAFT_SF_DIR
  * and prints one JSON line. Results are forced through a noop-style sink
  * (`toRdd.count()` over the full physical plan) rather than `df.count()` —
  * a bare count lets Catalyst prune away the very columns being benchmarked.
  */
object Bench {
  /** 1-minute system load average (−1 where unsupported) — recorded at
    * sweep start and end so every bench artifact carries its own drift
    * disclaimer: absolute totals on this class of VM swing ±50% with
    * host load (CLAUDE.md; the round-12 driver window read 16% worse
    * than the settled pair with ZERO code change). Compare totals only
    * between runs whose load fields are both near-idle. */
  private def loadAvg: Double =
    java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage

  def main(args: Array[String]): Unit = {
    val loadStart = loadAvg
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // bench files are single small parquet files; the default 128 MB
      // split size would scan each on ONE core. At production scale the
      // default is right — here the knob re-widens the scan stage.
      .config("spark.sql.files.maxPartitionBytes", (2 * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (128 * 1024).toString)
      // single-JVM shuffles land in the OS page cache — lz4 on the
      // exchange path is pure CPU overhead here (no network, no cold
      // reads) and costs window/sort-heavy queries 2×. On a real cluster
      // compression stays ON (the default); this mirrors the oracle's
      // uncompressed in-memory exchanges for a like-for-like single-node
      // comparison. The crossover is measured, not guessed: once an
      // exchange carries pair-scale frames (g22's 70M wedge rows at 10x
      // lineitem) compression flips to a win — graft.Stress, the at-scale
      // bench surface, pins compress=true + initialPartitionNum=256 for
      // exactly that regime (SURVEY §6).
      .config("spark.shuffle.compress", "false")
      .config("spark.shuffle.spill.compress", "false")
      // the posting-list index (Dedup.allPostings) is an object
      // aggregate; the default fallback (128 in-memory groups) degrades
      // it to a per-partition sort almost immediately. Buffers are
      // HARD-bounded by the CappedCollect cap (τ+1 ids, typical 1–2),
      // so millions of in-memory groups fit easily; on a cluster, size
      // this with executor memory.
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        (4 * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    // dev loop: SPARK_GRAFT_CONF="k=v;k=v" overlays session conf for
    // config experiments; the driver never sets it
    sys.env.get("SPARK_GRAFT_CONF").toSeq
      .flatMap(_.split(";")).map(_.split("=", 2))
      .foreach { case Array(k, v) => builder.config(k, v); case _ => }
    val spark = builder.getOrCreate()
    // ERROR, not WARN: the per-run unpersist of lazily-checkpointed RDDs
    // emits an async "lineage truncated" WARN per block, and any WARN
    // that lands after the final JSON line breaks the harness's
    // last-line parse (ADVICE r7). Real failures still surface — the
    // bench prints them itself via System.err.
    spark.sparkContext.setLogLevel("ERROR")
    // the per-run eager unpersist races in-flight task completions, and
    // DAGScheduler logs a benign multi-line "Failed to update accumulator
    // (Unknown class)" ERROR stack per race — 60 lines of it can land
    // directly ahead of the final JSON inside the harness's 2000-char
    // tail window. Query failures surface through the caught exception
    // per run (stderr + the failed list), never through this logger.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.scheduler.DAGScheduler",
      org.apache.logging.log4j.Level.OFF)
    // JVM + parquet-footer + view-registration warmup, excluded from
    // timings; the shuffle job initializes codegen, the shuffle system,
    // and the broadcast machinery so the first timed query isn't charged
    // for one-time session setup.
    ops.Tables.load(spark, sfDir)
    import org.apache.spark.sql.functions.expr
    spark.range(1 << 20).groupBy(expr("id % 7")).count()
      .queryExecution.toRdd.count()
    // touch every table once: parquet footer + vectorized reader + AQE
    // init would otherwise be charged to whichever query runs first
    ops.Tables.all.foreach { t =>
      try spark.table(t).limit(4).queryExecution.toRdd.count()
      catch { case _: Throwable => () }
    }
    // dev loop: SPARK_GRAFT_ONLY=d02,d03 times just the named queries
    // (prefix match); the driver never sets it, so the graded run is full
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val picked = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.startsWith))
    }
    // each query runs three times and reports the fastest: run 1 pays
    // one-time Janino/whole-stage codegen compilation (~1-2s of JVM work
    // per unique plan, amortized away on any long-lived cluster), later
    // runs measure the steady-state plan — the number that scales with
    // data volume. Min-of-3 rather than min-of-2 because single-run JIT /
    // scheduler jitter on multi-stage sub-second plans is ±2× (observed
    // across idle-machine runs); the JVM caches only compiled code
    // between runs; no data or shuffle output is reused (each run
    // re-executes the full physical plan).
    val repeat = math.max(1, sys.env.get("SPARK_GRAFT_REPEAT")
      .flatMap(_.toIntOption).getOrElse(3))
    val results = picked.map { case (name, fn) =>
      val runs = (1 to repeat).map { _ =>
        val t0 = System.nanoTime()
        val ok =
          try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
          catch { case e: Throwable =>
            System.err.println(s"[bench] $name failed: ${e.getMessage}")
            false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        // each run builds FRESH lazy-checkpoint RDDs (Q.sortedNarrow and
        // the shared-index ops); their MEMORY_AND_DISK blocks are only
        // reclaimed when the driver GCs the RDD object, so across
        // 160+ queries × 3 runs storage fills and later checkpoint-heavy
        // queries pay eviction/spill I/O that has nothing to do with
        // their plan (observed: d24 0.8s isolated → 15s late in a full
        // sweep). Blocks are never shared across runs — drop them
        // eagerly once the run is timed.
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = false))
        (dt, ok)
      }
      // drive ContextCleaner between QUERIES (not between the min-of-3
      // runs): shuffle files and broadcasts free only when the driver
      // GCs their references, and the accumulated residue taxed later
      // queries through page-cache pressure with no plan-side cause
      // (round-15 adjudication of the r14 "in-sweep regression": d14
      // 5.16 s late in a full sweep vs 2.30 s with cleanup; g22 at the
      // 40× stress 52.1 s after g21 in-JVM vs 27.0 s alone). Between
      // runs it is NOT run — a per-run full GC measured a uniform
      // ~80 ms median tax on the next timed run (+18 s over the suite),
      // which is the min-of-3's warm state being evacuated for nothing.
      System.gc()
      val best = runs.filter(_._2).map(_._1).sorted.headOption.getOrElse(-1.0)
      // ok requires EVERY run to pass — a query that flakes on any run is
      // a failure, not a pass with its fastest lucky time
      (name, best, runs.forall(_._2))
    }
    // a failed query must not read as a fast pass: sentinel -1 in the map,
    // name in "failed", wall-clock excluded from the total
    // Locale.ROOT formatting: the f-interpolator uses the JVM default
    // locale, and a comma-decimal locale (de_DE ...) would emit
    // "value":125,832 — invalid JSON on the one line the harness parses
    def num(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def entry(k: String, v: Double, ok: Boolean): String =
      s"\"" + k + "\":" + (if (ok) num(v) else "-1")
    val qs = results.map { case (k, v, ok) => entry(k, v, ok) }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s"\"$k\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum
    // machine-state stamp: 1-min loadavg at sweep start/end (see loadAvg)
    val machine =
      s""""load_start":${num(loadStart)},"load_end":${num(loadAvg)}"""
    val json =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","runs_per_query":$repeat,"timing":"min",$machine,"queries":$qs,"failed":$failed,"sf":"$sfDir"}"""
    // The round harness keeps only the LAST ~2000 chars of combined
    // stdout/stderr (observed in BENCH_r01–r06: every artifact stored a
    // mid-line tail fragment, parsed:null — the full per-query map has
    // never fit). So stdout gets a size-bounded line that actually
    // survives that window: failures and the slowest queries first (the
    // informative ones), capped so line + sbt's trailing "[success]"
    // banner stay inside the window. The complete map is persisted to
    // BENCH_LOCAL.json (committed evidence) either way.
    // 1450, not 1500: the load_start/load_end stamp joined the fixed
    // fields, and the whole line must keep clearing the harness's
    // ~2000-char tail window
    val budget = 1450
    val ordered = results.filterNot(_._3) ++
      results.filter(_._3).sortBy(-_._2) // failed first, then slowest
    val kept = new StringBuilder
    var omitted = 0
    ordered.foreach { case (k, v, ok) =>
      val e = entry(k, v, ok)
      if (kept.length + e.length + 1 <= budget) {
        if (kept.nonEmpty) kept.append(',')
        kept.append(e)
      } else omitted += 1
    }
    // the stdout failed-array shares the size budget: the failed names
    // already lead `kept` (as -1 entries), so an unbounded copy here
    // would overflow the harness's tail window in exactly the
    // mass-failure round where the parse matters most
    val failedNames = results.collect { case (k, _, false) => s"\"$k\"" }
    val failedKept = new StringBuilder
    var failedOmitted = 0
    failedNames.foreach { e =>
      if (failedKept.length + e.length + 1 <= 300) {
        if (failedKept.nonEmpty) failedKept.append(',')
        failedKept.append(e)
      } else failedOmitted += 1
    }
    // BENCH_LOCAL.json is committed evidence and must ONLY ever hold a
    // full-registry run at the default SF: round 13's end-of-round snapshot
    // committed a 4-query stress leftover over the real 228-query pair
    // (VERDICT r13). Subset (SPARK_GRAFT_ONLY), non-default-SF, conf-overlay
    // (SPARK_GRAFT_CONF — knob probes like shuffle.partitions=8 measure a
    // different engine config) and non-default-repeat runs are dev-loop
    // scratch and land in BENCH_SCRATCH.json unless the caller explicitly
    // overrides the path.
    val isFullDefaultRun =
      only.isEmpty && sfDir == "/root/testdata/sf0.1" &&
        sys.env.get("SPARK_GRAFT_CONF").forall(_.trim.isEmpty) &&
        repeat == 3
    val benchOut = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      if (isFullDefaultRun) "BENCH_LOCAL.json" else "BENCH_SCRATCH.json")
    val stdoutJson =
      s"""{"metric":"total","value":${num(total)},"unit":"sec","runs_per_query":$repeat,"timing":"min",$machine,"n_queries":${results.size},"queries":{$kept},"queries_omitted":$omitted,"queries_full":"$benchOut","failed":[$failedKept],"failed_omitted":$failedOmitted,"sf":"$sfDir"}"""
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(benchOut), json + "\n")
    catch { case e: Throwable =>
      // never silent: a stale committed BENCH_LOCAL.json surviving a
      // failed write would masquerade as this run's evidence
      System.err.println(s"[bench] could not write $benchOut: ${e.getMessage}")
    }
    // drain every outstanding checkpoint block SYNCHRONOUSLY, stop Spark,
    // and only then print the JSON — nothing (async unpersist WARNs,
    // executor shutdown chatter) may interleave after the line the round
    // harness parses from its bounded tail window. build.sbt passes the
    // forked stdout through raw and suppresses sbt's [success] banner, so
    // this println IS the final line of the run's combined output.
    // silence shutdown chatter entirely: a non-fatal DAGScheduler
    // event-loop stack trace logged during unpersist/stop used to land in
    // the harness's 2000-char tail window ahead of the JSON line — every
    // measurement is already taken by this point
    spark.sparkContext.setLogLevel("OFF")
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    spark.stop()
    System.out.flush(); System.err.flush()
    println(stdoutJson)
    System.out.flush()
  }
}
