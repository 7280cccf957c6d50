package graft.cli

import graft.core.changes.{ChangeSet, ChangeSetProcessor}
import graft.core.graph.Selector
import graft.core.model.Owner
import graft.core.parse.ProjectLoader
import graft.engine.Runner
import graft.mesh._
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Path, Paths}

/** CLI mirroring the reference's command surface (`main.py`):
  *
  * {{{
  * graft run            [--select S]* [--project-dir P] [--full-refresh] [--threads N]
  * graft test           [--project-dir P]      (generic tests as violation queries)
  * graft split NAME      --select S [--target-dir D] [--dry-run]
  * graft create-group G  --select S [--owner-name N] [--group-yml-path F]
  * graft group G         --select S [--owner-name N]   (create-group + contracts)
  * graft contract        --select S                    (contracts only)
  * graft version      MODEL|--select S [--increment|--latest] [--defined-in F]
  * graft add-version  MODEL|--select S [--defined-in F]
  * graft bump-version MODEL|--select S [--increment|--latest] [--defined-in F]
  *                    (default latest_version behavior: prerelease)
  * graft connect         --project-paths P1 P2 | --projects-dir D
  *                       [--exclude-projects N]* [--dry-run]
  * }}}
  *
  * Every selecting command also accepts `--selector NAME` (named selector
  * from `selectors.yml`) and `--exclude`. Global flags mirror the
  * reference group (`main.py:78-90`): `--version` prints the version and
  * exits, `--debug` raises log verbosity, `--dry-run` plans without
  * editing. `--project-path` (reference spelling, `cli.py:8`) and
  * `--project-dir` are interchangeable; `split` takes `--create-path` or
  * `--target-dir`. `--read-catalog` (or env `GRAFT_READ_CATALOG`) reuses
  * the project-local `.graft/warehouse` instead of re-materializing into
  * a temp dir (the reference's catalog-cache lever, `cli.py:98-104`);
  * `contract --public-only` restricts contracting to public models.
  *
  * All commands are pure planners; `--dry-run` prints the plan instead of
  * editing files (the reference's plan/execute split, `main.py:99-110`).
  * Commands that need physical schemas (group/contract) run the project
  * on a local SparkSession first.
  */
object Main {

  private case class Args(
      positional: Vector[String],
      flags: Map[String, Vector[String]],
      switches: Set[String])

  /** Mirrors the reference's published version (dbt-meshify 0.5.5); the
    * reference prints the bare version string (`main.py:88-90`). */
  private val Version = "0.5.5"

  private def parse(argv: Array[String]): Args = {
    var pos = Vector.empty[String]
    var flags = Map.empty[String, Vector[String]].withDefaultValue(Vector.empty)
    var switches = Set.empty[String]
    var i = 0
    while (i < argv.length) {
      val a = argv(i)
      if (a == "--dry-run" || a == "--prerelease" || a == "--increment" ||
        a == "--latest" || a == "--debug" || a == "--read-catalog" ||
        a == "--public-only" || a == "--full-refresh" || a == "--defer" ||
        a == "--no-compile" || a == "--store-failures")
        switches += a.stripPrefix("--")
      else if (a.startsWith("--")) {
        val key = a.stripPrefix("--")
        val vals = Vector.newBuilder[String]
        while (i + 1 < argv.length && !argv(i + 1).startsWith("--")) {
          i += 1; vals += argv(i)
        }
        flags = flags.updated(key, flags(key) ++ vals.result())
      } else pos :+= a
      i += 1
    }
    Args(pos, flags, switches)
  }

  def main(argv: Array[String]): Unit = {
    val code = run(argv)
    if (code != 0) sys.exit(code)
  }

  /** `--read-catalog` resolution: the flag, or either env-var spelling —
    * graft's own GRAFT_READ_CATALOG and the reference's
    * DBT_MESHIFY_READ_CATALOG (cli.py:98-104 reads the env var as an
    * alias of the flag). The env VALUE is coerced to bool the way
    * click's is_flag+envvar does — so `DBT_MESHIFY_READ_CATALOG=0`
    * (or false/no/off/empty) disables rather than enables. Pure over an
    * env map so specs can exercise both spellings without mutating
    * process env. */
  def readCatalogFrom(flag: Boolean, env: Map[String, String]): Boolean = {
    def truthy(v: String): Boolean =
      !Set("", "0", "false", "no", "off")(v.trim.toLowerCase)
    flag || env.get("GRAFT_READ_CATALOG").exists(truthy) ||
      env.get("DBT_MESHIFY_READ_CATALOG").exists(truthy)
  }

  /** [[main]] without the process exit: returns the would-be exit code so
    * embedders and specs can exercise failure paths (a sys.exit in a
    * forked test JVM aborts the whole suite). */
  def run(argv: Array[String]): Int = {
    // global --version prints the version string and exits, wherever it
    // appears (the reference's group-level flag, main.py:80,88-90)
    if (argv.contains("--version")) { println(Version); return 0 }
    // `operation <cmd>` is the reference's namespacing for the single-op
    // commands (main.py:114-118); accept and flatten it so invocations
    // port verbatim
    val argv1 = if (argv.headOption.contains("operation")) argv.drop(1) else argv
    val args = parse(argv1.drop(1))
    val command = argv1.headOption.getOrElse("help")
    // --project-path is the reference spelling (cli.py:8); --project-dir
    // is kept as the historical alias
    val root = Paths.get((args.flags("project-path") ++ args.flags("project-dir"))
      .headOption.getOrElse("."))
    val dryRun = args.switches("dry-run")
    // --debug maps the reference's DEBUG log level to Spark's (main.py:83)
    val logLevel = if (args.switches("debug")) "INFO" else "WARN"
    // --read-catalog (or the env-var forms: GRAFT_READ_CATALOG, plus the
    // reference's own spelling DBT_MESHIFY_READ_CATALOG — cli.py:98-104
    // reads the env var as an alias of the flag): reuse the project-local
    // warehouse across invocations instead of rebuilding into a throwaway
    // temp dir
    val readCatalog = Main.readCatalogFrom(
      args.switches("read-catalog"), sys.env)
    def warehouse(): Path =
      if (readCatalog) Files.createDirectories(root.resolve(".graft").resolve("warehouse"))
      else Files.createTempDirectory("graft_wh")

    def apply(cs: ChangeSet, at: Path = root): Unit =
      new ChangeSetProcessor(at, dryRun = dryRun, log = println).process(Seq(cs))
    def readFile(p: String): String = Files.readString(root.resolve(p))
    // selection = --select/--exclude grammar ∪ --selector (named selector
    // from selectors.yml, like the reference's pass-through to dbt ls)
    def selection(m: graft.core.model.Manifest): Set[String] = {
      // --state <path>: comparison manifest for state:modified/state:new —
      // a dbt-core manifest.json (or a directory containing one, dbt's
      // --state convention), loaded through the artifact-interop front end
      val state = args.flags("state").headOption.flatMap { p =>
        val path = Paths.get(p)
        val mf =
          if (Files.isDirectory(path)) path.resolve("manifest.json") else path
        // a --state dir may carry only run_results.json (the retry flow);
        // state:modified then fails loudly in the selector rather than
        // here with a bare NoSuchFileException
        if (Files.isRegularFile(mf))
          Some(graft.core.parse.ManifestJson.load(mf))
        else None
      }
      // run_results.json rides the same --state directory (dbt's retry
      // convention); absent file → None, and `result:` then fails loudly
      val results = args.flags("state").headOption.flatMap { p =>
        val path = Paths.get(p)
        val dir = if (Files.isDirectory(path)) path else path.getParent
        Option(dir).flatMap(graft.core.parse.RunResultsJson.loadIfPresent)
      }
      val bySelect =
        if (args.flags("select").nonEmpty)
          // --exclude is applied inside the select grammar here
          Selector.select(m, args.flags("select"), args.flags("exclude"),
            state, results)
        else Set.empty[String]
      val byName = args.flags("selector").headOption.map { name =>
        Selector.namedSelector(m, readFile("selectors.yml"), name)
      }.getOrElse(Set.empty)
      // lazy: the standalone exclude evaluation (a second full
      // fingerprint sweep for state: methods) only runs when something
      // actually consumes it — the named-selector subtraction or the
      // bare-exclude branch; the --select path already applied it inside
      // the grammar
      lazy val excluded =
        if (args.flags("exclude").nonEmpty)
          Selector.select(m, args.flags("exclude"), Nil, state, results)
        else Set.empty[String]
      if (args.flags("select").nonEmpty || args.flags("selector").nonEmpty)
        // --exclude narrows the named-selector set too (dbt subtracts the
        // exclusion from whatever was selected, never widens)
        bySelect ++ (if (byName.isEmpty) byName else byName -- excluded)
      else if (excluded.nonEmpty)
        // dbt: a bare --exclude applies against the FULL resource set
        // (`dbt ls --exclude x` = everything but x's selection)
        m.allResources.keySet -- excluded
      else Set.empty[String]
    }
    // any of --select/--selector/--exclude narrows the resource set
    def selectionActive: Boolean =
      args.flags("select").nonEmpty || args.flags("selector").nonEmpty ||
        args.flags("exclude").nonEmpty
    // shared test-result reporting for test/build/retry (pass/fail by
    // violations; warn = advisory severity/warn_if threshold, never
    // affects the exit code; skipped = model not built this invocation;
    // error = the test itself threw)
    def printTestResults(results: Map[String, (String, Long)],
        ran: Option[Int] = None): Unit = {
      results.toSeq.sortBy(_._1).foreach { case (tid, (st, v)) =>
        println(st match {
          case "pass" => s"PASS $tid"
          // v < 0: no violation count applies (unit tests diff rows)
          case "fail" if v >= 0 => s"FAIL $tid ($v violations)"
          case "fail" => s"FAIL $tid"
          case "warn" if v >= 0 => s"WARN $tid ($v violations)"
          case "warn" => s"WARN $tid"
          case "skipped" => s"SKIP $tid (model not built)"
          case _ => s"ERROR $tid"
        })
      }
      val nPass = results.values.count(_._1 == "pass")
      val nFail = results.values.count(_._1 == "fail")
      val nWarn = results.values.count(_._1 == "warn")
      val nErr = results.values.count(_._1 == "error")
      val nSkip = results.values.count(_._1 == "skipped")
      // errors get their own bucket: '1 fail' when the test never ran
      // misreports an execution error as a data-quality failure
      val parts = Seq(s"$nPass pass", s"$nFail fail") ++
        (if (nWarn > 0) Seq(s"$nWarn warn") else Nil) ++
        (if (nErr > 0) Seq(s"$nErr error") else Nil) ++
        (if (nSkip > 0) Seq(s"$nSkip skipped") else Nil)
      println(ran.map(n => s"== $n ran, ").getOrElse("== ") +
        parts.mkString(", ") + " ==")
    }
    def spark(): SparkSession = {
      val s = SparkSession.builder()
        .master(sys.env.getOrElse("GRAFT_MASTER", "local[*]"))
        .appName("graft").config("spark.ui.enabled", "false").getOrCreate()
      s.sparkContext.setLogLevel(logLevel)
      s
    }

    command match {
      case "run" =>
        val (cfg, m) = ProjectLoader.load(root)
        val sel = if (!selectionActive) None else Some(selection(m))
        // dbt's --threads: level-parallel model execution (independent
        // DAG subtrees run concurrently on the shared session)
        val threads = args.flags("threads").headOption.map(_.toInt).getOrElse(1)
        // dbt's --defer: refs outside the selection serve from the state
        // manifest's relations (requires --state, like state: selectors)
        val deferM = if (args.switches("defer")) {
          val p = args.flags("state").headOption.getOrElse(
            throw new IllegalArgumentException("--defer requires --state"))
          val path = Paths.get(p)
          Some(graft.core.parse.ManifestJson.load(
            if (Files.isDirectory(path)) path.resolve("manifest.json") else path))
        } else None
        // dbt's --vars '{key: value}' — an inline YAML map overriding
        // dbt_project.yml vars for this invocation
        val varOv = args.flags("vars").headOption.map { y =>
          graft.core.yaml.Yaml.parseMap(y).entries
            .map { case (k, v) => k -> v.asStr }.toMap
        }.getOrElse(Map.empty[String, String])
        val (out, status) = new Runner(spark(), m, cfg,
          warehouse(), projectRoot = Some(root),
          readCatalog = readCatalog,
          fullRefresh = args.switches("full-refresh"),
          varOverrides = varOv,
          defer = deferM).runWithStatus(sel, parallelism = threads)
        out.keys.toSeq.sorted.foreach(id => println(s"ran $id"))
        status.toSeq.sorted.collect { case (id, st) if st != "success" =>
          println(s"$st $id") }
        // dbt writes run_results.json after every invocation — it is the
        // artifact `graft retry` (default --state ./target) and the
        // result: selector methods read, so failures become re-runnable
        graft.core.parse.RunResultsJson.write(
          root.resolve("target").resolve("run_results.json"),
          status.toSeq.sorted)
        if (status.values.exists(_ == "error")) return 1

      case "split" =>
        val name = args.positional.head
        val (cfg, m) = ProjectLoader.load(root)
        val selected = selection(m)
        // --create-path is the reference spelling (cli.py:41-46)
        val target = (args.flags("create-path") ++ args.flags("target-dir"))
          .headOption.getOrElse(s"${name}_proj")
        apply(SubprojectCreator.initialize(m, cfg, name, selected, target, readFile))

      case "create-group" | "group" =>
        val name = args.positional.head
        val (cfg0, m) = ProjectLoader.load(root)
        val selected = selection(m)
        val owner = Owner(
          name = args.flags("owner-name").headOption,
          email = args.flags("owner-email").headOption,
          extra = args.flags("owner-properties").headOption
            .map(y => graft.core.yaml.Yaml.parseMap(y).entries)
            .getOrElse(Vector.empty))
        // group YAML target: explicit flag > the unique existing
        // group-defining file > models/_groups.yml; multiple existing
        // group files are ambiguous (reference `main.py:592-604`)
        val path = args.flags("group-yml-path").headOption.getOrElse {
          val existing = cfg0.modelPaths.flatMap { mp =>
            val dir = root.resolve(mp)
            if (!Files.isDirectory(dir)) Nil
            else {
              // Using: Files.walk streams hold directory handles open
              // until closed — abandoning the stream leaks FDs per
              // invocation in a long-lived embedding JVM
              scala.util.Using.resource(Files.walk(dir)) { stream =>
                val it = stream.iterator()
                val found = Vector.newBuilder[String]
                while (it.hasNext) {
                  val p = it.next()
                  val fn = p.getFileName.toString
                  if ((fn.endsWith(".yml") || fn.endsWith(".yaml")) &&
                    scala.util.Try(graft.core.yaml.Yaml
                      .parseMap(Files.readString(p)).contains("groups"))
                      .getOrElse(false))
                    found += root.relativize(p).toString
                }
                found.result()
              }
            }
          }
          existing match {
            case Vector() => "models/_groups.yml"
            case Vector(one) => one
            case many => sys.error(
              s"Unable to pick which group YAML file to use between " +
                s"${many.mkString(", ")}. Please specify --group-yml-path.")
          }
        }
        if (command == "create-group")
          apply(Grouper.addGroup(m, name, owner, selected, path))
        else {
          // group = create-group + contracts for non-private models; run
          // the project first so schemas exist (the reference reads the
          // warehouse catalog here)
          val s = spark()
          // the already-loaded (cfg0, m) pair is still current — nothing
          // edited the tree between the loads; re-walking every file
          // doubled command startup for nothing
          val runner = new Runner(s, m, cfg0,
            warehouse(), enforceAccess = false,
            projectRoot = Some(root), readCatalog = readCatalog)
          runner.run()
          apply(Commands.group(s, m, name, owner, selected, path,
            runner.viewName, p => scala.util.Try(readFile(p)).toOption))
        }

      case "seed" | "snapshot" =>
        // dbt's dedicated entry points: run ONLY the seeds (resp. only
        // the snapshot models, plus whatever upstream they need — the
        // scheduler pulls ancestors automatically)
        val (cfg, m) = ProjectLoader.load(root)
        val wanted = m.nodes.collect {
          case (id, n) if command == "seed" && n.materialized == "seed" => id
          case (id, n) if command == "snapshot" && n.materialized == "snapshot" => id
        }.toSet
        val narrowed =
          if (!selectionActive) wanted else wanted intersect selection(m)
        val out = new Runner(spark(), m, cfg,
          warehouse(), projectRoot = Some(root),
          readCatalog = readCatalog,
          fullRefresh = args.switches("full-refresh"))
          .run(Some(narrowed))
        out.keys.toSeq.sorted.foreach(id => println(s"ran $id"))

      case "source" if args.positional.headOption.contains("freshness") =>
        // dbt's `source freshness`: max(loaded_at_field) per configured
        // source vs its warn_after/error_after bounds; exit 1 on error
        val (cfg, m) = ProjectLoader.load(root)
        val runner = new Runner(spark(), m, cfg,
          warehouse(), projectRoot = Some(root), readCatalog = readCatalog)
        val results = runner.sourceFreshness()
        results.toSeq.sortBy(_._1).foreach { case (id, (status, maxTs)) =>
          println(s"${status.toUpperCase} $id" +
            maxTs.map(t => s" (max loaded_at $t)").getOrElse(""))
        }
        if (results.values.exists(v => v._1.startsWith("error") || v._1.startsWith("runtime")))
          return 1

      case "ls" | "list" =>
        // dbt-ls shape: evaluate the selection grammar and print matching
        // unique_ids (the very surface the reference shells to for A1,
        // dbt_projects.py:351-376); no selection = every resource
        val (_, m) = ProjectLoader.load(root)
        val ids = if (!selectionActive) m.allResources.keySet else selection(m)
        ids.toSeq.sorted.foreach(println)

      case "test" =>
        // dbt-test shape: materialize the DAG, run every generic test as
        // a violation query, report per-test counts, exit 1 on failures
        val (cfg, m) = ProjectLoader.load(root)
        val runner = new Runner(spark(), m, cfg,
          warehouse(), projectRoot = Some(root), readCatalog = readCatalog)
        // continue-on-error: a broken model must not crash the test
        // command before any artifact is written — its tests record
        // `skipped` below (dbt's behavior) and the model's own error
        // status rides the artifact so `graft retry` can rebuild it
        val (_, mStatus) = runner.runWithStatus()
        // --select scopes the tests (dbt: tests attached to selected
        // nodes, plus directly selected tests); the DAG still
        // materializes in full so every test's relations exist
        val tSel = if (!selectionActive) None else Some(selection(m))
        val results = runner.runTestsDetailed(tSel, mStatus,
          storeFailures = args.switches("store-failures"))
        // dbt 1.8: `dbt test` runs unit tests alongside data tests
        val uResults = runner.runUnitTests(tSel, mStatus)
        printTestResults(results ++
          uResults.map { case (uid, (st, d)) =>
            uid -> (st, -1L) })
        uResults.toSeq.sorted.collect { case (uid, ("fail" | "error", d)) =>
          println(s"  $uid: $d") }
        graft.core.parse.RunResultsJson.write(
          root.resolve("target").resolve("run_results.json"),
          (results.toSeq.map { case (tid, (st, _)) => tid -> st } ++
            uResults.toSeq.map { case (uid, (st, _)) => uid -> st } ++
            mStatus.toSeq.filter(_._2 != "success")).sorted)
        if ((results.values.map(_._1) ++ uResults.values.map(_._1))
            .exists(s => s == "fail" || s == "error") ||
          mStatus.values.exists(_ == "error")) return 1

      case "build" =>
        // dbt build: materialize the (selected) DAG AND run its data
        // tests, one command, exit 1 on any test failure. dbt interleaves
        // each node's tests right after it; on a single-session engine a
        // later model cannot alter an earlier model's already-built
        // relation, so run-then-test yields the same verdicts — tests are
        // scoped to exactly the models this invocation materialized.
        val (cfg, m) = ProjectLoader.load(root)
        val sel0 = if (!selectionActive) None else Some(selection(m))
        // a DIRECTLY selected test pulls its parent models into the build
        // (dbt builds what the test needs; without this, a test-shaped
        // selection materialized nothing and the test silently no-opped)
        val sel = sel0.map { s =>
          s ++ m.tests.collect { case (tid, tn) if s(tid) =>
            tn.dependsOn.nodes.filter(_.startsWith("model."))
          }.flatten.toSet ++
            // a directly selected UNIT test likewise pulls its model in
            // (otherwise nothing materializes and the unit test errors
            // on unresolvable non-fixtured inputs)
            m.unitTests.collect { case (uid, ut) if s(uid) =>
              ut.dependsOn.nodes.filter(_.startsWith("model."))
            }.flatten.toSet
        }
        val threads = args.flags("threads").headOption.map(_.toInt).getOrElse(1)
        val runner = new Runner(spark(), m, cfg, warehouse(),
          projectRoot = Some(root), readCatalog = readCatalog,
          fullRefresh = args.switches("full-refresh"))
        // dbt 1.8 build: a model's unit tests run BEFORE it materializes;
        // a failure records the unit test AND skips the model (nothing
        // bad reaches the warehouse) — descendants skip via the normal
        // parent cascade. Scope matches runUnitTests' rule: directly
        // selected, or attached to a selected model.
        val utRun =
          scala.collection.concurrent.TrieMap.empty[String, (String, String)]
        val utInScope: String => Boolean = uid =>
          sel0.forall(s => s(uid) ||
            m.unitTests(uid).dependsOn.nodes.exists(s))
        def unitTestGate(node: graft.core.model.ModelNode): Option[String] = {
          val uids = m.unitTests.collect {
            case (uid, ut) if ut.model == node.name && utInScope(uid) => uid
          }.toSet
          if (uids.isEmpty) None
          else {
            val res = runner.runUnitTests(Some(uids))
            res.foreach { case (uid, r) => utRun(uid) = r }
            val bad = res.collect {
              case (uid, (st, _)) if st == "fail" || st == "error" => uid }
            if (bad.isEmpty) None
            else Some(s"unit test(s) failed: ${bad.toSeq.sorted.mkString(", ")}")
          }
        }
        val (ran, status) = runner.runWithStatus(sel, parallelism = threads,
          gate = unitTestGate)
        ran.keys.toSeq.sorted.foreach(id => println(s"ran $id"))
        status.toSeq.sorted.collect { case (id, st) if st != "success" =>
          println(s"$st $id") }
        // tests scope to the ORIGINAL selection sel0, not the
        // parent-widened sel: a directly selected test runs, but its
        // parents materialize silently — dbt build --select <test> does
        // NOT run the parents' other tests. Tests whose model errored or
        // was skipped this invocation record `skipped` (not a crash on
        // the never-materialized relation).
        // status.keySet, not ran.keySet: an errored/skipped model is
        // still in scope so its tests REPORT as skipped instead of
        // silently vanishing from the artifact
        val buildScope = Some(sel0.getOrElse(status.keySet))
        val results = runner.runTestsDetailed(buildScope, status,
          storeFailures = args.switches("store-failures"))
        // unit tests already ran inside the pre-materialization gate;
        // in-scope ones whose OWN tested model was in this run but never
        // reached its gate (parent errored/skipped) record skipped. A
        // unit test in scope only through a fixture-INPUT dependency is
        // omitted, like dbt: its model wasn't part of this run, so
        // 'model not built' would be a lie (ADVICE r13).
        val uAll = m.unitTests.keySet.filter { uid =>
          val ut = m.unitTests(uid)
          val ownModel = m.nodes.collectFirst {
            case (id, n) if id.startsWith("model.") && n.name == ut.model => id }
          utInScope(uid) && ownModel.exists(status.contains)
        }
        val uResults: Map[String, (String, String)] = utRun.toMap ++
          (uAll -- utRun.keySet).map(_ -> ("skipped", "model not built"))
        printTestResults(results ++
          uResults.map { case (uid, (st, _)) => uid -> (st, -1L) },
          ran = Some(ran.size))
        uResults.toSeq.sorted.collect { case (uid, ("fail" | "error", d)) =>
          println(s"  $uid: $d") }
        val nBad = (results.values.map(_._1) ++ uResults.values.map(_._1))
          .count(s => s == "fail" || s == "error")
        graft.core.parse.RunResultsJson.write(
          root.resolve("target").resolve("run_results.json"),
          (status.toSeq ++
            results.toSeq.map { case (tid, (st, _)) => tid -> st } ++
            uResults.toSeq.map { case (uid, (st, _)) => uid -> st }).sorted)
        if (nBad > 0 || status.values.exists(_ == "error")) return 1

      case "compile" =>
        // dbt compile: render every selected model's SQL — Jinja
        // expanded, ref()/source() resolved to the relation names a run
        // would use — into target/compiled/<project>/<model path>,
        // executing NOTHING. Slim-CI tooling and humans read these files;
        // the rendering is byte-identical to what `graft run` executes
        // (same renderSql). is_incremental() renders false (dbt's
        // empty-state behavior); python models have no SQL form and are
        // listed-skipped loudly rather than silently omitted.
        val (cfg, m) = ProjectLoader.load(root)
        val sel = if (!selectionActive) None else Some(selection(m))
        val runner = new Runner(spark(), m, cfg, warehouse(),
          enforceAccess = false, projectRoot = Some(root),
          readCatalog = readCatalog)
        val outDir = root.resolve("target").resolve("compiled")
          .resolve(m.projectName)
        var nWritten = 0
        m.nodes.toSeq.sortBy(_._1).foreach { case (id, node) =>
          if (sel.forall(_(id)) && node.packageName == m.projectName) {
            if (node.language == "python")
              println(s"skipped $id (python model, no compiled SQL form)")
            else if (node.materialized == "seed")
              () // seeds have no SQL to compile (dbt skips them too)
            else {
              val sql = runner.renderSql(node, isIncremental = false)
              val p = outDir.resolve(node.filePath)
              Files.createDirectories(p.getParent)
              Files.writeString(p, sql)
              nWritten += 1
              println(s"compiled $id")
            }
          }
        }
        println(s"wrote $nWritten compiled models under " +
          s"${root.resolve("target").resolve("compiled")}")

      case "retry" =>
        // dbt retry: re-select the nodes the previous invocation left in
        // error/fail/skipped, from the run_results artifact (--state
        // dir; defaults to ./target, where `docs generate` and dbt
        // itself write artifacts). Upstream of the selection
        // re-materializes as in any selected run (idempotent views /
        // incremental merges) so refs resolve.
        val stateDir = args.flags("state").headOption
          .map(Paths.get(_)).getOrElse(root.resolve("target"))
        val dir = if (Files.isDirectory(stateDir)) stateDir
          else Option(stateDir.getParent).getOrElse(root)
        val rs = graft.core.parse.RunResultsJson.loadIfPresent(dir)
          .getOrElse(throw new IllegalArgumentException(
            s"retry needs run_results.json under $dir " +
              "(pass --state <dir> to point at a previous run's artifacts)"))
        val (cfg, m) = ProjectLoader.load(root)
        val sel = Selector.select(m,
          Seq("result:error", "result:fail", "result:skipped"),
          Nil, None, Some(rs))
        if (sel.isEmpty) println("nothing to retry")
        else {
          val runner = new Runner(spark(), m, cfg, warehouse(),
            projectRoot = Some(root), readCatalog = readCatalog)
          // status-tracked like run/build — a retry that fails again must
          // refresh the artifact with its OWN statuses, and a fully
          // successful retry must clear the stale error/skipped entries
          // (dbt retry rewrites run_results.json; without this a second
          // `graft retry` re-ran already-fixed nodes forever)
          //
          // Selected TESTS pull their parent models into the run: a fresh
          // retry process has no session views, so a failed test whose
          // model previously SUCCEEDED would otherwise error on the
          // missing relation instead of re-running. Re-materializing a
          // healthy parent is idempotent (views are free; tables/
          // incrementals rebuild to the same state) — dbt reads the
          // existing warehouse table instead, which a session-view engine
          // doesn't have across processes. Parents whose table IS in the
          // warehouse (--read-catalog) are served hook-free via
          // runWithStatus(reuseHealthy=...) — dbt parity: a succeeded
          // node's hooks fired once, in the run that built it. RESIDUAL
          // DIVERGENCE, view parents only: a healthy view-materialized
          // parent re-renders (its session view died with the previous
          // process), which re-fires its hooks; idempotent hooks — the
          // dbt best practice — are unaffected.
          val selW = sel ++
            m.tests.collect { case (tid, tn) if sel(tid) =>
              tn.dependsOn.nodes.filter(_.startsWith("model.")) }.flatten ++
            m.unitTests.collect { case (uid, ut) if sel(uid) =>
              ut.dependsOn.nodes.filter(_.startsWith("model.")) }.flatten
          // healthy = pulled in only for ref resolution AND previously
          // succeeded; the runner reuses those whose table exists
          val healthy = (selW -- sel).filter(id =>
            rs.get(id).contains("success"))
          val (ran, status) = runner.runWithStatus(Some(selW),
            reuseHealthy = healthy)
          ran.keys.toSeq.sorted.foreach(id => println(s"ran $id"))
          status.toSeq.sorted.collect { case (id, st) if st != "success" =>
            println(s"$st $id") }
          // failed/skipped TESTS selected by result: re-run too (dbt
          // retry covers test nodes); their models either just re-ran or
          // carry their previous state in the session/warehouse
          val testSel = sel.filter(m.tests.contains)
          val tResults =
            if (testSel.isEmpty) Map.empty[String, (String, Long)]
            else runner.runTestsDetailed(Some(testSel), status,
              storeFailures = args.switches("store-failures"))
          // failed UNIT tests selected by result: re-run as well (before
          // this, retry silently dropped them — exit 0 with the stale
          // 'fail' left in the artifact forever)
          val utSel = sel.filter(m.unitTests.contains)
          val uResults =
            if (utSel.isEmpty) Map.empty[String, (String, String)]
            else runner.runUnitTests(Some(utSel), status)
          if (tResults.nonEmpty || uResults.nonEmpty) {
            printTestResults(tResults ++
              uResults.map { case (uid, (st, _)) => uid -> (st, -1L) })
            uResults.toSeq.sorted.collect {
              case (uid, ("fail" | "error", d)) => println(s"  $uid: $d") }
          }
          // merge this retry's outcomes over the previous artifact: nodes
          // not retried keep their old status, retried nodes record what
          // just happened
          val merged = (rs ++ status ++
            tResults.map { case (tid, (st, _)) => tid -> st } ++
            uResults.map { case (uid, (st, _)) => uid -> st }).toSeq.sorted
          graft.core.parse.RunResultsJson.write(
            root.resolve("target").resolve("run_results.json"), merged)
          if (status.values.exists(_ == "error") ||
            (tResults.values.map(_._1) ++ uResults.values.map(_._1))
              .exists(r => r == "fail" || r == "error"))
            return 1
        }

      case "contract" | "add-contract" =>
        val (cfg, m) = ProjectLoader.load(root)
        val selected = selection(m)
        def contractable = selected.toSeq.sorted.flatMap(m.nodes.get)
          .filter(_.uniqueId.startsWith("model."))
          .collect { case node: graft.core.model.ModelNode
            // --public-only contracts only public-access models
            // (`main.py:275,292-295`)
            if !args.switches("public-only") ||
              node.access == graft.core.model.AccessType.Public => node }
        // --read-catalog with a dbt-core target/catalog.json present:
        // generate contracts from the cached warehouse crawl, no Spark run
        // (`dbt_projects.py:279-290`). Otherwise materialize with Spark
        // and freeze the produced schemas.
        val catalogJson = root.resolve("target").resolve("catalog.json")
        val cs =
          if (readCatalog && Files.exists(catalogJson)) {
            val catalog = graft.core.parse.CatalogJson.load(catalogJson)
            contractable.map { node =>
              val entry = catalog.getOrElse(node.uniqueId,
                graft.core.parse.CatalogJson.Entry(node.uniqueId, Vector.empty))
              Contractor.generateContractFromCatalog(node, entry)
            }
          } else {
            val s = spark()
            val runner = new Runner(s, m, cfg,
              warehouse(), enforceAccess = false,
              projectRoot = Some(root), readCatalog = readCatalog)
            runner.run()
            contractable.map(node =>
              Contractor.generateContract(s, node, runner.viewName(node.name)))
          }
        apply(ChangeSet(cs.toVector))

      case "clone" =>
        // dbt clone: copy the --state manifest's relations for the
        // selected nodes into this project's warehouse WITHOUT
        // recomputing them. Persistent materializations only (a view
        // re-renders for free on its next run, exactly dbt's behavior of
        // recreating views from definitions); each clone lands at the
        // model's own table path + session view, and target/manifest.json
        // records the clone views as relation_name — so a subsequent
        // `run --defer --state <project>/target` serves unselected refs
        // from the clones, and `run --read-catalog` reuses them as
        // already-materialized catalog tables.
        val (cfg, m) = ProjectLoader.load(root)
        val stateP = args.flags("state").headOption.map(Paths.get(_))
          .getOrElse(throw new IllegalArgumentException("clone requires --state"))
        val stateM = graft.core.parse.ManifestJson.load(
          if (Files.isDirectory(stateP)) stateP.resolve("manifest.json")
          else stateP)
        val sel = if (selectionActive) selection(m) else m.nodes.keySet
        val persistent = Set("table", "incremental", "snapshot", "seed")
        val s = spark()
        // clones ALWAYS land in the durable project-local catalog — a
        // throwaway temp warehouse would defeat clone's purpose (the
        // artifact must survive this process so a later `run --defer`
        // or `run --read-catalog` can serve from it)
        val cloneWh = Files.createDirectories(
          root.resolve(".graft").resolve("warehouse"))
        val runner = new Runner(s, m, cfg, cloneWh,
          enforceAccess = false, projectRoot = Some(root),
          readCatalog = readCatalog)
        val cloned = sel.toSeq.sorted.flatMap { id =>
          for {
            node <- m.nodes.get(id)
            if persistent(node.materialized)
            rel <- stateM.nodes.get(id).flatMap(_.relationName)
            // a state relation may not resolve in THIS session (a
            // dbt-core manifest's db.schema.table against a local
            // session, or a dead view name): SKIP it loudly and keep
            // cloning the rest — a mid-run crash here would leave
            // partial warehouse tables with no manifest at all
            df <- scala.util.Try(s.table(rel)) match {
              case scala.util.Success(df) => Some(df)
              case scala.util.Failure(e) =>
                System.err.println(
                  s"clone: skipping $id — state relation '$rel' is not " +
                    s"resolvable here (${e.getMessage.linesIterator.next()})")
                None
            }
          } yield {
            runner.cloneRelation(node, df)
            println(s"cloned $id from $rel")
            id
          }
        }.toSet
        val target = Files.createDirectories(root.resolve("target"))
        val outM = m.copy(nodes = m.nodes.map { case (id, n) =>
          id -> (if (cloned(id))
            n.copy(relationName = Some(runner.viewName(n.name)))
          else n)
        })
        graft.core.parse.ManifestJsonWriter.write(
          outM, target.resolve("manifest.json"))
        println(s"wrote ${target.resolve("manifest.json")}")

      case "docs" if args.positional.headOption.contains("generate") =>
        // dbt docs generate: write target/manifest.json (+ catalog.json).
        // The manifest half needs no warehouse; the catalog half
        // materializes (or --read-catalog reuses) the project like the
        // contract flow, then crawls the produced schemas. --no-compile
        // (dbt's own flag) skips the catalog half.
        val (cfg, m) = ProjectLoader.load(root)
        val target = root.resolve("target")
        graft.core.parse.ManifestJsonWriter.write(
          m, target.resolve("manifest.json"))
        println(s"wrote ${target.resolve("manifest.json")}")
        if (!args.switches("no-compile")) {
          val s = spark()
          val runner = new Runner(s, m, cfg, warehouse(),
            enforceAccess = false,
            projectRoot = Some(root), readCatalog = readCatalog)
          runner.run()
          val entries = m.nodes.values.toSeq.sortBy(_.uniqueId).map { node =>
            (node.uniqueId, runner.viewName(node.name),
              s.table(runner.viewName(node.name)).schema)
          }
          graft.core.parse.CatalogJsonWriter.write(
            entries, target.resolve("catalog.json"))
          println(s"wrote ${target.resolve("catalog.json")}")
        }

      case "version" | "add-version" | "bump-version" =>
        val (_, m) = ProjectLoader.load(root)
        // reference selects with --select; a bare positional model name is
        // accepted as a convenience. A bare --exclude is an active
        // selection here too (all-minus-exclusion), consistent with every
        // other command.
        val names: Seq[String] =
          if (selectionActive)
            selection(m).toSeq.sorted.flatMap(m.nodes.get)
              .filter(_.uniqueId.startsWith("model.")).map(_.name)
          else args.positional
        // default behavior is Prerelease (keep latest_version), matching
        // `main.py:469-473`; --latest / --increment override
        val behavior =
          if (args.switches("latest")) Versioner.Behavior.Latest
          else if (args.switches("increment")) Versioner.Behavior.Increment
          else Versioner.Behavior.Prerelease
        val definedIn = args.flags("defined-in").headOption
        names.foreach { modelName =>
          val node = m.nodes.values.find(_.name == modelName).getOrElse(
            sys.error(s"model $modelName not found"))
          val entry = node.patchPath.map { pp =>
            graft.core.yaml.Yaml.parseMap(readFile(pp)).get("models").collect {
              case graft.core.yaml.YList(ms) => ms.collectFirst {
                case e: graft.core.yaml.YMap if e.get("name").exists(_.asStr == modelName) => e
              }
            }.flatten.getOrElse(graft.core.yaml.YMap.empty)
          }.getOrElse(graft.core.yaml.YMap.empty)
          val cs = command match {
            case "add-version" =>
              Versioner.addVersion(node, entry, definedIn)
            case "bump-version" =>
              Versioner.bumpVersion(node, entry, behavior,
                Versioner.latestPath(node, entry), definedIn)
            case _ =>
              Versioner.version(node, entry, behavior, definedIn)
          }
          apply(cs)
        }

      case "connect" =>
        val explicit = args.flags("project-paths").map(Paths.get(_))
        val projectsDir = args.flags("projects-dir").headOption.map(Paths.get(_))
        require(explicit.isEmpty || projectsDir.isEmpty,
          "Cannot specify both --project-paths and --projects-dir")
        // --projects-dir discovers every **/dbt_project.yml, skipping
        // installed-package trees (`main.py:153-168`); --exclude-projects
        // drops discovered projects by name
        val discovered = projectsDir.toVector.flatMap { dir =>
          scala.util.Using.resource(Files.walk(dir)) { stream =>
            val it = stream.iterator()
            val found = Vector.newBuilder[Path]
            while (it.hasNext) {
              val p = it.next()
              val parts = (0 until p.getNameCount).map(p.getName(_).toString)
              if (p.getFileName.toString == "dbt_project.yml" &&
                !parts.contains("dbt_packages") && !parts.contains("site-packages"))
                found += p.getParent
            }
            found.result()
          }
        }
        val excluded = args.flags("exclude-projects").toSet
        val paths = if (explicit.nonEmpty) explicit else discovered
        val loaded0 = paths.map(p => p -> ProjectLoader.load(p)._2)
        val loaded = loaded0.filterNot { case (_, m) => excluded(m.projectName) }
        require(loaded.size >= 2,
          "connect needs at least two projects (--project-paths P1 P2 or --projects-dir D)")
        val byName = loaded.map { case (p, m) => m.projectName -> p }.toMap
        val plans = Commands.connectPlans(loaded.map(_._2),
          // A installs B iff A's manifest carries resources owned by B —
          // the view `dbt deps` + parse gives the reference
          // (`installed_packages`, dbt_projects.py:150-170)
          installs = (aName, bName) => loaded.map(_._2)
            .find(_.projectName == aName)
            .exists(_.nodes.values.exists(_.packageName == bName)),
          contractData = _ => None,
          readFile = (proj, f) => Files.readString(byName(proj).resolve(f)))
        plans.toSeq.sortBy(_._1).foreach { case (proj, cs) =>
          println(s"-- $proj --")
          new ChangeSetProcessor(byName(proj), dryRun = dryRun, log = println)
            .process(Seq(cs))
        }

      case "run-operation" =>
        // dbt run-operation: invoke a project macro by name with --args
        // (an inline YAML map, parsed exactly like --vars) and execute
        // whatever SQL it renders to. The macro plumbing is the hook
        // executor (Runner.runOperation), so ref()/source()/var() resolve
        // as they do in hooks.
        val name = args.positional.headOption.getOrElse(
          throw new IllegalArgumentException(
            "run-operation requires a macro name"))
        val (cfg, m) = ProjectLoader.load(root)
        val macroArgs = args.flags("args").headOption.map { y =>
          graft.core.yaml.Yaml.parseMap(y).entries
            .map { case (k, v) => k -> v.asStr }.toMap
        }.getOrElse(Map.empty[String, String])
        val varOv = args.flags("vars").headOption.map { y =>
          graft.core.yaml.Yaml.parseMap(y).entries
            .map { case (k, v) => k -> v.asStr }.toMap
        }.getOrElse(Map.empty[String, String])
        val runner = new Runner(spark(), m, cfg, warehouse(),
          projectRoot = Some(root), readCatalog = readCatalog,
          varOverrides = varOv)
        runner.runOperation(name, macroArgs)
        println(s"ran operation $name")

      case "show" =>
        // dbt show: compile the selected model(s), execute the rendered
        // SQL, and print the first --limit rows — a preview that leaves
        // NOTHING behind (no warehouse table, no session view for the
        // shown model). Upstream models materialize first (a session
        // engine has no standing warehouse to read them from), into the
        // usual throwaway temp warehouse unless --read-catalog.
        val (cfg, m) = ProjectLoader.load(root)
        val limit = args.flags("limit").headOption.map(_.toInt).getOrElse(5)
        if (!selectionActive)
          throw new IllegalArgumentException("show requires --select")
        val models = selection(m).toSeq.sorted.flatMap(m.nodes.get)
          .filter(n => n.uniqueId.startsWith("model."))
        if (models.isEmpty) {
          System.err.println("show: selection matches no models")
          return 1
        }
        val s = spark()
        val runner = new Runner(s, m, cfg, warehouse(),
          enforceAccess = false, projectRoot = Some(root),
          readCatalog = readCatalog)
        // ancestors of the WHOLE selection, materialized once up front —
        // per-model runner.run re-ran shared upstream tables once per
        // selected model (idempotent but wasteful; ADVICE r14). Each
        // model's own id stays OUT unless another selected model depends
        // on it (show previews, never materializes, the shown model).
        val allUp = models.filter(_.language != "python").map(node =>
          Selector.select(m, Seq(s"+${node.name}"), Nil, None) -
            node.uniqueId).foldLeft(Set.empty[String])(_ ++ _)
        if (allUp.nonEmpty) runner.run(Some(allUp))
        models.foreach { node =>
          if (node.language == "python")
            println(s"skipped ${node.uniqueId} (python model, no SQL preview)")
          else {
            val df = s.sql(runner.renderSql(node, isIncremental = false))
              .limit(limit)
            val rows = df.collect()
            println(s"-- ${node.uniqueId}")
            println(df.columns.mkString(" | "))
            rows.foreach(r => println((0 until r.length).map(i =>
              if (r.isNullAt(i)) "NULL" else r.get(i).toString)
              .mkString(" | ")))
          }
        }

      case other =>
        println(
          s"""unknown command: $other
             |usage: graft {run|build|retry|test|compile|show|run-operation|ls|seed|snapshot|clone|docs|split|create-group|group|contract|version|connect} [options]
             |""".stripMargin)
        return if (other == "help") 0 else 1
    }
    0
  }

}
