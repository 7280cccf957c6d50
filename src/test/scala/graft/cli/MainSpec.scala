package graft.cli

import graft.core.parse.ProjectLoader
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** The CLI surface: commands parse, dry-run plans without writing, and
  * execution edits the project like the underlying planners. */
class MainSpec extends AnyFunSuite {

  private def writeProject(files: Map[String, String]): Path = {
    val root = Files.createTempDirectory("graft_cli")
    files.foreach { case (rel, text) =>
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, text)
    }
    root
  }

  private val project = Map(
    "dbt_project.yml" -> "name: shop\n",
    "models/stg.sql" -> "select 1 as id",
    "models/mart.sql" -> "select * from {{ ref('stg') }}")

  test("split: dry-run leaves the tree untouched; execution splits it") {
    val root = writeProject(project)
    Main.main(Array("split", "mart_proj", "--select", "mart",
      "--project-dir", root.toString, "--target-dir", "marts", "--dry-run"))
    assert(Files.exists(root.resolve("models/mart.sql")))
    assert(!Files.exists(root.resolve("marts")))

    Main.main(Array("split", "mart_proj", "--select", "mart",
      "--project-dir", root.toString, "--target-dir", "marts"))
    assert(!Files.exists(root.resolve("models/mart.sql")))
    assert(Files.readString(root.resolve("marts/models/mart.sql"))
      .contains("{{ ref('shop', 'stg') }}"))
    val (_, sub) = ProjectLoader.load(root.resolve("marts"))
    assert(sub.projectName == "mart_proj")
  }

  test("test command runs generic tests and reports pass counts") {
    val root = writeProject(project ++ Map(
      "models/_props.yml" ->
        """version: 2
          |models:
          |  - name: stg
          |    columns:
          |      - name: id
          |        tests:
          |          - not_null
          |          - unique
          |""".stripMargin))
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.main(Array("test", "--project-dir", root.toString))
    }
    val printed = out.toString
    assert(printed.contains("PASS test.shop.not_null_stg_id"), printed)
    assert(printed.contains("PASS test.shop.unique_stg_id"), printed)
    assert(printed.contains("== 2 pass, 0 fail =="), printed)
  }

  test("test/build: severity warn reports WARN, exits 0, records warn in run_results") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: shop\n",
      "models/stg.sql" -> "select * from values (1), (null) as t(id)",
      "models/_props.yml" ->
        """version: 2
          |models:
          |  - name: stg
          |    columns:
          |      - name: id
          |        tests:
          |          - not_null:
          |              config:
          |                severity: warn
          |""".stripMargin))
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out)) {
      Main.run(Array("test", "--project-dir", root.toString))
    }
    val printed = out.toString
    assert(code == 0, s"exit $code\n$printed")
    assert(printed.contains("WARN test.shop.not_null_stg_id (1 violations)"),
      printed)
    assert(printed.contains("1 warn"), printed)
    val rr = Files.readString(root.resolve("target/run_results.json"))
    assert(rr.contains("warn"), rr)
    // build treats warn exactly like pass for the exit code
    val code2 = Console.withOut(new java.io.PrintStream(
      new java.io.ByteArrayOutputStream())) {
      Main.run(Array("build", "--project-dir", root.toString))
    }
    assert(code2 == 0)
  }

  test("test --store-failures persists violating rows under .graft/warehouse") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: shop\n",
      "models/stg.sql" -> "select * from values (1), (1), (2) as t(id)",
      "models/_props.yml" ->
        """version: 2
          |models:
          |  - name: stg
          |    columns:
          |      - name: id
          |        tests:
          |          - unique
          |""".stripMargin))
    val code = Console.withOut(new java.io.PrintStream(
      new java.io.ByteArrayOutputStream())) {
      Main.run(Array("test", "--project-dir", root.toString,
        "--store-failures", "--read-catalog"))
    }
    assert(code == 1) // the unique test still fails
    // audit paths carry a uniqueId-hash suffix (lossy-sanitization guard)
    val auditDir = root.resolve(".graft/warehouse/dbt_test__audit")
    val audit = Files.list(auditDir).iterator().asScala
      .find(_.getFileName.toString.startsWith("unique_stg_id"))
      .getOrElse(fail(s"no unique_stg_id audit under $auditDir"))
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[*]").getOrCreate()
    val rows = s.read.parquet(audit.toString).collect()
    assert(rows.length == 1 && rows.head.getInt(0) == 1, rows.toSeq)
  }

  test("retry --read-catalog serves a healthy table parent from the warehouse untouched") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: rt9\n",
      "models/base.sql" ->
        "{{ config(materialized='table') }}\nselect 3 as id",
      "models/_props.yml" ->
        """version: 2
          |models:
          |  - name: base
          |    columns:
          |      - name: id
          |        tests:
          |          - accepted_values:
          |              values: [1, 2]
          |""".stripMargin))
    val devnull = new java.io.PrintStream(new java.io.ByteArrayOutputStream())
    // build: base materializes into .graft/warehouse, its test FAILS
    val code = Console.withOut(devnull) {
      Main.run(Array("build", "--project-dir", root.toString, "--read-catalog"))
    }
    assert(code == 1)
    val tableDir = root.resolve(".graft/warehouse/base")
    assert(Files.exists(tableDir), tableDir.toString)
    def tableState(): Seq[(String, Long)] =
      Files.list(tableDir).iterator().asScala.toSeq
        .map(p => p.getFileName.toString ->
          Files.getLastModifiedTime(p).toMillis).sortBy(_._1)
    val before = tableState()
    // retry: the failed test re-runs (still fails); base is pulled in only
    // as a healthy parent and must be SERVED from its table, not rebuilt
    val code2 = Console.withOut(devnull) {
      Main.run(Array("retry", "--project-dir", root.toString, "--read-catalog"))
    }
    assert(code2 == 1) // data unchanged, test still fails
    assert(tableState() == before,
      s"healthy parent's warehouse table was rewritten on retry:\n" +
        s"before=$before\nafter=${tableState()}")
  }

  test("read-catalog: flag and both env-var spellings agree (cli.py:98-104)") {
    assert(Main.readCatalogFrom(flag = true, Map.empty))
    assert(Main.readCatalogFrom(flag = false, Map("GRAFT_READ_CATALOG" -> "1")))
    assert(Main.readCatalogFrom(flag = false,
      Map("DBT_MESHIFY_READ_CATALOG" -> "1")))
    assert(!Main.readCatalogFrom(flag = false, Map("UNRELATED" -> "1")))
    // click's is_flag+envvar coerces the VALUE: falsy strings disable
    for (off <- Seq("", "0", "false", "no", "off", "False", " 0 "))
      assert(!Main.readCatalogFrom(flag = false,
        Map("DBT_MESHIFY_READ_CATALOG" -> off)), s"'$off' should disable")
    assert(Main.readCatalogFrom(flag = false,
      Map("GRAFT_READ_CATALOG" -> "true")))
    // the explicit flag still wins over a falsy env value
    assert(Main.readCatalogFrom(flag = true,
      Map("DBT_MESHIFY_READ_CATALOG" -> "0")))
  }

  test("run-operation invokes a macro with --args; unknown macro fails loudly") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: shop\n",
      "macros/mk.sql" ->
        ("{% macro mk(nm) %}" +
          "create or replace temporary view {{ nm }} as select 42 as answer" +
          "{% endmacro %}")))
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out)) {
      Main.run(Array("run-operation", "mk", "--args", "nm: cli_op_out",
        "--project-dir", root.toString))
    }
    assert(code == 0, out.toString)
    assert(out.toString.contains("ran operation mk"), out.toString)
    val s = org.apache.spark.sql.SparkSession.builder()
      .master("local[*]").getOrCreate()
    assert(s.table("cli_op_out").collect().map(_.getInt(0)).toSeq == Seq(42))
    intercept[IllegalArgumentException] {
      Main.run(Array("run-operation", "definitely_missing",
        "--project-dir", root.toString))
    }
  }

  test("show compiles+previews with --limit and leaves no table behind") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: shop\n",
      "models/stg.sql" ->
        "{{ config(materialized='table') }}\nselect * from values (1), (2), (3) as t(id)",
      "models/mart.sql" ->
        "{{ config(materialized='table') }}\nselect id from {{ ref('stg') }} order by id"))
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out)) {
      Main.run(Array("show", "--select", "mart", "--limit", "2",
        "--project-dir", root.toString, "--read-catalog"))
    }
    val printed = out.toString
    assert(code == 0, printed)
    assert(printed.contains("-- model.shop.mart"), printed)
    // header + exactly --limit data rows
    val lines = printed.linesIterator.toVector
      .dropWhile(_ != "-- model.shop.mart").drop(1)
    assert(lines.headOption.contains("id"), printed)
    assert(lines.slice(1, 4).count(_.trim.nonEmpty) == 2, printed)
    // upstream materialized (a table model needs its parents), but the
    // PREVIEWED model itself never reached the warehouse
    assert(Files.exists(root.resolve(".graft/warehouse/stg")))
    assert(!Files.exists(root.resolve(".graft/warehouse/mart")))
  }

  test("create-group applies access patches") {
    val root = writeProject(project)
    Main.main(Array("create-group", "core", "--select", "stg", "mart",
      "--owner-name", "team", "--project-dir", root.toString))
    val (_, m) = ProjectLoader.load(root)
    assert(m.nodes("model.shop.mart").group.contains("core"))
    assert(m.nodes("model.shop.stg").group.contains("core"))
    assert(m.groups.values.exists(_.name == "core"))
  }

  test("create-group: owner email/properties and existing-group-file resolution") {
    val root = writeProject(project ++ Map(
      "models/groups/_teams.yml" -> "groups: []\n"))
    Main.main(Array("create-group", "core", "--select", "stg",
      "--owner-name", "Tony Legitman", "--owner-email", "tony@notacop.org",
      "--owner-properties", "slack: '#core-team'",
      "--project-dir", root.toString))
    // the unique existing group-defining file is picked over the default
    assert(!Files.exists(root.resolve("models/_groups.yml")))
    val yml = Files.readString(root.resolve("models/groups/_teams.yml"))
    assert(yml.contains("name: Tony Legitman"), yml)
    assert(yml.contains("tony@notacop.org"), yml)
    assert(yml.contains("slack:"), yml)
  }

  test("version bumps a model from the CLI") {
    val root = writeProject(project)
    Main.main(Array("version", "mart", "--latest",
      "--project-dir", root.toString))
    assert(Files.exists(root.resolve("models/mart_v1.sql")))
    assert(Files.exists(root.resolve("models/mart_v2.sql")))
  }

  test("add-version then bump-version --defined-in, prerelease by default") {
    val root = writeProject(project)
    Main.main(Array("add-version", "--select", "mart",
      "--project-dir", root.toString))
    assert(Files.exists(root.resolve("models/mart_v1.sql")))
    Main.main(Array("bump-version", "mart", "--defined-in", "daves_model",
      "--project-dir", root.toString))
    assert(Files.exists(root.resolve("models/daves_model.sql")))
    val yml = Files.readString(root.resolve("models/_models.yml"))
    // default behavior = prerelease: latest_version stays 1
    assert(yml.contains("latest_version: 1"), yml)
    assert(yml.contains("defined_in: daves_model"), yml)
  }

  test("contract generates enforced contracts from materialized schemas") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: shop\n",
      "seeds/raw.csv" -> "id,v\n1,x\n",
      "models/stg.sql" -> "select id, v from {{ ref('raw') }}"))
    // spelled exactly as the reference namespaces it: `operation add-contract`
    Main.main(Array("operation", "add-contract", "--select", "stg",
      "--project-dir", root.toString))
    val (_, m) = ProjectLoader.load(root)
    val stg = m.nodes("model.shop.stg")
    assert(stg.contractEnforced)
    assert(stg.contract.exists(_.fieldNames.toSeq == Seq("id", "v")))
  }

  test("contract --read-catalog ingests a dbt-core target/catalog.json, no Spark run") {
    // VERDICT r9 missing #1: generate contracts for a warehouse graft
    // never materialized, from the dbt docs-generate artifact
    // (`dbt_projects.py:279-290`). The model body refs a table that does
    // not exist — the command must succeed WITHOUT executing the DAG.
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: shop\n",
      "models/stg.sql" -> "select * from warehouse_only_table",
      "target/catalog.json" ->
        """{"metadata": {"dbt_version": "1.5.2"},
          |"nodes": {"model.shop.stg": {
          |  "metadata": {"type": "BASE TABLE", "schema": "main", "name": "stg"},
          |  "columns": {
          |    "ID": {"type": "INTEGER", "index": 1, "name": "id"},
          |    "amount": {"type": "DECIMAL(16,2)", "index": 2, "name": "amount"}},
          |  "stats": {}, "unique_id": "model.shop.stg"}},
          |"sources": {}}""".stripMargin))
    Main.main(Array("contract", "--select", "stg", "--read-catalog",
      "--project-dir", root.toString))
    val (_, m) = ProjectLoader.load(root)
    val stg = m.nodes("model.shop.stg")
    assert(stg.contractEnforced)
    assert(stg.contract.exists(_.fieldNames.toSeq == Seq("id", "amount")))
    val yml = Files.readString(root.resolve("models/_models.yml"))
    assert(yml.contains("data_type: \"decimal(16,2)\""), yml)
  }

  test("bare `contract` (no operation prefix) still works") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: shop\n",
      "seeds/raw.csv" -> "id,v\n1,x\n",
      "models/stg.sql" -> "select id, v from {{ ref('raw') }}"))
    Main.main(Array("contract", "--select", "stg",
      "--project-dir", root.toString))
    val (_, m) = ProjectLoader.load(root)
    assert(m.nodes("model.shop.stg").contractEnforced)
  }

  test("--version prints the version string and exits before any command") {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.main(Array("--version"))
    }
    assert(out.toString.trim == "0.5.5")
    // position-independent, like a click group flag
    val out2 = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out2)) {
      Main.main(Array("split", "x", "--version"))
    }
    assert(out2.toString.trim == "0.5.5")
  }

  test("--project-path is accepted as the reference spelling of --project-dir") {
    val root = writeProject(project)
    // exact reference invocation shape: meshify create-group ... --project-path P
    Main.main(Array("create-group", "core", "--select", "mart",
      "--owner-name", "team", "--project-path", root.toString))
    val (_, m) = ProjectLoader.load(root)
    assert(m.nodes("model.shop.mart").group.contains("core"))
  }

  test("split accepts --create-path (reference spelling of --target-dir)") {
    val root = writeProject(project)
    Main.main(Array("split", "mart_proj", "--select", "mart",
      "--project-path", root.toString, "--create-path", "marts"))
    assert(Files.readString(root.resolve("marts/models/mart.sql"))
      .contains("{{ ref('shop', 'stg') }}"))
  }

  test("contract --public-only contracts only public-access models") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: shop\n",
      "seeds/raw.csv" -> "id,v\n1,x\n",
      "models/pub.sql" -> "select id from {{ ref('raw') }}",
      "models/priv.sql" -> "select v from {{ ref('raw') }}",
      "models/_models.yml" ->
        """version: 2
          |models:
          |  - name: pub
          |    access: public
          |  - name: priv
          |    access: protected
          |""".stripMargin))
    Main.main(Array("operation", "add-contract", "--select", "pub", "priv",
      "--public-only", "--project-path", root.toString))
    val (_, m) = ProjectLoader.load(root)
    assert(m.nodes("model.shop.pub").contractEnforced)
    assert(!m.nodes("model.shop.priv").contractEnforced)
  }

  test("--read-catalog reuses the materialized warehouse on a second run") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: shop\n",
      "seeds/raw.csv" -> "id,v\n1,x\n",
      "models/stg.sql" ->
        "{{ config(materialized='table') }}\nselect id, v from {{ ref('raw') }}"))
    Main.main(Array("contract", "--select", "stg", "--read-catalog",
      "--project-path", root.toString))
    val tableDir = root.resolve(".graft/warehouse/stg")
    assert(Files.exists(tableDir), "persistent warehouse under the project")
    val stamps = Files.list(tableDir).toArray.map(_.toString).sorted
      .map(p => p -> Files.getLastModifiedTime(java.nio.file.Paths.get(p)))
    Main.main(Array("contract", "--select", "stg", "--read-catalog",
      "--project-path", root.toString))
    val stamps2 = Files.list(tableDir).toArray.map(_.toString).sorted
      .map(p => p -> Files.getLastModifiedTime(java.nio.file.Paths.get(p)))
    assert(stamps.toSeq == stamps2.toSeq,
      "second --read-catalog run must not rewrite the materialized table")
  }

  test("run executes the DAG from the CLI") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: shop\n",
      "seeds/raw.csv" -> "id\n1\n2\n",
      "models/stg.sql" -> "select * from {{ ref('raw') }}"))
    Main.main(Array("run", "--project-dir", root.toString))
    // the session now holds the published view
    val s = org.apache.spark.sql.SparkSession.active
    assert(s.table("shop__stg").count() == 2)
  }

  test("--select state:modified --state picks only the changed model") {
    val root = writeProject(project)
    // store the pre-change state as a dbt-core manifest.json (the --state
    // convention: a directory containing the artifact)
    val (_, before) = ProjectLoader.load(root)
    val stateDir = Files.createTempDirectory("graft_state")
    Files.writeString(stateDir.resolve("manifest.json"),
      graft.core.parse.ManifestJsonSpec.emit(before))
    // mart changes; stg does not
    Files.writeString(root.resolve("models/mart.sql"),
      "select id from {{ ref('stg') }}")
    Main.main(Array("version",
      "--select", "state:modified",
      "--state", stateDir.toString,
      "--project-dir", root.toString))
    // only the modified model was versioned
    assert(Files.exists(root.resolve("models/mart_v1.sql")))
    assert(!Files.exists(root.resolve("models/mart.sql")))
    assert(Files.exists(root.resolve("models/stg.sql")))
    assert(!Files.exists(root.resolve("models/stg_v1.sql")))
  }

  test("ls --select result:error+ --state re-selects what last failed (dbt retry)") {
    val root = writeProject(project)
    val stateDir = Files.createTempDirectory("graft_results")
    Files.writeString(stateDir.resolve("run_results.json"),
      """{"results": [
        |  {"unique_id": "model.shop.stg", "status": "error"},
        |  {"unique_id": "model.shop.mart", "status": "skipped"}
        |]}""".stripMargin)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.main(Array("ls", "--select", "result:error+",
        "--state", stateDir.toString,
        "--project-dir", root.toString))
    }
    assert(out.toString.trim.linesIterator.toSeq ==
      Seq("model.shop.mart", "model.shop.stg"))
  }

  test("build runs the DAG and its tests in one command, scoped to the selection") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: shop\n",
      "models/stg.sql" -> "select 1 as id union all select 2 as id",
      "models/mart.sql" -> "select * from {{ ref('stg') }}",
      "models/schema.yml" ->
        """version: 2
          |models:
          |  - name: stg
          |    columns:
          |      - name: id
          |        tests:
          |          - not_null
          |          - unique
          |""".stripMargin))
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.main(Array("build", "--project-dir", root.toString))
    }
    val text = out.toString
    assert(text.contains("ran model.shop.stg") && text.contains("ran model.shop.mart"))
    assert(text.contains("PASS") && !text.contains("FAIL"), text)
    assert(text.contains("== 2 ran, 2 pass, 0 fail =="), text)
    // selecting only mart scopes the tests away (they belong to stg,
    // which materializes as an upstream view but is not selected)
    val out2 = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out2)) {
      Main.main(Array("build", "--select", "mart", "--project-dir", root.toString))
    }
    assert(out2.toString.contains("== 2 ran, 0 pass, 0 fail =="), out2.toString)
  }

  test("build with a failed model: its tests SKIP, the artifact still writes, exit 1") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: bf\n",
      "models/broken.sql" -> "select * from bf_no_such_relation",
      "models/ok.sql" -> "select 1 as id",
      "models/schema.yml" ->
        """version: 2
          |models:
          |  - name: broken
          |    columns:
          |      - name: id
          |        tests: [not_null]
          |  - name: ok
          |    columns:
          |      - name: id
          |        tests: [not_null]
          |""".stripMargin))
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out)) {
      Main.run(Array("build", "--project-dir", root.toString))
    }
    val text = out.toString
    assert(code == 1, text)
    // the broken model's test skips (no crash on the missing relation),
    // the healthy model's test still runs and passes
    assert(text.contains("SKIP test.bf.not_null_broken_id"), text)
    assert(text.contains("PASS test.bf.not_null_ok_id"), text)
    // run_results.json was written DESPITE the failure — retry's input
    val rs = graft.core.parse.RunResultsJson.load(
      root.resolve("target").resolve("run_results.json"))
    assert(rs("model.bf.broken") == "error", rs.toString)
    assert(rs("test.bf.not_null_broken_id") == "skipped", rs.toString)
    assert(rs("test.bf.not_null_ok_id") == "pass", rs.toString)
  }

  test("build --select <test> runs only that test; parents build silently") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: bt\n",
      "models/stg.sql" -> "select 1 as id",
      "models/schema.yml" ->
        """version: 2
          |models:
          |  - name: stg
          |    columns:
          |      - name: id
          |        tests:
          |          - not_null
          |          - unique
          |""".stripMargin))
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out)) {
      Main.run(Array("build", "--select", "not_null_stg_id",
        "--project-dir", root.toString))
    }
    val text = out.toString
    assert(code == 0, text)
    // the parent materialized for the test...
    assert(text.contains("ran model.bt.stg"), text)
    // ...but ONLY the selected test ran — not the parent's other test
    assert(text.contains("PASS test.bt.not_null_stg_id"), text)
    assert(!text.contains("unique_stg_id"), text)
  }

  test("retry refreshes run_results.json with its own outcomes") {
    val root = writeProject(project)
    Files.createDirectories(root.resolve("target"))
    Files.writeString(root.resolve("target").resolve("run_results.json"),
      """{"results": [
        |  {"unique_id": "model.shop.stg", "status": "success"},
        |  {"unique_id": "model.shop.mart", "status": "error"}
        |]}""".stripMargin)
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out)) {
      Main.run(Array("retry", "--project-dir", root.toString))
    }
    assert(code == 0, out.toString)
    // the artifact now records the retry's success — a second retry has
    // nothing to do (previously the stale 'error' made retry loop forever)
    val rs = graft.core.parse.RunResultsJson.load(
      root.resolve("target").resolve("run_results.json"))
    assert(rs("model.shop.mart") == "success", rs.toString)
    assert(rs("model.shop.stg") == "success", rs.toString)
    val out2 = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out2)) {
      Main.run(Array("retry", "--project-dir", root.toString))
    }
    assert(out2.toString.contains("nothing to retry"), out2.toString)
  }

  test("retry re-runs what run_results.json says failed or was skipped") {
    val root = writeProject(project)
    Files.createDirectories(root.resolve("target"))
    Files.writeString(root.resolve("target").resolve("run_results.json"),
      """{"results": [
        |  {"unique_id": "model.shop.stg", "status": "success"},
        |  {"unique_id": "model.shop.mart", "status": "error"}
        |]}""".stripMargin)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.main(Array("retry", "--project-dir", root.toString))
    }
    // mart re-runs (stg re-materializes as its upstream view)
    assert(out.toString.contains("ran model.shop.mart"), out.toString)
    // a clean artifact retries nothing
    Files.writeString(root.resolve("target").resolve("run_results.json"),
      """{"results": [{"unique_id": "model.shop.mart", "status": "success"}]}""")
    val out2 = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out2)) {
      Main.main(Array("retry", "--project-dir", root.toString))
    }
    assert(out2.toString.contains("nothing to retry"), out2.toString)
  }

  test("unit tests ride test/build and the selection grammar") {
    val files = Map(
      "dbt_project.yml" -> "name: un\n",
      "models/base.sql" -> "select 1 as id, 'a@b.c' as email",
      "models/flags.sql" ->
        ("select id, case when email like '%@%' then true else false end " +
          "as ok from {{ ref('base') }}"),
      "models/_unit.yml" ->
        """version: 2
          |unit_tests:
          |  - name: flag_logic
          |    model: flags
          |    given:
          |      - input: ref('base')
          |        rows:
          |          - {id: 1, email: good@x.y}
          |          - {id: 2, email: bad}
          |    expect:
          |      rows:
          |        - {id: 1, ok: true}
          |        - {id: 2, ok: false}
          |""".stripMargin)
    val root = writeProject(files)
    // ls: the dbt vocabulary selects the unit test as a resource
    val ls = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(ls)) {
      Main.run(Array("ls", "--select", "resource_type:unit_test",
        "--project-dir", root.toString))
    }
    assert(ls.toString.trim == "unit_test.un.flag_logic", ls.toString)
    // test command runs it
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out)) {
      Main.run(Array("test", "--project-dir", root.toString))
    }
    assert(code == 0, out.toString)
    assert(out.toString.contains("PASS unit_test.un.flag_logic"), out.toString)
    // build includes it and a failing expectation fails the build
    val broken = writeProject(files.updated("models/_unit.yml",
      files("models/_unit.yml").replace("ok: false", "ok: true")))
    val out2 = new java.io.ByteArrayOutputStream()
    val code2 = Console.withOut(new java.io.PrintStream(out2)) {
      Main.run(Array("build", "--project-dir", broken.toString))
    }
    assert(code2 == 1, out2.toString)
    assert(out2.toString.contains("FAIL unit_test.un.flag_logic"), out2.toString)
    val rs = graft.core.parse.RunResultsJson.load(
      broken.resolve("target").resolve("run_results.json"))
    assert(rs("unit_test.un.flag_logic") == "fail", rs.toString)
  }

  test("build: a failing unit test gates its model (skipped, descendants skip)") {
    val files = Map(
      "dbt_project.yml" -> "name: ug\n",
      "models/base.sql" -> "select 1 as id",
      "models/mid.sql" ->
        "{{ config(materialized='table') }}\nselect id from {{ ref('base') }}",
      "models/leaf.sql" -> "select id from {{ ref('mid') }}",
      "models/_unit.yml" ->
        """version: 2
          |unit_tests:
          |  - name: mid_check
          |    model: mid
          |    given:
          |      - input: ref('base')
          |        rows:
          |          - {id: 7}
          |    expect:
          |      rows:
          |        - {id: 8}
          |""".stripMargin)
    val root = writeProject(files)
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out)) {
      Main.run(Array("build", "--project-dir", root.toString))
    }
    assert(code == 1, out.toString)
    val rs = graft.core.parse.RunResultsJson.load(
      root.resolve("target").resolve("run_results.json"))
    // dbt 1.8: the unit test fails BEFORE mid materializes; mid records
    // skipped (nothing bad written) and leaf skips through the cascade
    assert(rs("unit_test.ug.mid_check") == "fail", rs.toString)
    assert(rs("model.ug.mid") == "skipped", rs.toString)
    assert(rs("model.ug.leaf") == "skipped", rs.toString)
    assert(!out.toString.contains("ran model.ug.mid"), out.toString)
  }

  test("retry re-runs a failed data test whose model previously succeeded") {
    val files = Map(
      "dbt_project.yml" -> "name: rt1\n",
      "models/stg.sql" -> "select 1 as id",
      "models/_props.yml" ->
        """version: 2
          |models:
          |  - name: stg
          |    columns:
          |      - name: id
          |        tests:
          |          - not_null
          |""".stripMargin)
    val root = writeProject(files)
    Files.createDirectories(root.resolve("target"))
    // previous invocation: model built fine, test failed (e.g. transient
    // data). A fresh retry process has no session views — the parent
    // must re-materialize or the test errors on the missing relation.
    Files.writeString(root.resolve("target").resolve("run_results.json"),
      """{"results": [
        |  {"unique_id": "model.rt1.stg", "status": "success"},
        |  {"unique_id": "test.rt1.not_null_stg_id", "status": "fail"}
        |]}""".stripMargin)
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out)) {
      Main.run(Array("retry", "--project-dir", root.toString))
    }
    assert(code == 0, out.toString)
    assert(out.toString.contains("PASS test.rt1.not_null_stg_id"), out.toString)
    val rs = graft.core.parse.RunResultsJson.load(
      root.resolve("target").resolve("run_results.json"))
    assert(rs("test.rt1.not_null_stg_id") == "pass", rs.toString)
  }

  test("retry re-runs a failed unit test (not silently dropped)") {
    val files = Map(
      "dbt_project.yml" -> "name: rt2\n",
      "models/base.sql" -> "select 1 as id",
      "models/top.sql" -> "select id from {{ ref('base') }}",
      "models/_unit.yml" ->
        """version: 2
          |unit_tests:
          |  - name: top_check
          |    model: top
          |    given:
          |      - input: ref('base')
          |        rows:
          |          - {id: 3}
          |    expect:
          |      rows:
          |        - {id: 3}
          |""".stripMargin)
    val root = writeProject(files)
    Files.createDirectories(root.resolve("target"))
    Files.writeString(root.resolve("target").resolve("run_results.json"),
      """{"results": [
        |  {"unique_id": "model.rt2.base", "status": "success"},
        |  {"unique_id": "model.rt2.top", "status": "success"},
        |  {"unique_id": "unit_test.rt2.top_check", "status": "fail"}
        |]}""".stripMargin)
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out)) {
      Main.run(Array("retry", "--project-dir", root.toString))
    }
    assert(code == 0, out.toString)
    assert(out.toString.contains("PASS unit_test.rt2.top_check"), out.toString)
    val rs = graft.core.parse.RunResultsJson.load(
      root.resolve("target").resolve("run_results.json"))
    assert(rs("unit_test.rt2.top_check") == "pass", rs.toString)
  }

  test("compile renders selected models to target/compiled without executing") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: cp\nvars:\n  cutoff: '2099'\n",
      "macros/c2d.sql" ->
        "{% macro c2d(col) %}cast({{ col }} / 100.0 as decimal(16,2)){% endmacro %}",
      "models/stg.sql" ->
        "select 1 as id, 100 as cents where '{{ var('cutoff') }}' > '2000'",
      "models/mart.sql" ->
        "select id, {{ c2d('cents') }} as dollars from {{ ref('stg') }}",
      "models/py_model.py" ->
        "def model(dbt, session):\n    return dbt.ref(\"stg\")\n"))
    val out = new java.io.ByteArrayOutputStream()
    val code = Console.withOut(new java.io.PrintStream(out)) {
      Main.run(Array("compile", "--project-dir", root.toString))
    }
    assert(code == 0, out.toString)
    // the compiled files sit where a dbt user expects and read as plain
    // executable SQL: refs resolved to relations, macros expanded, vars
    // substituted, nothing executed (no warehouse table was written)
    val mart = Files.readString(
      root.resolve("target/compiled/cp/models/mart.sql"))
    assert(mart.contains("from cp__stg"), mart)
    assert(mart.contains("cast(cents / 100.0 as decimal(16,2))"), mart)
    assert(!mart.contains("{{"), mart)
    val stg = Files.readString(
      root.resolve("target/compiled/cp/models/stg.sql"))
    assert(stg.contains("'2099' > '2000'"), stg)
    // the python model is loudly listed as skipped, not silently dropped
    assert(out.toString.contains("skipped model.cp.py_model"), out.toString)
    // --select scopes: only stg recompiles into a fresh tree
    val root2 = writeProject(Map(
      "dbt_project.yml" -> "name: cp\nvars:\n  cutoff: '2099'\n",
      "models/stg.sql" -> "select 1 as id",
      "models/mart.sql" -> "select id from {{ ref('stg') }}"))
    Main.run(Array("compile", "--select", "stg", "--project-dir", root2.toString))
    assert(Files.exists(root2.resolve("target/compiled/cp/models/stg.sql")))
    assert(!Files.exists(root2.resolve("target/compiled/cp/models/mart.sql")))
  }

  test("docs generate writes dbt-core manifest.json + catalog.json that round-trip") {
    val root = writeProject(project)
    Main.main(Array("docs", "generate", "--project-dir", root.toString))
    // the manifest half loads back through the artifact reader and
    // carries the same resource graph the native parse produced
    val emitted = graft.core.parse.ManifestJson.load(
      root.resolve("target").resolve("manifest.json"))
    val (_, native) = ProjectLoader.load(root)
    assert(emitted.nodes.keySet == native.nodes.keySet)
    // slim-CI property: the emitted artifact reads as UNMODIFIED state
    assert(graft.core.graph.Selector.select(
      native, Seq("state:modified"), state = Some(emitted)).isEmpty)
    // the catalog half carries the materialized schemas and plans the
    // SAME contract as a live session would
    val cat = graft.core.parse.CatalogJson.load(
      root.resolve("target").resolve("catalog.json"))
    val mart = native.nodes("model.shop.mart")
    val fromArtifact = graft.mesh.Contractor.generateContractFromCatalog(
      mart, cat("model.shop.mart"))
    val s = org.apache.spark.sql.SparkSession.active
    val live = graft.mesh.Contractor.generateContract(s, mart, "shop__mart")
    assert(fromArtifact.data == live.data)
    assert(cat("model.shop.stg").columns == Vector("id" -> "integer"))
  }

  test("docs generate --no-compile writes only the manifest half") {
    val root = writeProject(project)
    Main.main(Array("docs", "generate", "--no-compile",
      "--project-dir", root.toString))
    assert(Files.exists(root.resolve("target").resolve("manifest.json")))
    assert(!Files.exists(root.resolve("target").resolve("catalog.json")))
  }

  test("ls prints selected unique_ids; bare ls lists everything") {
    val root = writeProject(project)
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.main(Array("ls", "--select", "+mart",
        "--project-dir", root.toString))
    }
    assert(out.toString.trim.linesIterator.toSeq ==
      Seq("model.shop.mart", "model.shop.stg"))
    val all = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(all)) {
      Main.main(Array("ls", "--project-dir", root.toString))
    }
    assert(all.toString.contains("model.shop.stg"))
  }

  test("ls --select resource_type:model filters by the dbt ls method vocabulary") {
    val root = writeProject(project ++ Map(
      "seeds/lookup.csv" -> "id\n1\n"))
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.main(Array("ls", "--select", "resource_type:model",
        "--project-dir", root.toString))
    }
    assert(out.toString.trim.linesIterator.toSeq ==
      Seq("model.shop.mart", "model.shop.stg"))
    val seeds = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(seeds)) {
      Main.main(Array("ls", "--select", "resource_type:seed",
        "--project-dir", root.toString))
    }
    assert(seeds.toString.trim == "seed.shop.lookup")
  }

  test("seed and snapshot commands run only their materialization kind") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: shop\n",
      "seeds/raw_items.csv" -> "id\n1\n2\n",
      "models/stg_items.sql" -> "select * from {{ ref('raw_items') }}",
      "models/snap_items.sql" ->
        ("{{ config(materialized='snapshot', unique_key='id', " +
          "updated_at='id') }}\nselect * from {{ ref('stg_items') }}")))
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.main(Array("seed", "--project-dir", root.toString))
    }
    val ran = out.toString.trim.linesIterator.toSeq
    assert(ran == Seq("ran seed.shop.raw_items"), ran.toString)
    // snapshot pulls its upstream (the runner needs the views in-session)
    val out2 = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out2)) {
      Main.main(Array("snapshot", "--project-dir", root.toString))
    }
    assert(out2.toString.contains("ran model.shop.snap_items"), out2.toString)
  }

  test("run --vars overrides dbt_project.yml vars for the invocation") {
    val root = writeProject(Map(
      "dbt_project.yml" ->
        """name: shop
          |vars:
          |  floor: 10
          |""".stripMargin,
      "seeds/raw.csv" -> "id\n5\n15\n25\n",
      "models/kept.sql" ->
        "select * from {{ ref('raw') }} where id > {{ var('floor') }}"))
    Main.main(Array("run", "--project-dir", root.toString,
      "--vars", "{floor: 20}"))
    val s = org.apache.spark.sql.SparkSession.active
    // CLI floor=20 wins over the project default 10 → only id 25 survives
    assert(s.table("shop__kept").collect().map(_.getInt(0)).toSeq == Seq(25))
  }

  test("connect rewrites the downstream and registers the dependency") {
    val up = writeProject(Map(
      "dbt_project.yml" -> "name: up_proj\n",
      "models/shared.sql" -> "select 1 as id"))
    val down = writeProject(Map(
      "dbt_project.yml" -> "name: down_proj\n",
      "models/__sources.yml" ->
        """version: 2
          |sources:
          |  - name: ext
          |    database: main
          |    schema: main
          |    tables:
          |      - name: shared
          |""".stripMargin,
      "models/consumer.sql" -> "select * from {{ source('ext', 'shared') }}"))
    Main.main(Array("connect",
      "--project-paths", up.toString, down.toString))
    assert(Files.readString(down.resolve("models/consumer.sql"))
      == "select * from {{ ref('up_proj', 'shared') }}")
    val (_, upM) = ProjectLoader.load(up)
    assert(upM.nodes("model.up_proj.shared").access ==
      graft.core.model.AccessType.Public)
    assert(Files.exists(down.resolve("dependencies.yml")))
    assert(!Files.exists(up.resolve("dependencies.yml")))
  }

  test("connect --projects-dir discovers projects, skips dbt_packages, excludes by name") {
    val base = Files.createTempDirectory("graft_mesh_dir")
    def proj(rel: String, files: Map[String, String]): Unit =
      files.foreach { case (f, text) =>
        val p = base.resolve(rel).resolve(f)
        Files.createDirectories(p.getParent)
        Files.writeString(p, text)
      }
    proj("up", Map(
      "dbt_project.yml" -> "name: up_proj\n",
      "models/shared.sql" -> "select 1 as id"))
    proj("down", Map(
      "dbt_project.yml" -> "name: down_proj\n",
      "models/__sources.yml" ->
        """version: 2
          |sources:
          |  - name: ext
          |    database: main
          |    schema: main
          |    tables:
          |      - name: shared
          |""".stripMargin,
      "models/consumer.sql" -> "select * from {{ source('ext', 'shared') }}"))
    // an installed package copy must not be discovered as a project
    proj("down/dbt_packages/up", Map("dbt_project.yml" -> "name: up_proj\n"))
    // a third project excluded by name must not participate
    proj("other", Map(
      "dbt_project.yml" -> "name: other_proj\n",
      "models/thing.sql" -> "select 2 as id"))
    Main.main(Array("connect", "--projects-dir", base.toString,
      "--exclude-projects", "other_proj"))
    assert(Files.readString(base.resolve("down/models/consumer.sql"))
      == "select * from {{ ref('up_proj', 'shared') }}")
    assert(Files.exists(base.resolve("down/dependencies.yml")))
  }

  test("run writes target/run_results.json; test honors --select") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: rr\n",
      "models/one.sql" -> "select 1 as id",
      "models/two.sql" -> "select 2 as id",
      "models/_props.yml" ->
        """version: 2
          |models:
          |  - name: one
          |    columns:
          |      - name: id
          |        tests: [not_null]
          |  - name: two
          |    columns:
          |      - name: id
          |        tests: [not_null]
          |""".stripMargin))
    Main.main(Array("run", "--project-dir", root.toString))
    val rr = graft.core.parse.RunResultsJson.load(
      root.resolve("target/run_results.json"))
    assert(rr == Map("model.rr.one" -> "success", "model.rr.two" -> "success"),
      rr.toString)
    // scoped test: only one's test runs
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.main(Array("test", "--select", "one", "--project-dir", root.toString))
    }
    assert(out.toString.contains("PASS test.rr.not_null_one_id"), out.toString)
    assert(!out.toString.contains("not_null_two_id"),
      "unselected model's test must not run:\n" + out.toString)
    // the test invocation refreshed the artifact with test statuses —
    // the retry/result: selectors' first-party input
    val rr2 = graft.core.parse.RunResultsJson.load(
      root.resolve("target/run_results.json"))
    assert(rr2 == Map("test.rr.not_null_one_id" -> "pass"), rr2.toString)
  }

  test("clone + run --defer: state relations copy without recompute and serve refs") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: shop2\n",
      // would FAIL if executed — clone must never run the model
      "models/stg_c.sql" ->
        "{{ config(materialized='table') }}\nselect * from missing_prod_only_table",
      "models/mart_c.sql" -> "select id, v from {{ ref('stg_c') }} where id > 1"))
    val s = org.apache.spark.sql.SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[*]"))
      .appName("graft").config("spark.ui.enabled", "false").getOrCreate()
    import s.implicits._
    // "prod" state: stg_c lives as the prod_stg_c relation
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
      .createOrReplaceTempView("prod_stg_c")
    val (_, m) = ProjectLoader.load(root)
    val state = m.copy(nodes = m.nodes.map { case (id, n) =>
      id -> (if (n.name == "stg_c") n.copy(relationName = Some("prod_stg_c"))
             else n)
    })
    val stateDir = Files.createTempDirectory("graft_state_clone")
    graft.core.parse.ManifestJsonWriter.write(
      state, stateDir.resolve("manifest.json"))

    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Main.main(Array("clone", "--select", "stg_c",
        "--state", stateDir.toString,
        "--project-dir", root.toString, "--read-catalog"))
    }
    assert(out.toString.contains("cloned model.shop2.stg_c from prod_stg_c"),
      out.toString)
    // a real catalog table materialized WITHOUT running the broken SQL
    assert(Files.exists(root.resolve(".graft/warehouse/stg_c")))
    assert(s.table("shop2__stg_c").count() == 3L)
    // clone's artifact records the clone view as the relation
    assert(Files.readString(root.resolve("target/manifest.json"))
      .contains("shop2__stg_c"))

    // downstream defers its unselected upstream to the clone — and the
    // clone must survive a PROCESS boundary: drop the session views the
    // clone command registered so the run can only succeed by
    // rehydrating the deferred relation from the warehouse artifact
    s.catalog.dropTempView("shop2__stg_c")
    val out2 = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out2)) {
      Main.main(Array("run", "--select", "mart_c", "--defer",
        "--state", root.resolve("target").toString,
        "--project-dir", root.toString))
    }
    assert(out2.toString.contains("ran model.shop2.mart_c"), out2.toString)
    assert(!out2.toString.contains("ran model.shop2.stg_c"))
    assert(s.table("shop2__mart_c").orderBy("id").as[(Long, String)]
      .collect().toSeq == Seq((2L, "b"), (3L, "c")))
  }
}
