package graft.mesh

import graft.SparkFixture
import graft.core.changes.ChangeSetProcessor
import graft.core.graph.Selector
import graft.core.model.ProjectConfig
import graft.core.parse.ProjectLoader
import graft.core.yaml.Yaml
import graft.engine.Runner
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** Full split lifecycle against the filesystem — the reference's
  * `tests/integration/test_split_command.py` shape: plan a split, execute
  * the ChangeSet, reload BOTH projects from disk, assert the rewritten
  * files, then actually run the subproject's models on Spark. */
class SplitIntegrationSpec extends AnyFunSuite with SparkFixture {

  private def writeProject(root: Path, files: Map[String, String]): Unit =
    files.foreach { case (rel, text) =>
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, text)
    }

  private val projectFiles = Map(
    "dbt_project.yml" -> "name: jaffle\n",
    "models/staging/__sources.yml" ->
      """version: 2
        |sources:
        |  - name: raw
        |    tables:
        |      - name: raw_orders
        |""".stripMargin,
    "models/staging/stg_orders.sql" ->
      "select id, cents from {{ source('raw', 'raw_orders') }}",
    "models/marts/__models.yml" ->
      """version: 2
        |models:
        |  - name: orders
        |    description: the orders mart
        |""".stripMargin,
    "models/marts/orders.sql" ->
      "select id, cents / 100.0 as dollars from {{ ref('stg_orders') }}",
    "models/marts/report.sql" ->
      "select count(*) as n from {{ ref('orders') }}")

  test("split marts into a subproject: execute, reload, re-run") {
    val root = Files.createTempDirectory("graft_split")
    writeProject(root, projectFiles)
    val (cfg, manifest) = ProjectLoader.load(root)

    // select the marts subtree (descendants of orders, like `orders+`)
    val selected = Selector.select(manifest, Seq("orders+"))
    assert(selected == Set("model.jaffle.orders", "model.jaffle.report"))

    val plan = SubprojectCreator.initialize(
      manifest, cfg, "marts", selected, "marts_proj",
      p => Files.readString(root.resolve(p)))
    new ChangeSetProcessor(root).process(Seq(plan))

    // parent: moved files gone, boundary model got public access
    assert(!Files.exists(root.resolve("models/marts/orders.sql")))
    assert(!Files.exists(root.resolve("models/marts/report.sql")))
    val stgPatch = Yaml.parseMap(
      Files.readString(root.resolve("models/staging/_models.yml")))
    val stgEntry = stgPatch("models").asList.items.head.asMap
    assert(stgEntry.get("access").map(_.asStr).contains("public"))

    // subproject: files exist, YAML entry moved with its description,
    // moved model's ref to the left-behind parent is cross-project now
    val sub = root.resolve("marts_proj")
    assert(Files.readString(sub.resolve("models/marts/orders.sql"))
      .contains("{{ ref('jaffle', 'stg_orders') }}"))
    val subModels = Yaml.parseMap(
      Files.readString(sub.resolve("models/marts/__models.yml")))
    val ordersEntry = subModels("models").asList.items
      .collectFirst { case m: graft.core.yaml.YMap
        if m.get("name").exists(_.asStr == "orders") => m }.get
    assert(ordersEntry.get("description").map(_.asStr).contains("the orders mart"))
    // sub depends on parent
    val deps = Yaml.parseMap(Files.readString(sub.resolve("dependencies.yml")))
    assert(deps("projects").asList.items.head.asMap("name").asStr == "jaffle")

    // reload both projects and run them end-to-end on Spark: the parent
    // first (publishes stg_orders), then the subproject resolving its
    // cross-project ref to the parent's published view
    val s = spark
    import s.implicits._
    Seq((1L, 150L), (2L, 250L)).toDF("id", "cents")
      .createOrReplaceTempView("raw_orders")
    val (pCfg, pManifest) = ProjectLoader.load(root)
    assert(!pManifest.nodes.contains("model.jaffle.orders"))
    val pRunner = new Runner(s, pManifest, pCfg,
      Files.createTempDirectory("wh_p"), enforceAccess = false)
    pRunner.run()

    val (sCfg, sManifest) = ProjectLoader.load(sub)
    assert(sManifest.projectName == "marts")
    // cross-project ref: resolve foreign refs to the parent's views
    val sRunner = new Runner(s, sManifest, sCfg,
      Files.createTempDirectory("wh_s"), enforceAccess = false)
    // register the parent's stg_orders under the name the subproject's
    // renderer will resolve: cross-project refs keep the model name
    val out = sRunner.run()
    val rows = out("model.marts.report").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L))
  }
}
