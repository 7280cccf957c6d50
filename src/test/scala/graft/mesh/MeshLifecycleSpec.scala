package graft.mesh

import graft.SparkFixture
import graft.core.changes.ChangeSetProcessor
import graft.core.model.Owner
import graft.core.parse.ProjectLoader
import graft.core.yaml.{YMap, Yaml}
import graft.engine.Runner
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** Capstone: the seven commands composed over ONE project lifecycle —
  * run → group(+contracts) → split → re-run both sides → version — with
  * every plan executed against the filesystem and reloaded. */
class MeshLifecycleSpec extends AnyFunSuite with SparkFixture {

  private def writeProject(root: Path, files: Map[String, String]): Unit =
    files.foreach { case (rel, text) =>
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, text)
    }

  test("group → contract → split → re-run → version, end to end") {
    val s = spark
    import s.implicits._
    val root = Files.createTempDirectory("graft_lifecycle")
    writeProject(root, Map(
      "dbt_project.yml" -> "name: shop\n",
      "seeds/raw_orders.csv" -> "id,cents\n1,150\n2,250\n3,1000\n",
      "models/staging/stg_orders.sql" ->
        "select id, cents from {{ ref('raw_orders') }}",
      "models/marts/orders.sql" ->
        ("{{ config(materialized='table') }}\n" +
          "select id, cents / 100.0 as dollars from {{ ref('stg_orders') }}"),
      "models/marts/report.sql" ->
        "select count(*) as n from {{ ref('orders') }}"))

    // 1. load + run (data plane)
    val (cfg, m1) = ProjectLoader.load(root)
    val runner1 = new Runner(s, m1, cfg, Files.createTempDirectory("wh1"),
      enforceAccess = false, projectRoot = Some(root))
    val out1 = runner1.run()
    assert(out1("model.shop.report").collect().head.getLong(0) == 3L)

    // 2. group the whole DAG; boundary models get contracts from their
    //    materialized schemas
    val modelIds = m1.nodes.keySet.filter(_.startsWith("model."))
    val groupCs = Commands.group(s, m1, "core", Owner(name = Some("team")),
      modelIds, "models/_groups.yml", runner1.viewName)
    new ChangeSetProcessor(root).process(Seq(groupCs))
    val (_, m2) = ProjectLoader.load(root)
    assert(m2.nodes("model.shop.report").group.contains("core"))
    // report is the leaf => protected + contracted; stg_orders interior
    assert(m2.nodes("model.shop.report").contractEnforced)
    assert(m2.nodes("model.shop.stg_orders").group.contains("core"))

    // 3. split the marts subtree out
    val (cfg2, m2b) = ProjectLoader.load(root)
    val splitCs = Commands.split(s, m2b, cfg2, "marts",
      Seq("orders+"), "marts_proj",
      p => Files.readString(root.resolve(p)), n => s"shop__$n")
    new ChangeSetProcessor(root).process(Seq(splitCs))
    val sub = root.resolve("marts_proj")
    assert(Files.exists(sub.resolve("models/marts/orders.sql")))

    // 4. re-run both sides: parent publishes, subproject consumes
    val (pCfg, pM) = ProjectLoader.load(root)
    new Runner(s, pM, pCfg, Files.createTempDirectory("wh2"),
      enforceAccess = false, projectRoot = Some(root)).run()
    val (sCfg, sM) = ProjectLoader.load(sub)
    val out2 = new Runner(s, sM, sCfg, Files.createTempDirectory("wh3"),
      enforceAccess = false, projectRoot = Some(sub)).run()
    assert(out2("model.marts.report").collect().head.getLong(0) == 3L)

    // 5. version the subproject's orders model
    // patches without an existing file land in the model dir's
    // _models.yml (dbt's resolve_patch_path default); the split moved
    // orders' patch into the subproject
    val entry = Yaml.parseMap(
      Files.readString(sub.resolve("models/marts/_models.yml")))
      .apply("models").asList.items
      .collectFirst { case e: YMap if e.get("name").exists(_.asStr == "orders") => e }
      .getOrElse(YMap.of())
    val ordersNode = sM.nodes("model.marts.orders")
    val versionCs = Versioner.version(ordersNode, entry, Versioner.Behavior.Latest)
    new ChangeSetProcessor(sub).process(Seq(versionCs))
    assert(Files.exists(sub.resolve("models/marts/orders_v1.sql")))
    assert(Files.exists(sub.resolve("models/marts/orders_v2.sql")))
    // the loader resolves the latest version file to the base-named node
    // and the old version to a .v1 node
    val (_, sM2) = ProjectLoader.load(sub)
    assert(sM2.nodes("model.marts.orders").filePath
      .endsWith("models/marts/orders_v2.sql"))
    assert(sM2.nodes.contains("model.marts.orders.v1"))
  }
}
