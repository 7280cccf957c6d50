package graft.mesh

import graft.core.changes.ChangeSetProcessor
import graft.core.parse.ProjectLoader
import graft.core.yaml._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Path}

/** C6 version-command lifecycle against the filesystem — the reference's
  * `tests/integration/test_version_command.py` shape. */
class VersionIntegrationSpec extends AnyFunSuite {

  private def writeProject(files: Map[String, String]): Path = {
    val root = Files.createTempDirectory("graft_version")
    files.foreach { case (rel, text) =>
      val p = root.resolve(rel)
      Files.createDirectories(p.getParent)
      Files.writeString(p, text)
    }
    root
  }

  test("version on an unversioned model: v1 move + v2 copy + one patch") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: jaffle\n",
      "models/__models.yml" ->
        """version: 2
          |models:
          |  - name: orders
          |    description: the mart
          |""".stripMargin,
      "models/orders.sql" -> "select 1 as id"))
    val (_, m) = ProjectLoader.load(root)
    val model = m.nodes("model.jaffle.orders")
    val entry = Yaml.parseMap(Files.readString(root.resolve("models/__models.yml")))
      .apply("models").asList.items.head.asMap

    val cs = Versioner.version(model, entry, Versioner.Behavior.Latest)
    new ChangeSetProcessor(root).process(Seq(cs))

    // the original file moved to _v1 and was copied to _v2
    assert(!Files.exists(root.resolve("models/orders.sql")))
    assert(Files.readString(root.resolve("models/orders_v1.sql")) == "select 1 as id")
    assert(Files.readString(root.resolve("models/orders_v2.sql")) == "select 1 as id")

    // the patch carries latest_version 2 with both versions, description kept
    val doc = Yaml.parseMap(Files.readString(root.resolve("models/__models.yml")))
    val e2 = doc("models").asList.items.head.asMap
    assert(e2.get("description").map(_.asStr).contains("the mart"))
    assert(e2("latest_version") == YInt(2))
    assert(e2("versions").asList.items.map(_.asMap("v")) == Vector(YInt(1), YInt(2)))

    // reloading resolves the versioned files dbt-style: the latest
    // version's file is the base-named node (what ref('orders') and the
    // CLI see), the older version loads as a distinct .v1 node
    val (_, m2) = ProjectLoader.load(root)
    assert(m2.nodes.keySet ==
      Set("model.jaffle.orders", "model.jaffle.orders.v1"))
    assert(m2.nodes("model.jaffle.orders").filePath == "models/orders_v2.sql")
  }

  test("bump again with Prerelease keeps latest_version pinned") {
    val root = writeProject(Map(
      "dbt_project.yml" -> "name: jaffle\n",
      "models/__models.yml" ->
        """version: 2
          |models:
          |  - name: orders
          |    latest_version: 2
          |    versions:
          |      - v: 1
          |      - v: 2
          |""".stripMargin,
      "models/orders_v1.sql" -> "select 1",
      "models/orders_v2.sql" -> "select 2"))
    val (_, m) = ProjectLoader.load(root)
    // the loader resolves orders_v2.sql (latest) to the base-named node
    val model = m.nodes("model.jaffle.orders")
    val entry = Yaml.parseMap(Files.readString(root.resolve("models/__models.yml")))
      .apply("models").asList.items.head.asMap

    val cs = Versioner.version(model, entry, Versioner.Behavior.Prerelease)
    new ChangeSetProcessor(root).process(Seq(cs))

    assert(Files.readString(root.resolve("models/orders_v3.sql")) == "select 2")
    val doc = Yaml.parseMap(Files.readString(root.resolve("models/__models.yml")))
    val e2 = doc("models").asList.items.head.asMap
    assert(e2("latest_version") == YInt(2)) // prerelease: pinned
    assert(e2("versions").asList.items.map(_.asMap("v")) ==
      Vector(YInt(1), YInt(2), YInt(3)))
  }
}
