package graft.core

import graft.core.changes._
import graft.core.yaml._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** E2–E8 — YAML entry edit kernels + the file-backed processor
  * (`storage/file_content_editors.py`, `change_set_processor.py`). */
class EditorsSpec extends AnyFunSuite {

  test("upsertEntry adds a new model entry with version header and key order") {
    val doc = ResourceFileEditor.upsertEntry(YMap.empty, "models", "orders",
      YMap.of("columns" -> YList.of(YMap.of("name" -> YStr("id"))),
        "access" -> YStr("public"), "description" -> YStr("d")))
    assert(doc("version") == YInt(2))
    val entry = doc("models").asList.items.head.asMap
    // canonical order: name, description, access … columns last
    assert(entry.keys == Vector("name", "description", "access", "columns"))
  }

  test("upsertEntry deep-merges an existing entry without clobbering siblings") {
    val doc0 = Yaml.parseMap(
      """version: 2
        |models:
        |  - name: orders
        |    description: keep me
        |    columns:
        |      - name: id
        |        description: pk
        |""".stripMargin)
    val doc1 = ResourceFileEditor.upsertEntry(doc0, "models", "orders",
      YMap.of("access" -> YStr("public"),
        "columns" -> YList.of(
          YMap.of("name" -> YStr("id"), "data_type" -> YStr("integer")),
          YMap.of("name" -> YStr("total"), "data_type" -> YStr("double")))))
    val entry = doc1("models").asList.items.head.asMap
    assert(entry.get("description").map(_.asStr).contains("keep me"))
    assert(entry.get("access").map(_.asStr).contains("public"))
    val cols = entry("columns").asList.items.map(_.asMap)
    val id = cols.find(_.get("name").exists(_.asStr == "id")).get
    // NamedList merge by name: id keeps its description, gains data_type
    assert(id.get("description").map(_.asStr).contains("pk"))
    assert(id.get("data_type").map(_.asStr).contains("integer"))
    assert(cols.exists(_.get("name").exists(_.asStr == "total")))
  }

  test("upsertEntry with sourceName merges a table into the stanza's tables") {
    val doc0 = Yaml.parseMap(
      """version: 2
        |sources:
        |  - name: raw
        |    schema: raw
        |    tables:
        |      - name: payments
        |""".stripMargin)
    val doc1 = ResourceFileEditor.upsertEntry(doc0, "sources", "orders",
      YMap.of("name" -> YStr("raw"),
        "tables" -> YList.of(YMap.of("name" -> YStr("orders")))),
      sourceName = Some("raw"))
    val src = doc1("sources").asList.items.head.asMap
    assert(src.get("schema").map(_.asStr).contains("raw"))
    val tables = src("tables").asList.items.map(_.asMap("name").asStr)
    assert(tables.toSet == Set("payments", "orders"))
  }

  test("removeEntry: nested source-table removal with empty-source cleanup") {
    val doc0 = Yaml.parseMap(
      """version: 2
        |sources:
        |  - name: raw
        |    tables:
        |      - name: orders
        |""".stripMargin)
    // removing the last table drops the whole source; then only version
    // remains -> None signals file deletion
    assert(ResourceFileEditor.removeEntry(doc0, "sources", "orders", Some("raw")).isEmpty)

    val doc2 = Yaml.parseMap(
      """version: 2
        |sources:
        |  - name: raw
        |    tables:
        |      - name: orders
        |      - name: payments
        |""".stripMargin)
    val kept = ResourceFileEditor.removeEntry(doc2, "sources", "orders", Some("raw")).get
    val tables = kept("sources").asList.items.head.asMap("tables")
      .asList.items.map(_.asMap("name").asStr)
    assert(tables == Vector("payments"))
  }

  test("processor: plans execute against the filesystem; dry-run doesn't") {
    val root = Files.createTempDirectory("graft_editors")
    Files.createDirectories(root.resolve("models"))
    Files.writeString(root.resolve("models/a.sql"), "select 1")
    val cs = ChangeSet(Vector(
      FileChange(Operation.Move, "models/sub/a.sql", None, Some("models/a.sql")),
      FileChange(Operation.Add, "models/b.sql", Some("select 2")),
      ResourceChange(Operation.Add, EntityType.Model, "a", "models/_a.yml",
        YMap.of("access" -> YStr("public"))),
      FileChange(Operation.Append, "models/b.sql", Some("\n-- tail"))))

    new ChangeSetProcessor(root, dryRun = true).process(Seq(cs))
    assert(Files.exists(root.resolve("models/a.sql"))) // untouched

    new ChangeSetProcessor(root).process(Seq(cs))
    assert(!Files.exists(root.resolve("models/a.sql")))
    assert(Files.readString(root.resolve("models/sub/a.sql")) == "select 1")
    assert(Files.readString(root.resolve("models/b.sql")) == "select 2\n-- tail")
    val yml = Yaml.parseMap(Files.readString(root.resolve("models/_a.yml")))
    val entry = yml("models").asList.items.head.asMap
    assert(entry.get("access").map(_.asStr).contains("public"))
  }

  test("processor is fail-fast and wraps the failing step") {
    val root = Files.createTempDirectory("graft_editors2")
    val bad = ChangeSet(Vector(
      FileChange(Operation.Move, "x.sql", None, Some("missing.sql")),
      FileChange(Operation.Add, "never.sql", Some("x"))))
    val e = intercept[ChangeSetProcessorException](
      new ChangeSetProcessor(root).process(Seq(bad)))
    assert(e.getMessage.contains("x.sql"))
    assert(!Files.exists(root.resolve("never.sql"))) // later steps not applied
  }

  test("E7: directory copy honors ignore patterns") {
    val root = Files.createTempDirectory("graft_dircopy")
    Files.createDirectories(root.resolve("tpl/models"))
    Files.createDirectories(root.resolve("tpl/target"))
    Files.writeString(root.resolve("tpl/models/a.sql"), "select 1")
    Files.writeString(root.resolve("tpl/target/junk.json"), "{}")
    Files.writeString(root.resolve("tpl/readme.md"), "hi")
    new ChangeSetProcessor(root).process(Seq(ChangeSet(Vector(
      DirectoryChange(Operation.Copy, "out", Some("tpl"),
        ignore = Seq("target", "*.md"))))))
    assert(Files.readString(root.resolve("out/models/a.sql")) == "select 1")
    assert(!Files.exists(root.resolve("out/target")))
    assert(!Files.exists(root.resolve("out/readme.md")))
  }

  test("yaml dump round-trips through parse") {
    val doc = YMap.of(
      "version" -> YInt(2),
      "models" -> YList.of(YMap.of(
        "name" -> YStr("orders"),
        "config" -> YMap.of("contract" -> YMap.of("enforced" -> YBool(true))),
        "columns" -> YList.of(
          YMap.of("name" -> YStr("id"), "data_type" -> YStr("integer"))))))
    assert(Yaml.parseMap(Yaml.dump(doc)) == doc)
  }
}
