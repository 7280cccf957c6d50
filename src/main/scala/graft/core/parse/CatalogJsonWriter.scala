package graft.core.parse

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.types.StructType

/** Writes a dbt-core `catalog.json` (docs-generate artifact, catalog v1
  * schema) from materialized Spark schemas — the emit half of the
  * warehouse-crawl interop whose read half is [[CatalogJson]]. `graft
  * docs generate` produces it after a run so contract generation — ours
  * via `contract --read-catalog`, or the reference's cached-crawl path
  * (`dbt_projects.py:279-290`) — can run later without a warehouse.
  *
  * Column types are [[graft.core.catalog.Contracts.typeString]]'s
  * lower-case spellings: `CatalogJson.parse` + `contractPatchFromCatalog`
  * on this artifact then plans the byte-identical contract that
  * `Contractor.generateContract` plans against the live session — the
  * round-trip ContractsSpec pins. Nodes are emitted in sorted unique_id
  * order (byte-stable output, artifact diffs = schema diffs).
  */
object CatalogJsonWriter {
  private val mapper = new ObjectMapper()

  def emit(entries: Seq[(String, String, StructType)]): String = {
    val root = mapper.createObjectNode()
    val meta = root.putObject("metadata")
    meta.put("dbt_schema_version",
      "https://schemas.getdbt.com/dbt/catalog/v1.json")
    meta.putObject("env")
    val nodes = root.putObject("nodes")
    entries.sortBy(_._1).foreach { case (uniqueId, relName, schema) =>
      val o = nodes.putObject(uniqueId)
      val m = o.putObject("metadata")
      m.put("type", "BASE TABLE")
      m.put("schema", "main")
      m.put("name", relName)
      val cols = o.putObject("columns")
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        val c = cols.putObject(f.name)
        c.put("type", graft.core.catalog.Contracts.typeString(f.dataType))
        c.put("index", i + 1)
        c.put("name", f.name)
      }
      o.putObject("stats")
      o.put("unique_id", uniqueId)
    }
    root.putObject("sources")
    root.putArray("errors")
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(root)
  }

  /** Write to `path` (conventionally `<project>/target/catalog.json`). */
  def write(entries: Seq[(String, String, StructType)],
      path: java.nio.file.Path): Unit = {
    java.nio.file.Files.createDirectories(path.getParent)
    java.nio.file.Files.writeString(path, emit(entries))
    ()
  }
}
