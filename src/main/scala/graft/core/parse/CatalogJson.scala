package graft.core.parse

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

/** Loader for a dbt-core-produced `catalog.json` (the `dbt docs generate`
  * artifact) — the reference's cached warehouse crawl
  * (`dbt_projects.py:279-290`: `--read-catalog` reads
  * `target/catalog.json` into a `CatalogArtifact`, and contract
  * generation looks entries up per unique_id via
  * `dbt_projects.py:205` `get_catalog_entry`).
  *
  * graft's own `--read-catalog` reuses its Spark warehouse; this loader
  * is the complementary interop surface: generate contracts for a
  * project graft has never materialized, from the artifact a real dbt
  * deployment already has on disk. Paired with [[ManifestJson]] it makes
  * graft a drop-in meshify for existing dbt projects.
  *
  * Only what contract generation consumes is modeled: per-node column
  * name → warehouse type (`utilities/contractor.py:16-31` reads
  * `model_catalog.columns` and lower-cases `value.type`). Types are kept
  * VERBATIM (lower-cased) — the reference never parses them, so neither
  * do we; no type whitelist applies on this path. Columns are ordered by
  * the artifact's `index` field (warehouse column order).
  */
object CatalogJson {

  /** One catalog node/source: ordered (column name, lower-cased type). */
  final case class Entry(uniqueId: String, columns: Vector[(String, String)])

  def load(path: java.nio.file.Path): Map[String, Entry] =
    parse(java.nio.file.Files.readString(path))

  def parse(json: String): Map[String, Entry] = {
    val root = new ObjectMapper().readTree(json)
    def section(name: String): Seq[(String, JsonNode)] =
      Option(root.get(name)).toSeq
        .flatMap(_.properties().asScala.map(e => e.getKey -> e.getValue))
    (section("nodes") ++ section("sources")).map { case (id, n) =>
      val cols = Option(n.get("columns")).toVector
        .flatMap(_.properties().asScala)
        .map { e =>
          val v = e.getValue
          val idx = Option(v.get("index")).map(_.asInt).getOrElse(Int.MaxValue)
          // the dict KEY is the name the reference iterates
          // (`contractor.py:29` `for name, value in ...columns.items()`)
          (idx, e.getKey, Option(v.get("type")).map(_.asText).getOrElse(
            throw new IllegalArgumentException(
              s"catalog.json: $id column ${e.getKey} missing 'type'")))
        }
        .sortBy(_._1)
        .map { case (_, name, tpe) => name -> tpe.toLowerCase }
      id -> Entry(id, cols)
    }.toMap
  }
}
