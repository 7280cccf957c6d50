package graft.core.catalog

import graft.core.yaml._
import org.apache.spark.sql.types._

/** Contract ⇄ schema bridge (SURVEY §1.3, §2.C1).
  *
  * The reference freezes warehouse catalog columns into YAML contracts with
  * lower-cased type strings (`utilities/contractor.py:24-31`). Here the
  * "warehouse" is the Spark catalog: `df.schema` is the source of truth and
  * Spark `typeName`s (plus the duckdb-style aliases dbt projects carry)
  * are the type vocabulary.
  */
object Contracts {

  /** YAML type string -> Spark DataType (dbt/duckdb aliases included). */
  def parseType(s: String): DataType = {
    val t = s.trim.toLowerCase
    val dec = """decimal\((\d+)\s*,\s*(\d+)\)""".r
    val num = """numeric\((\d+)\s*,\s*(\d+)\)""".r
    t match {
      case "integer" | "int" | "int4" => IntegerType
      case "bigint" | "long" | "int8" => LongType
      case "smallint" | "short" => ShortType
      case "varchar" | "string" | "text" => StringType
      case "double" | "double precision" | "float8" => DoubleType
      case "float" | "real" | "float4" => FloatType
      case "boolean" | "bool" => BooleanType
      case "timestamp" | "datetime" => TimestampType
      case "date" => DateType
      case "binary" | "blob" => BinaryType
      case dec(p, sc) => DecimalType(p.toInt, sc.toInt)
      case num(p, sc) => DecimalType(p.toInt, sc.toInt)
      case other => throw new IllegalArgumentException(s"unknown contract type: $other")
    }
  }

  /** Spark DataType -> contract YAML string (lower-case, like the ref). */
  def typeString(dt: DataType): String = dt match {
    case d: DecimalType => s"decimal(${d.precision},${d.scale})"
    case other => other.typeName
  }

  /** Contract columns from a model's YAML entry (columns with data_type). */
  def fromYaml(entry: YMap): Option[StructType] = {
    val cols = entry.get("columns").collect { case YList(cs) => cs }.getOrElse(Vector.empty)
      .collect { case c: YMap if c.contains("data_type") =>
        StructField(c("name").asStr, parseType(c("data_type").asStr))
      }
    if (cols.isEmpty) None else Some(StructType(cols))
  }

  /** Contract for an enforced model. dbt-core errors when any column of a
    * contracted model lacks data_type — partially-typed contracts would
    * silently verify only the typed subset, so fail loudly on those (and
    * on a contract with no typed columns at all). Only called for models
    * with `config.contract.enforced: true`; non-enforced models never
    * parse their data_type strings (which may be docs-only vocabulary
    * outside our type whitelist). */
  def enforcedFromYaml(model: String, entry: YMap): StructType = {
    val cols = entry.get("columns").collect { case YList(cs) => cs }
      .getOrElse(Vector.empty).collect { case c: YMap => c }
    val untyped = cols.filterNot(_.contains("data_type")).map(_("name").asStr)
    if (untyped.nonEmpty)
      throw new IllegalArgumentException(
        s"model $model has an enforced contract but columns " +
          s"${untyped.mkString(", ")} lack data_type — contracted models " +
          "require data_type for each column")
    fromYaml(entry).getOrElse(throw new IllegalArgumentException(
      s"model $model declares config.contract.enforced: true but no columns " +
        "carry data_type — the contract would verify nothing"))
  }

  /** Generate the contract patch data from a produced schema, preserving
    * YAML-declared column case via a lower->original map
    * (`utilities/contractor.py:14-47`). */
  def contractPatch(schema: StructType, declaredCase: Map[String, String] = Map.empty): YMap = {
    val cols = YList(schema.fields.toVector.map { f =>
      // YAML-declared case wins; otherwise the column is written
      // lower-case like the reference (`contractor.py:26`
      // `original_case.get(name.lower()) or name.lower()`), so
      // warehouse-upper-cased schemas don't leak into the YAML
      val name = declaredCase.getOrElse(f.name.toLowerCase, f.name.toLowerCase)
      YMap.of("name" -> YStr(name), "data_type" -> YStr(typeString(f.dataType))): Y
    })
    YMap.of(
      "config" -> YMap.of("contract" -> YMap.of("enforced" -> YBool(true))),
      "columns" -> cols)
  }

  /** Contract patch from raw warehouse catalog columns (a dbt
    * `catalog.json` entry) — types pass through lower-cased VERBATIM like
    * the reference (`contractor.py:24-31`), no whitelist; name casing
    * follows the same declared-case rule as [[contractPatch]]. */
  def contractPatchFromCatalog(columns: Seq[(String, String)],
      declaredCase: Map[String, String] = Map.empty): YMap = {
    val enforced =
      YMap.of("config" -> YMap.of("contract" -> YMap.of("enforced" -> YBool(true))))
    // a node absent from the crawl still gets the enforced flag, columns
    // omitted (`contractor.py:21-22,36-37`: `columns = None` → no key)
    if (columns.isEmpty) enforced
    else enforced.updated("columns", YList(columns.toVector.map {
      case (rawName, tpe) =>
        val name = declaredCase.getOrElse(rawName.toLowerCase, rawName.toLowerCase)
        YMap.of("name" -> YStr(name), "data_type" -> YStr(tpe.toLowerCase)): Y
    }))
  }

  final case class ContractViolation(model: String, problems: Seq[String])
    extends RuntimeException(s"contract violation on $model: ${problems.mkString("; ")}")

  /** Order-insensitive name+type check of a produced schema vs contract
    * (case-insensitive names, like Spark resolution — SURVEY §4 item 2). */
  def check(model: String, produced: StructType, contract: StructType): Unit = {
    val got = produced.fields.map(f => f.name.toLowerCase -> f.dataType).toMap
    val problems = Seq.newBuilder[String]
    contract.fields.foreach { f =>
      got.get(f.name.toLowerCase) match {
        case None => problems += s"missing column ${f.name}"
        case Some(dt) if dt != f.dataType =>
          problems += s"column ${f.name}: expected ${typeString(f.dataType)}, got ${typeString(dt)}"
        case _ =>
      }
    }
    val extra = got.keySet -- contract.fields.map(_.name.toLowerCase).toSet
    extra.foreach(e => problems += s"undeclared column $e")
    val ps = problems.result()
    if (ps.nonEmpty) throw ContractViolation(model, ps)
  }
}
