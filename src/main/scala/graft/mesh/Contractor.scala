package graft.mesh

import graft.core.catalog.Contracts
import graft.core.changes._
import graft.core.model.ModelNode
import graft.core.yaml._
import org.apache.spark.sql.SparkSession

/** C1 — contract generation (`utilities/contractor.py:14-47`): look up the
  * model's physical schema (here: the Spark catalog / a materialized
  * DataFrame), lower-case the types, preserve YAML-declared column case,
  * and emit a merge patch with `config.contract.enforced: true`. */
object Contractor {

  /** Declared-case map from the model's existing YAML entry. */
  def declaredCase(entry: YMap): Map[String, String] =
    entry.get("columns").collect { case YList(cs) => cs }.getOrElse(Vector.empty)
      .collect { case c: YMap => c("name").asStr }
      .map(n => n.toLowerCase -> n).toMap

  /** Plan a contract for `model` from the schema of its relation in
    * `spark` (falls back to the model's graft view name). */
  def generateContract(spark: SparkSession, model: ModelNode,
      viewName: String, existingEntry: YMap = YMap.empty,
      patchPathDefault: ModelNode => String = PatchPaths.default): ResourceChange = {
    val schema = spark.table(viewName).schema
    val data = Contracts.contractPatch(schema, declaredCase(existingEntry))
    val op = if (model.patchPath.isDefined) Operation.Update else Operation.Add
    ResourceChange(op, EntityType.Model, model.name,
      model.patchPath.getOrElse(patchPathDefault(model)), data)
  }

  /** Plan a contract from a dbt-core `catalog.json` entry instead of a
    * live Spark relation — the reference's cached-crawl path
    * (`dbt_projects.py:279-290` + `utilities/contractor.py:16-31`). Lets
    * `graft contract` run against warehouses graft never materialized. */
  def generateContractFromCatalog(model: ModelNode,
      entry: graft.core.parse.CatalogJson.Entry,
      existingEntry: YMap = YMap.empty,
      patchPathDefault: ModelNode => String = PatchPaths.default): ResourceChange = {
    val data = Contracts.contractPatchFromCatalog(
      entry.columns, declaredCase(existingEntry))
    val op = if (model.patchPath.isDefined) Operation.Update else Operation.Add
    ResourceChange(op, EntityType.Model, model.name,
      model.patchPath.getOrElse(patchPathDefault(model)), data)
  }
}
