package graft.mesh

import graft.core.model._

/** Hand-built manifests for mesh-operator specs — a jaffle-shop-shaped
  * mini project (staging → marts chain with a source, macro, exposure). */
object Fixtures {

  def model(proj: String, name: String, code: String,
      deps: Seq[String] = Nil, macros: Seq[String] = Nil,
      patchPath: Option[String] = None, group: Option[String] = None,
      language: String = "sql", relation: Option[String] = None): ModelNode =
    ModelNode(
      uniqueId = s"model.$proj.$name", name = name, packageName = proj,
      filePath = s"models/$name.${if (language == "python") "py" else "sql"}",
      rawCode = code, language = language,
      dependsOn = DependsOn(nodes = deps.toVector, macros = macros.toVector),
      patchPath = patchPath, group = group,
      relationName = Some(relation.getOrElse(s"main.$proj.$name")))

  /** stg_orders -> orders -> report, stg_orders reads source raw.orders. */
  def chain(proj: String = "jaffle"): Manifest = {
    val src = SourceDefinition(s"source.$proj.raw.orders", "orders", "raw",
      proj, "models/staging/__sources.yml",
      relationName = Some("main.raw.orders"))
    val stg = model(proj, "stg_orders",
      "select * from {{ source('raw', 'orders') }}",
      deps = Seq(src.uniqueId))
    val orders = model(proj, "orders",
      "select * from {{ ref('stg_orders') }}",
      deps = Seq(stg.uniqueId), patchPath = Some("models/__models.yml"))
    val report = model(proj, "report",
      "select count(*) from {{ ref('orders') }}",
      deps = Seq(orders.uniqueId))
    val exposure = Exposure(s"exposure.$proj.dash", "dash", proj,
      "models/__exposures.yml",
      DependsOn(nodes = Vector(orders.uniqueId)),
      refStrings = Vector("ref('orders')"))
    Manifest(proj,
      nodes = Map(stg.uniqueId -> stg, orders.uniqueId -> orders,
        report.uniqueId -> report),
      sources = Map(src.uniqueId -> src),
      exposures = Map(exposure.uniqueId -> exposure))
  }
}
