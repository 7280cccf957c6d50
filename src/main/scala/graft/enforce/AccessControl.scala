package graft.enforce

import graft.core.model.{AccessType, Manifest}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.SparkSessionExtensions

/** Runtime teeth for model `access` / `group` governance (SURVEY §4 item 1):
  * a query executing on behalf of (project, group) may read
  *   - any `public` model,
  *   - `protected` models of the same project,
  *   - `private` models only within the same group.
  * dbt-core enforces this at parse time; on Spark the natural hook is plan
  * analysis — we walk the unresolved relations of a plan and fail before
  * execution.
  */
object AccessControl {

  final case class Grant(project: String, group: Option[String], access: AccessType)

  final case class Context(project: String, group: Option[String])

  final case class MeshAccessViolation(relation: String, grant: Grant, ctx: Context)
    extends RuntimeException(
      s"access violation: ${ctx.project}${ctx.group.fold("")(g => s" (group $g)")} " +
        s"cannot read ${grant.access.name} relation `$relation` of ${grant.project}" +
        grant.group.fold("")(g => s" (group $g)"))

  /** registry: relation/view name (lowercase) -> grant. Session-scoped
    * state set up by the Runner (or by users registering their mesh). */
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Grant]()
  @volatile private var context: Option[Context] = None

  def register(relation: String, grant: Grant): Unit =
    registry.put(relation.toLowerCase, grant)
  def registerManifest(m: Manifest, viewName: String => String): Unit =
    m.nodes.values.foreach(n =>
      register(viewName(n.name), Grant(m.projectName, n.group, n.access)))
  def setContext(ctx: Option[Context]): Unit = context = ctx
  def clear(): Unit = { registry.clear(); context = None }

  def checkRelation(name: String): Unit = {
    val ctx = context.getOrElse(return)
    val grant = Option(registry.get(name.toLowerCase)).getOrElse(return)
    val ok = grant.access match {
      case AccessType.Public => true
      case AccessType.Protected => grant.project == ctx.project
      case AccessType.Private =>
        grant.project == ctx.project && grant.group == ctx.group
    }
    if (!ok) throw MeshAccessViolation(name, grant, ctx)
  }

  /** Walk a (possibly unresolved) plan and enforce every table reference. */
  def checkPlan(plan: LogicalPlan): Unit =
    plan.foreach {
      case u: UnresolvedRelation => checkRelation(u.multipartIdentifier.mkString("."))
      case _ => ()
    }

  /** Enforce on raw SQL using the session parser (no execution). */
  def checkSql(spark: SparkSession, sql: String): Unit =
    checkPlan(spark.sessionState.sqlParser.parsePlan(sql))
}

/** Analysis-time rule: fails any query that touches a governed relation it
  * may not read. Inject with
  * `.withExtensions(new graft.enforce.MeshExtensions)` or
  * `spark.sql.extensions=graft.enforce.MeshExtensions`. */
class AccessRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    AccessControl.checkPlan(plan)
    plan
  }
}

class MeshExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectResolutionRule(_ => new AccessRule)
}
