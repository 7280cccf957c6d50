package graft.enforce

import graft.core.model.{AccessType, Manifest}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
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
  *
  * All state is scoped per SparkSession (a [[MeshRegistry]] held in a weak
  * map keyed by session), so concurrent Runners on different sessions never
  * observe each other's grants. Within one session the Runner never relies
  * on the mutable ambient context either: it passes an explicit [[Context]]
  * to [[MeshRegistry.checkPlan]], so concurrent DAG subtrees of one session
  * are also race-free. The ambient `context` field only serves ad-hoc user
  * SQL flowing through the injected analysis rule.
  */
object AccessControl {

  final case class Grant(project: String, group: Option[String], access: AccessType)

  final case class Context(project: String, group: Option[String])

  final case class MeshAccessViolation(relation: String, grant: Grant, ctx: Context)
    extends RuntimeException(
      s"access violation: ${ctx.project}${ctx.group.fold("")(g => s" (group $g)")} " +
        s"cannot read ${grant.access.name} relation `$relation` of ${grant.project}" +
        grant.group.fold("")(g => s" (group $g)"))

  /** Session-scoped governance state: relation/view name (lowercase) ->
    * grant, plus the ambient identity ad-hoc queries run as. */
  final class MeshRegistry {
    private val grants = new java.util.concurrent.ConcurrentHashMap[String, Grant]()
    @volatile private var ambient: Option[Context] = None

    def register(relation: String, grant: Grant): Unit =
      grants.put(relation.toLowerCase, grant)

    def registerManifest(m: Manifest, viewName: String => String): Unit =
      m.nodes.values.foreach(n =>
        register(viewName(n.name), Grant(m.projectName, n.group, n.access)))

    /** Identity for ad-hoc queries checked by the injected AccessRule. */
    def setContext(ctx: Option[Context]): Unit = ambient = ctx
    def context: Option[Context] = ambient

    def clear(): Unit = { grants.clear(); ambient = None }

    def checkRelation(name: String, ctx: Context): Unit = {
      val grant = Option(grants.get(name.toLowerCase)).getOrElse(return)
      val ok = grant.access match {
        case AccessType.Public => true
        case AccessType.Protected => grant.project == ctx.project
        case AccessType.Private =>
          grant.project == ctx.project && grant.group == ctx.group
      }
      if (!ok) throw MeshAccessViolation(name, grant, ctx)
    }

    /** Walk a plan, enforcing every table reference under an explicit
      * identity. Handles BOTH unresolved plans (parsed SQL — the Runner's
      * pre-execution check) and resolved ones: when the injected rule
      * fires, the built-in resolution rules in the same fixed-point batch
      * have usually already replaced `UnresolvedRelation`s with
      * `SubqueryAlias`-wrapped view plans, so governed names are matched
      * on the alias identifier too. */
    def checkPlan(plan: LogicalPlan, ctx: Context): Unit =
      plan.foreach {
        case u: UnresolvedRelation =>
          checkRelation(u.multipartIdentifier.mkString("."), ctx)
        case sa: SubqueryAlias =>
          checkRelation(
            (sa.identifier.qualifier :+ sa.identifier.name).mkString("."), ctx)
        case _ => ()
      }

    /** Enforce on raw SQL using the session parser (no execution). */
    def checkSql(spark: SparkSession, sql: String, ctx: Context): Unit =
      checkPlan(spark.sessionState.sqlParser.parsePlan(sql), ctx)
  }

  // Weak keys: a dropped SparkSession must not leak its registry.
  private val sessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, MeshRegistry]())

  /** The governance registry for this session (created on first use). */
  def forSession(spark: SparkSession): MeshRegistry =
    sessions.computeIfAbsent(spark, _ => new MeshRegistry)

  /** Registry only if one was ever created for this session. */
  def get(spark: SparkSession): Option[MeshRegistry] =
    Option(sessions.get(spark))
}

/** Analysis-time rule: fails any query that touches a governed relation the
  * session's ambient context may not read. Inject with
  * `.withExtensions(new graft.enforce.MeshExtensions)` or
  * `spark.sql.extensions=graft.enforce.MeshExtensions`. */
class AccessRule(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = {
    for {
      reg <- AccessControl.get(session)
      ctx <- reg.context
    } reg.checkPlan(plan, ctx)
    plan
  }
}

class MeshExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    e.injectResolutionRule(session => new AccessRule(session))
}
