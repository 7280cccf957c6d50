package graft.core.graph

import graft.core.model.Manifest

/** dbt node-selection syntax (the subset the reference's tests exercise:
  * `name`, `+name`, `name+`, `+name+`, space-separated unions, and
  * `--exclude` set-minus; `dbt_projects.py:351-376` shells to `dbt ls` —
  * we evaluate natively over the adjacency maps). Unknown syntax
  * (`tag:`, `path:`, `@`, intersections) fails loudly per SURVEY §7.
  */
object Selector {

  final case class Criterion(ancestors: Boolean, name: String, descendants: Boolean)

  def parseCriterion(token: String): Criterion = {
    if (token.contains(":") || token.startsWith("@") || token.contains(","))
      throw new IllegalArgumentException(
        s"unsupported selector syntax: '$token' (supported: name, +name, name+, unions, exclude)")
    val anc = token.startsWith("+")
    val desc = token.endsWith("+")
    val name = token.stripPrefix("+").stripSuffix("+")
    require(name.nonEmpty, s"empty selector token: '$token'")
    Criterion(anc, name, desc)
  }

  /** Resolve a bare name to resource unique ids (models and sources may
    * share names across packages — all matches are selected, like dbt). */
  private def resolve(manifest: Manifest, name: String): Set[String] = {
    val all = manifest.allResources
    // exact unique_id match wins
    if (all.contains(name)) Set(name)
    else all.collect { case (id, r) if r.name == name => id }.toSet
  }

  /** Evaluate `--select` / `--exclude` to a set of unique ids (A1). */
  def select(manifest: Manifest, select: Seq[String], exclude: Seq[String] = Nil): Set[String] = {
    def eval(tokens: Seq[String]): Set[String] =
      tokens.flatMap { tok =>
        val c = parseCriterion(tok)
        val base = resolve(manifest, c.name)
        base ++
          (if (c.ancestors) base.flatMap(Dag.ancestors(manifest.parentMap, _)) else Set.empty) ++
          (if (c.descendants) base.flatMap(Dag.descendants(manifest.childMap, _)) else Set.empty)
      }.toSet
    eval(select) -- eval(exclude)
  }

  /** Subproject selection = parent selection minus what's already in the
    * subproject (A2, `dbt_projects.py:539-555`). */
  def selectForSubproject(manifest: Manifest, already: Set[String],
      sel: Seq[String], exclude: Seq[String] = Nil): Set[String] =
    select(manifest, sel, exclude) -- already
}
