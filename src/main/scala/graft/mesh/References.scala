package graft.mesh

import graft.core.changes._
import graft.core.model._
import scala.util.matching.Regex

/** Code-rewrite passes (SURVEY §2.D) — regex "compiler passes" over model
  * code, whitespace/quote tolerant like the reference
  * (`utilities/references.py:58-171`).
  */
object References {

  private def q(name: String) = Regex.quote(name)

  /** D1: `{{ ref('m') }}` / `{{ ref('m', v=n) }}` →
    * `{{ ref('proj', 'm'[, v=n]) }}`. */
  def updateSqlRefs(code: String, model: String, project: String): String = {
    val re = (s"""\\{\\{\\s*ref\\s*\\(\\s*(['"])${q(model)}\\1\\s*(,\\s*(?:v|version)\\s*=\\s*\\d+\\s*)?\\)\\s*\\}\\}""").r
    re.replaceAllIn(code, m => {
      val v = Option(m.group(2)).getOrElse("")
      Regex.quoteReplacement(s"{{ ref('$project', '$model'$v) }}")
    })
  }

  /** D2: `{{ source('src','tbl') }}` → `{{ ref('proj','model') }}`. */
  def updateSqlSourceToRef(code: String, sourceName: String, table: String,
      project: String, model: String): String = {
    val re = (s"""\\{\\{\\s*source\\s*\\(\\s*(['"])${q(sourceName)}\\1\\s*,\\s*(['"])${q(table)}\\2\\s*\\)\\s*\\}\\}""").r
    re.replaceAllIn(code, Regex.quoteReplacement(s"{{ ref('$project', '$model') }}"))
  }

  /** D3: `dbt.ref('m')` → `dbt.ref('proj', 'm')` (Python models). */
  def updatePythonRefs(code: String, model: String, project: String): String = {
    val re = (s"""dbt\\.ref\\s*\\(\\s*(['"])${q(model)}\\1\\s*\\)""").r
    re.replaceAllIn(code, Regex.quoteReplacement(s"""dbt.ref("$project", "$model")"""))
  }

  /** D4: `dbt.source('s','t')` → `dbt.ref("proj","model")`. */
  def updatePythonSourceToRef(code: String, sourceName: String, table: String,
      project: String, model: String): String = {
    val re = (s"""dbt\\.source\\s*\\(\\s*(['"])${q(sourceName)}\\1\\s*,\\s*(['"])${q(table)}\\2\\s*\\)""").r
    re.replaceAllIn(code, Regex.quoteReplacement(s"""dbt.ref("$project", "$model")"""))
  }

  /** D5a: exposure depends_on ref-string swap. YAML ref strings are BARE
    * `ref('m')` (no `{{ }}`), and the rewrite emits the bare two-arg form
    * (`update_yml_resource_references`, utilities/references.py:150-171). */
  def updateRefString(refString: String, model: String, project: String): String = {
    val re = (s"""ref\\s*\\(\\s*(['"])${q(model)}\\1\\s*(,\\s*(?:v|version)\\s*=\\s*\\d+\\s*)?\\)""").r
    re.replaceAllIn(refString, m => {
      val v = Option(m.group(2)).getOrElse("")
      Regex.quoteReplacement(s"ref('$project', '$model'$v)")
    })
  }

  /** D6: dispatch by language (`utilities/references.py:173-213`),
    * threading any pending FileChange for the same file (D7/D8 chaining,
    * `utilities/references.py:24-42`). */
  def generateReferenceUpdate(project: String, upstream: ModelNode,
      downstream: Resource, codeNow: String): FileChange = {
    val updated = downstream match {
      case m: ModelNode if m.language == "python" =>
        updatePythonRefs(codeNow, upstream.name, project)
      case _ => updateSqlRefs(codeNow, upstream.name, project)
    }
    FileChange(Operation.Update, pathOf(downstream), Some(updated))
  }

  private def pathOf(r: Resource): String = r.filePath

  /** current text of a resource's code file: the latest pending change in
    * `pending` wins over `readFile` (compose-over-unwritten-state). */
  def currentCode(pending: ChangeSet, path: String, readFile: String => String): String =
    pending.latestFileChange(path).flatMap(_.data).getOrElse(readFile(path))

  /** D7: for each out-of-subproject child of the moved models, rewrite its
    * refs to cross-project form (`utilities/references.py:261-308`). */
  def childRefUpdates(manifest: Manifest, subProject: String, moved: Set[String],
      readFile: String => String): ChangeSet = {
    val movedModels = moved.flatMap(manifest.nodes.get)
    movedModels.foldLeft(ChangeSet()) { case (acc, up) =>
      val children = manifest.childMap.getOrElse(up.uniqueId, Set.empty)
        .filterNot(moved).filterNot(_.startsWith("test."))
      children.toSeq.sorted.flatMap(manifest.allResources.get).foldLeft(acc) {
        case (cs, child: ModelNode) =>
          val code = currentCode(cs, child.filePath, readFile)
          cs + generateReferenceUpdate(subProject, up, child, code)
        case (cs, child: Exposure) =>
          // REBUILD the list like update_yml_resource_references
          // (references.py:150-171): normalize every ref string, drop the
          // one matching the moved model, append the cross-project ref
          val kept = child.refStrings.flatMap(s =>
            graft.core.parse.JinjaLite.findBareRefs(s).headOption)
            .filterNot(r => r.project.isEmpty && r.name == up.name && r.version.isEmpty)
            .map { r =>
              val proj = r.project.fold("")(p => s"'$p', ")
              val v = r.version.fold("")(v => s", v=$v")
              s"ref($proj'${r.name}'$v)"
            }
          val newRefs = kept :+ s"ref('$subProject', '${up.name}')"
          cs + ResourceChange(Operation.Update, EntityType.Exposure, child.name,
            child.filePath, graft.core.yaml.YMap.of(
              "depends_on" -> graft.core.yaml.YList(newRefs.map(graft.core.yaml.YStr(_)))))
        case (cs, child: SemanticModel) =>
          cs + ResourceChange(Operation.Update, EntityType.SemanticModel, child.name,
            child.filePath, graft.core.yaml.YMap.of(
              "model" -> graft.core.yaml.YStr(
                updateRefString(child.modelRef, up.name, subProject))))
        case (cs, _) => cs
      }
    }
  }

  /** D8: moved models that depend on models left behind rewrite their own
    * refs to the parent project (`utilities/references.py:310-360`).
    * `pathFor` maps a moved model to the path the rewrite is WRITTEN to —
    * the subproject location after the move (the reference resolves paths
    * against the downstream project, `references.py:192-196`); the code is
    * still READ from the original parent path. */
  def parentRefUpdates(manifest: Manifest, parentProject: String, moved: Set[String],
      readFile: String => String,
      pathFor: ModelNode => String = _.filePath): ChangeSet = {
    val leftBehind = moved.flatMap(manifest.parentMap.getOrElse(_, Set.empty))
      .filterNot(moved).flatMap(manifest.nodes.get)
    moved.toSeq.sorted.flatMap(manifest.nodes.get).foldLeft(ChangeSet()) { case (acc, m) =>
      val ups = leftBehind.filter(u => m.dependsOn.nodes.contains(u.uniqueId))
      if (ups.isEmpty) acc
      else {
        val target = pathFor(m)
        val code0 = acc.latestFileChange(target).flatMap(_.data)
          .getOrElse(readFile(m.filePath))
        val updated = ups.foldLeft(code0) { (c, u) =>
          if (m.language == "python") updatePythonRefs(c, u.name, parentProject)
          else updateSqlRefs(c, u.name, parentProject)
        }
        acc + FileChange(Operation.Update, target, Some(updated))
      }
    }
  }

  /** D10: first ref() in macro SQL — if it targets a model left behind in
    * the parent, rewrite to cross-project form
    * (`utilities/references.py:215-259`). `targetPath` is where the
    * rewritten macro is written (the subproject copy). */
  def macroRefUpdate(macroNode: MacroNode, parentProject: String,
      leftBehindModels: Set[String], readFile: String => String,
      targetPath: Option[String] = None): Option[FileChange] = {
    val text = readFile(macroNode.filePath)
    // operate on THIS macro's block (the file may hold several macros —
    // the reference rewrites resource.macro_sql, not the file)
    val block = graft.core.parse.JinjaLite.findBlocks(text, "macro")
      .find(_.name == macroNode.name).map(_.content).getOrElse(text)
    graft.core.parse.JinjaLite.findRefs(block).headOption
      .filter(r => r.project.isEmpty && leftBehindModels.contains(r.name))
      .map { r =>
        Some(FileChange(Operation.Update, targetPath.getOrElse(macroNode.filePath),
          Some(updateSqlRefs(block, r.name, parentProject))))
      }.getOrElse(None)
  }
}
