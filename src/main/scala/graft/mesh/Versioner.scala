package graft.mesh

import graft.core.changes._
import graft.core.model.ModelNode
import graft.core.yaml._

/** C4–C6 — model versioning (`utilities/versioner.py`). */
object Versioner {

  sealed trait Behavior
  object Behavior {
    /** keep latest_version where it is (pre-release the new one) */
    case object Prerelease extends Behavior
    /** latest_version += 1 */
    case object Increment extends Behavior
    /** latest_version = the new max */
    case object Latest extends Behavior
  }

  final case class NonIntegerVersion(v: String)
    extends RuntimeException(s"cannot bump non-integer version: $v")

  /** max integer version from a model YAML entry
    * (`utilities/versioner.py:65-77`; int-only, errors otherwise). */
  def latestModelVersion(entry: YMap): Option[Long] =
    entry.get("versions").collect { case YList(vs) =>
      vs.collect { case m: YMap =>
        m("v") match {
          case YInt(i) => i
          case other => throw NonIntegerVersion(other.asStr)
        }
      }.maxOption
    }.flatten

  /** C4: first version — patch {latest_version:1, versions:[{v:1}]} and
    * Move model.sql → model_v1.sql (or defined_in name); errors if
    * versions already exist (`utilities/versioner.py:79-134`). */
  def addVersion(model: ModelNode, entry: YMap, definedIn: Option[String] = None,
      patchPathDefault: ModelNode => String = PatchPaths.default): ChangeSet = {
    require(latestModelVersion(entry).isEmpty,
      s"model ${model.name} already has versions")
    val v1name = definedIn.getOrElse(s"${model.name}_v1")
    val dir = parentDir(model.filePath)
    val newPath = s"$dir$v1name.${ext(model)}"
    val versionsEntry: Y = definedIn match {
      case Some(d) => YMap.of("v" -> YInt(1), "defined_in" -> YStr(d))
      case None => YMap.of("v" -> YInt(1))
    }
    val patch = ResourceChange(
      if (model.patchPath.isDefined) Operation.Update else Operation.Add,
      EntityType.Model, model.name,
      model.patchPath.getOrElse(patchPathDefault(model)),
      YMap.of("latest_version" -> YInt(1), "versions" -> YList.of(versionsEntry)))
    ChangeSet(Vector(
      patch,
      FileChange(Operation.Move, newPath, None, Some(model.filePath))))
  }

  /** C5: bump — append {v: max+1} (carrying defined_in when given), set
    * latest_version per behavior, Copy the current latest file to
    * model_v{n+1} or the defined_in name
    * (`utilities/versioner.py:136-212`). */
  def bumpVersion(model: ModelNode, entry: YMap, behavior: Behavior,
      currentLatestPath: String, definedIn: Option[String] = None): ChangeSet = {
    val maxV = latestModelVersion(entry).getOrElse(
      throw new IllegalArgumentException(s"model ${model.name} is unversioned; add a version first"))
    val newV = maxV + 1
    val declaredLatest = entry.get("latest_version").collect { case YInt(i) => i }.getOrElse(maxV)
    val newLatest = behavior match {
      case Behavior.Prerelease => declaredLatest
      case Behavior.Increment => declaredLatest + 1
      case Behavior.Latest => newV
    }
    val versions = entry.get("versions").collect { case l: YList => l }.getOrElse(YList(Vector.empty))
    val newVersionEntry: Y = definedIn match {
      case Some(d) => YMap.of("v" -> YInt(newV), "defined_in" -> YStr(d))
      case None => YMap.of("v" -> YInt(newV))
    }
    val newVersions = versions :+ newVersionEntry
    val dir = parentDir(model.filePath)
    val newPath = s"$dir${definedIn.getOrElse(s"${model.name}_v$newV")}.${ext(model)}"
    val patch = ResourceChange(Operation.Update, EntityType.Model, model.name,
      model.patchPath.getOrElse(PatchPaths.default(model)),
      YMap.of("latest_version" -> YInt(newLatest), "versions" -> newVersions))
    ChangeSet(Vector(
      patch,
      FileChange(Operation.Copy, newPath, None, Some(currentLatestPath))))
  }

  /** C6: the `version` command — if unversioned, add then bump, splicing
    * the two ChangeSets: bump's Copy reads the just-moved v1 file and the
    * two model patches fold into one (`main.py:442-553`). */
  def version(model: ModelNode, entry: YMap, behavior: Behavior,
      definedIn: Option[String] = None): ChangeSet = {
    if (latestModelVersion(entry).nonEmpty) {
      bumpVersion(model, entry, behavior, latestPath(model, entry), definedIn)
    } else {
      val added = addVersion(model, entry, definedIn)
      val movedPath = added.changes.collectFirst { case fc: FileChange => fc.path }.get
      // simulate the entry state after `add` for the bump computation
      // (the reference threads this as bump's model_override,
      // `main.py:529-534`)
      val entryAfter = Merge.safeUpdate(entry, YMap.of(
        "latest_version" -> YInt(1),
        "versions" -> YList.of(YMap.of("v" -> YInt(1)))))
      val bumped = bumpVersion(model, entryAfter, behavior, movedPath, definedIn)
      // splice: merge the two model patches into one (dedup), keep the
      // Move (from add) and the Copy (from bump) in order
      val addPatch = added.changes.collectFirst { case rc: ResourceChange => rc }.get
      val bumpPatch = bumped.changes.collectFirst { case rc: ResourceChange => rc }.get
      val mergedData = Merge.safeUpdate(addPatch.data, bumpPatch.data)
      // versions list must contain both v1 and v2
      val fullVersions = YList(
        addPatch.data("versions").asList.items ++
          bumpPatch.data("versions").asList.items.filterNot(
            addPatch.data("versions").asList.items.contains(_)))
      val splicedPatch = addPatch.copy(data = mergedData.updated("versions", fullVersions))
      ChangeSet(Vector(
        splicedPatch,
        added.changes.collectFirst { case fc: FileChange => fc }.get,
        bumped.changes.collectFirst { case fc: FileChange => fc }.get))
    }
  }

  /** Path of the file holding the current latest version (honors
    * defined_in of the latest version entry). */
  def latestPath(model: ModelNode, entry: YMap): String = {
    val dir = parentDir(model.filePath)
    val latest = entry.get("latest_version").collect { case YInt(i) => i }
      .orElse(latestModelVersion(entry)).getOrElse(1L)
    val definedIn = entry.get("versions").collect { case YList(vs) =>
      vs.collectFirst { case m: YMap if m.get("v").contains(YInt(latest)) =>
        m.get("defined_in").map(_.asStr)
      }.flatten
    }.flatten
    s"$dir${definedIn.getOrElse(s"${model.name}_v$latest")}.${ext(model)}"
  }

  /** versioned file extension follows the model's language
    * (`versioner.py:102-106` uses `model.language`). */
  private def ext(model: ModelNode): String = {
    val i = model.filePath.lastIndexOf('.')
    if (i < 0) "sql" else model.filePath.substring(i + 1)
  }

  private def parentDir(path: String): String = {
    val i = path.lastIndexOf('/')
    if (i < 0) "" else path.substring(0, i + 1)
  }
}
