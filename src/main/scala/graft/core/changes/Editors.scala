package graft.core.changes

import graft.core.yaml._
import java.nio.file.{Files, Path, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

/** Pure YAML-entry edit kernels (testable without I/O) + the file-backed
  * editors dispatched by the processor (`storage/file_content_editors.py`,
  * `storage/file_manager.py`).
  */
object ResourceFileEditor {

  /** Canonical key order for model entries
    * (`storage/file_content_editors.py:57-78`): identity keys first,
    * governance keys next, columns last. */
  private val keyOrder = Vector(
    "name", "description", "latest_version", "access", "group", "config",
    "meta", "tests", "versions", "columns")

  def formatResource(m: YMap): YMap = {
    val (known, unknown) = m.entries.partition { case (k, _) => keyOrder.contains(k) }
    val sorted = known.sortBy { case (k, _) => keyOrder.indexOf(k) }
    val (cols, rest) = sorted.partition(_._1 == "columns")
    YMap(rest ++ unknown ++ cols)
  }

  /** Merge `data` for entry `identifier` under `pluralKey` into properties
    * document `doc` (Add and Update share semantics: deep merge via
    * NamedList-indexed safeUpdate; `storage/file_content_editors.py:164-244`).
    * When `sourceName` is set the edit targets the *source* entry keyed by
    * that name (`update_resource`, file_content_editors.py:165-176): `data`
    * is the source-entry payload carrying the table under `tables`, and the
    * recursive NamedList merge lands the table by name without clobbering
    * the stanza's other tables. */
  def upsertEntry(doc: YMap, pluralKey: String, identifier: String, data: YMap,
      sourceName: Option[String] = None): YMap = {
    val base = doc.get(pluralKey) match {
      case Some(l: YList) => l
      case _ => YList(Vector.empty)
    }
    val entryKey = sourceName.getOrElse(identifier)
    val idxField = if (pluralKey == "versions") "v" else "name"
    val existingIdx = base.items.indexWhere {
      case m: YMap => m.get("name").exists(_.asStr == entryKey)
      case _ => false
    }
    val withName = if (data.contains("name")) data else
      YMap(("name" -> (YStr(entryKey): Y)) +: data.entries)
    val merged =
      if (existingIdx >= 0) {
        val cur = base.items(existingIdx).asMap
        val curIdx = Merge.toIndexed(cur, idxField).asMap
        val newIdx = Merge.toIndexed(withName, idxField).asMap
        Merge.fromIndexed(Merge.safeUpdate(curIdx, newIdx), idxField).asMap
      } else withName
    val formatted = if (pluralKey == "models") formatResource(merged) else merged
    val newList =
      if (existingIdx >= 0) YList(base.items.updated(existingIdx, formatted))
      else YList(base.items :+ (formatted: Y))
    val withVersion = if (doc.contains("version")) doc else
      YMap(("version" -> (YInt(2): Y)) +: doc.entries)
    withVersion.updated(pluralKey, newList)
  }

  /** Remove entry `identifier`; for sources, `sourceName` scopes a nested
    * table removal with empty-source cleanup. Returns None when only
    * `version:` remains → delete the file
    * (`storage/file_content_editors.py:219-244`). */
  def removeEntry(doc: YMap, pluralKey: String, identifier: String,
      sourceName: Option[String]): Option[YMap] = {
    val base = doc.get(pluralKey) match {
      case Some(l: YList) => l
      case _ => YList(Vector.empty)
    }
    val newList: YList = sourceName match {
      case Some(src) =>
        YList(base.items.flatMap {
          case m: YMap if m.get("name").exists(_.asStr == src) =>
            val tables = m.get("tables") match {
              case Some(l: YList) => l
              case _ => YList(Vector.empty)
            }
            val remaining = YList(tables.items.filterNot {
              case t: YMap => t.get("name").exists(_.asStr == identifier)
              case _ => false
            })
            if (remaining.items.isEmpty) None
            else Some(m.updated("tables", remaining): Y)
          case other => Some(other)
        })
      case None =>
        YList(base.items.filterNot {
          case m: YMap => m.get("name").exists(_.asStr == identifier)
          case _ => false
        })
    }
    val newDoc =
      if (newList.items.isEmpty) doc.removed(pluralKey)
      else doc.updated(pluralKey, newList)
    if (newDoc.keys.forall(_ == "version")) None else Some(newDoc)
  }
}

/** Executes changes against the filesystem. Root-relative paths. */
final class FileEditors(root: Path) {

  private def abs(p: String): Path = {
    val raw = Paths.get(p)
    if (raw.isAbsolute) raw else root.resolve(p)
  }

  private def readDoc(p: Path): YMap =
    if (Files.exists(p)) Yaml.parseMap(Files.readString(p)) else YMap.empty

  private def writeDoc(p: Path, doc: YMap): Unit = {
    Files.createDirectories(p.getParent)
    Files.writeString(p, Yaml.dump(doc))
  }

  def apply(change: Change): Unit = change match {
    case rc: ResourceChange =>
      val plural = rc.entityType.pluralKey.getOrElse(
        throw new IllegalArgumentException(s"${rc.entityType.name} is not YAML-backed"))
      val p = abs(rc.path)
      rc.op match {
        case Operation.Add | Operation.Update | Operation.Append =>
          writeDoc(p, ResourceFileEditor.upsertEntry(
            readDoc(p), plural, rc.identifier, rc.data, rc.sourceName))
        case Operation.Remove =>
          ResourceFileEditor.removeEntry(readDoc(p), plural, rc.identifier, rc.sourceName) match {
            case Some(doc) => writeDoc(p, doc)
            case None => Files.deleteIfExists(p)
          }
        case Operation.Move =>
          // move = remove from source file (sourceName carries it) handled
          // by planners as Remove+Add pairs; direct Move unsupported here
          throw new IllegalArgumentException("ResourceChange Move must be planned as Remove+Add")
        case Operation.Copy =>
          throw new IllegalArgumentException("ResourceChange Copy is not defined")
      }

    case fc: FileChange =>
      val p = abs(fc.path)
      fc.op match {
        case Operation.Add | Operation.Update =>
          Files.createDirectories(p.getParent)
          Files.writeString(p, fc.data.getOrElse(""))
        case Operation.Append =>
          Files.createDirectories(p.getParent)
          Files.writeString(p, fc.data.getOrElse(""),
            StandardOpenOption.CREATE, StandardOpenOption.APPEND)
        case Operation.Copy =>
          val src = abs(fc.source.getOrElse(throw new IllegalArgumentException("Copy needs source")))
          Files.createDirectories(p.getParent)
          Files.copy(src, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        case Operation.Move =>
          val src = abs(fc.source.getOrElse(throw new IllegalArgumentException("Move needs source")))
          Files.createDirectories(p.getParent)
          Files.move(src, p, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        case Operation.Remove =>
          Files.deleteIfExists(p)
      }

    case dc: DirectoryChange =>
      val p = abs(dc.path)
      dc.op match {
        case Operation.Copy =>
          val src = abs(dc.source.getOrElse(throw new IllegalArgumentException("Copy needs source")))
          copyTree(src, p, dc.ignore)
        case Operation.Add => Files.createDirectories(p)
        case Operation.Remove => deleteTree(p)
        case other => throw new IllegalArgumentException(s"directory op ${other.verb} unsupported")
      }
  }

  private def copyTree(src: Path, dst: Path, ignore: Seq[String]): Unit = {
    Files.walk(src).iterator().asScala.foreach { s =>
      val rel = src.relativize(s).toString
      val skip = ignore.exists(pat => rel.split('/').exists(seg =>
        if (pat.contains("*")) seg.matches(pat.replace(".", "\\.").replace("*", ".*")) else seg == pat))
      if (!skip && rel.nonEmpty) {
        val d = dst.resolve(rel)
        if (Files.isDirectory(s)) Files.createDirectories(d)
        else {
          Files.createDirectories(d.getParent)
          Files.copy(s, d, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
    }
  }

  private def deleteTree(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder[Path]())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
}

final case class ChangeSetProcessorException(step: Change, cause: Throwable)
  extends RuntimeException(s"failed applying: ${step.describe}", cause)

/** Sequential, fail-fast interpreter (`change_set_processor.py:24-61`).
  * Dry-run logs the plan without touching the filesystem. */
final class ChangeSetProcessor(root: Path, dryRun: Boolean = false,
    log: String => Unit = _ => ()) {
  def process(sets: Seq[ChangeSet]): Unit = {
    val editors = new FileEditors(root)
    val flat = sets.flatMap(_.changes)
    val steps = flat.size
    flat.zipWithIndex.foreach { case (c, i) =>
      log(s"[${i + 1}/$steps] ${c.describe}")
      if (!dryRun) {
        try editors(c)
        catch { case e: Throwable => throw ChangeSetProcessorException(c, e) }
      }
    }
  }
}
