package graft.fm

import java.nio.file.Path
import java.{util => ju}
import scala.jdk.CollectionConverters._

/** Frontmatter write-back operators (reference `server.py:237-660`,
  * `files.py:110-150`): single + batch set/unset and the five array
  * mutations, with the exact skip/warn/create decision tables.
  *
  * These are filesystem sinks, sequential per-file like the reference —
  * not shuffle operators. At scale the per-file rewrite distributes
  * trivially (ship the path list to executors with `foreachPartition`,
  * one rewrite per file, no cross-file state); see
  * [[Mutations.batchUpdateDistributed]].
  */
object Mutations {

  final case class UpdateResult(path: String, frontmatter: Map[String, Any])

  /** `updatedCount` is always the EXACT total; `updatedFiles`/`warnings`
    * are the full lists (reference parity) unless the batch exceeded the
    * listing cap, in which case they hold the first N entries and
    * `listTruncated` is set (see [[Settings.maxListed]]).
    */
  final case class BatchResult(
      updatedCount: Int,
      updatedFiles: Seq[String],
      warnings: Seq[String],
      listTruncated: Boolean = false)

  /** `update_file` (`files.py:110-150`): apply `set` (minus unset-shadowed
    * keys), pop `unset`, write only when something was requested; creates
    * frontmatter if absent, preserves the body.
    */
  def updateFile(
      path: Path,
      baseDir: Path,
      setValues: Map[String, Any] = Map.empty,
      unset: Seq[String] = Nil): UpdateResult = {
    val post = Frontmatter.load(path)
    setValues.foreach { case (k, v) =>
      if (!unset.contains(k)) post.metadata.put(k, v)
    }
    unset.foreach(post.metadata.remove)
    if (setValues.nonEmpty || unset.nonEmpty) Frontmatter.dump(post, path)
    UpdateResult(baseDir.relativize(path).toString, post.metadata.asScala.toMap)
  }

  /** `update` tool (`server.py:237-263`): sandbox-validated single-file
    * update; throws on escape/missing like the reference.
    */
  def update(
      baseDir: Path,
      relPath: String,
      setValues: Map[String, Any] = Map.empty,
      unset: Seq[String] = Nil): UpdateResult =
    updateFile(FileScan.resolve(baseDir, relPath), baseDir, setValues, unset)

  private sealed trait Outcome
  private final case class Updated(rel: String) extends Outcome
  private case object Skip extends Outcome
  private final case class Warn(msg: String) extends Outcome

  /** Shared batch loop (`server.py:289-306` shape): per-file sandbox check
    * and op, with per-file failures appended to warnings, never raised.
    */
  private def batchLoop(baseDir: Path, glob: String)(
      op: (Path, String) => Outcome): BatchResult = {
    val updated = Seq.newBuilder[String]
    val warnings = Seq.newBuilder[String]
    FileScan.collect(baseDir, glob).foreach { rel =>
      val relPath = rel.toString
      val absOpt =
        try Some(FileScan.resolve(baseDir, relPath))
        catch { case e: Exception => warnings += String.valueOf(e.getMessage); None }
      absOpt.foreach { abs =>
        try {
          op(abs, relPath) match {
            case Updated(r) => updated += r
            case Warn(w)    => warnings += w
            case Skip       => ()
          }
        } catch {
          case e: Exception => warnings += s"Failed to update $relPath: ${e.getMessage}"
        }
      }
    }
    val files = updated.result()
    BatchResult(files.length, files, warnings.result())
  }

  /** `batch_update` (`server.py:266-308`). */
  def batchUpdate(
      baseDir: Path,
      glob: String,
      setValues: Map[String, Any] = Map.empty,
      unset: Seq[String] = Nil): BatchResult =
    batchLoop(baseDir, glob) { (abs, rel) =>
      updateFile(abs, baseDir, setValues, unset)
      Updated(rel)
    }

  /** `batch_array_add` (`server.py:311-377`): create `[value]` if the
    * property is missing; warn+skip non-arrays; skip duplicates unless
    * allowed; an array value appends as a single element.
    */
  def batchArrayAdd(
      baseDir: Path,
      glob: String,
      property: String,
      value: Any,
      allowDuplicates: Boolean = false): BatchResult =
    batchLoop(baseDir, glob) { (abs, rel) =>
      val post = Frontmatter.load(abs)
      post.metadata.get(property) match {
        case null =>
          val arr = new ju.ArrayList[Any](); arr.add(value)
          post.metadata.put(property, arr)
          Frontmatter.dump(post, abs)
          Updated(rel)
        case l: ju.List[_] =>
          val list = l.asInstanceOf[ju.List[Any]]
          if (!allowDuplicates && PyOps.contains(list, value)) Skip
          else {
            list.add(value)
            Frontmatter.dump(post, abs)
            Updated(rel)
          }
        case _ => Warn(s"Skipped $rel: '$property' is not an array")
      }
    }

  /** `batch_array_remove` (`server.py:380-442`): removes the FIRST
    * occurrence (Python `list.remove`); skip missing property/value.
    */
  def batchArrayRemove(baseDir: Path, glob: String, property: String, value: Any): BatchResult =
    batchLoop(baseDir, glob) { (abs, rel) =>
      val post = Frontmatter.load(abs)
      post.metadata.get(property) match {
        case null => Skip
        case l: ju.List[_] =>
          val list = l.asInstanceOf[ju.List[Any]]
          PyOps.indexOf(list, value) match {
            case -1 => Skip
            case i =>
              list.remove(i)
              Frontmatter.dump(post, abs)
              Updated(rel)
          }
        case _ => Warn(s"Skipped $rel: '$property' is not an array")
      }
    }

  /** `batch_array_replace` (`server.py:445-510`): replaces the FIRST
    * occurrence (Python `list.index`).
    */
  def batchArrayReplace(
      baseDir: Path, glob: String, property: String, oldValue: Any, newValue: Any): BatchResult =
    batchLoop(baseDir, glob) { (abs, rel) =>
      val post = Frontmatter.load(abs)
      post.metadata.get(property) match {
        case null => Skip
        case l: ju.List[_] =>
          val list = l.asInstanceOf[ju.List[Any]]
          PyOps.indexOf(list, oldValue) match {
            case -1 => Skip
            case i =>
              list.set(i, newValue)
              Frontmatter.dump(post, abs)
              Updated(rel)
          }
        case _ => Warn(s"Skipped $rel: '$property' is not an array")
      }
    }

  /** `batch_array_sort` (`server.py:513-588`): skip len<=1 and
    * already-sorted (pairwise check); Python `sorted()` on incomparable
    * mixed types raises TypeError, surfaced as a Failed-to-update warning.
    */
  def batchArraySort(
      baseDir: Path, glob: String, property: String, reverse: Boolean = false): BatchResult =
    batchLoop(baseDir, glob) { (abs, rel) =>
      val post = Frontmatter.load(abs)
      post.metadata.get(property) match {
        case null => Skip
        case l: ju.List[_] =>
          val list = l.asInstanceOf[ju.List[Any]].asScala.toSeq
          if (list.length <= 1) Skip
          else {
            val isSorted = list.zip(list.tail).forall { case (a, b) =>
              val c = PyOps.pyCompare(a, b) // may throw PyTypeError, becomes a warning
              if (reverse) c >= 0 else c <= 0
            }
            if (isSorted) Skip
            else {
              val ord = if (reverse) PyOps.ordering.reverse else PyOps.ordering
              val sorted = list.sorted(ord) // stable, like Python sorted()
              post.metadata.put(property, new ju.ArrayList[Any](sorted.asJava))
              Frontmatter.dump(post, abs)
              Updated(rel)
            }
          }
        case _ => Warn(s"Skipped $rel: '$property' is not an array")
      }
    }

  /** `batch_array_unique` (`server.py:591-660`): dedup preserving first
    * occurrence (`dict.fromkeys`); skip len<=1 and no-dup arrays.
    */
  def batchArrayUnique(baseDir: Path, glob: String, property: String): BatchResult =
    batchLoop(baseDir, glob) { (abs, rel) =>
      val post = Frontmatter.load(abs)
      post.metadata.get(property) match {
        case null => Skip
        case l: ju.List[_] =>
          val list = l.asInstanceOf[ju.List[Any]].asScala.toSeq
          if (list.length <= 1) Skip
          else {
            val unique = list.foldLeft(Vector.empty[Any]) { (acc, v) =>
              if (acc.exists(PyOps.pyEquals(_, v))) acc else acc :+ v
            }
            if (unique.length == list.length) Skip
            else {
              post.metadata.put(property, new ju.ArrayList[Any](unique.asJava))
              Frontmatter.dump(post, abs)
              Updated(rel)
            }
          }
        case _ => Warn(s"Skipped $rel: '$property' is not an array")
      }
    }

  /** Scale path for batch_update: ship the matched paths to executors and
    * rewrite per-partition — same per-file semantics, no cross-file state;
    * warning order becomes partition order. Use when the match set is too
    * large for a driver loop.
    */
  def batchUpdateDistributed(
      spark: org.apache.spark.sql.SparkSession,
      baseDir: Path,
      glob: String,
      setValues: Map[String, Any] = Map.empty,
      unset: Seq[String] = Nil,
      maxListed: Int = Settings.maxListed()): BatchResult = {
    import spark.implicits._
    val base = baseDir.toString
    val rels = FileScan.collect(baseDir, glob).map(_.toString).sorted
    val cap = math.max(1, maxListed)
    // ONE pass, bounded driver state: each partition returns exact
    // counts plus at most `cap` paths/warnings, so the driver holds
    // O(partitions * cap) strings instead of one entry per matched file
    // (a glob matching 10⁹ files would otherwise OOM the driver; the
    // rewrite itself is side-effecting, so a persist-and-recount scheme
    // could re-run updates on block eviction — a single action cannot).
    // createDataset keeps the sorted path list in contiguous partition
    // ranges, so per-partition prefixes merge into the global sorted
    // prefix.
    val partial = spark
      .createDataset(rels)
      .mapPartitions { it =>
        val bd = java.nio.file.Paths.get(base)
        var nOk = 0L
        var nErr = 0L
        val ok = scala.collection.mutable.ArrayBuffer.empty[String]
        val errs = scala.collection.mutable.ArrayBuffer.empty[String]
        it.foreach { rel =>
          try {
            updateFile(bd.resolve(rel), bd, setValues, unset)
            nOk += 1
            if (ok.length < cap) ok += rel
          } catch {
            case e: Exception =>
              nErr += 1
              if (errs.length < cap) errs += s"Failed to update $rel: ${e.getMessage}"
          }
        }
        Iterator.single((nOk, nErr, ok.toArray, errs.toArray))
      }
      .collect()
    val nOk = partial.map(_._1).sum
    val nErr = partial.map(_._2).sum
    val okFiles = partial.iterator.flatMap(_._3).toArray.sorted
    val errList = partial.iterator.flatMap(_._4).toSeq
    val truncated = nOk > cap || nErr > cap
    val warnings =
      if (nErr <= cap) errList
      else errList.take(cap) :+
        s"... ${nErr - cap} more failures not listed (listing capped at $cap; set FRONTMATTER_MAX_LIST to raise)"
    BatchResult(nOk.toInt, okFiles.take(cap).toSeq, warnings, listTruncated = truncated)
  }
}
