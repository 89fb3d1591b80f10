package graft

import java.io.{File, IOException}
import java.net.URI

import org.apache.hadoop.fs.{FileStatus, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission

/**
 * A test `FileSystem` with OBJECT-STORE failure semantics, for exercising
 * the StoreIO commit protocol under the conditions it exists for (VERDICT
 * r17 next #1: the manifest-log protocol's S3 safety claim was structural
 * — forced via `graft.store.commit=log` on a local FS whose rename is
 * still atomic — never demonstrated under non-atomic rename, kill points,
 * or lagging listings).
 *
 * Registered under the `faulty` scheme (not in StoreIO's
 * `RenameAtomicSchemes`, so `commit=auto` selects the manifest log exactly
 * as it would for `s3a://`), delegating storage to the local filesystem:
 *
 *  - `rename` is COPY-THEN-DELETE, never atomic: the destination appears
 *    as one complete object (modeling an atomic PUT — the copy lands via
 *    a hidden temp + local rename), then the source is deleted. Kill
 *    points can fire before the copy, between PUT and delete (both
 *    halves visible — the classic S3 rename crash), and after the delete
 *    but before the caller learns of success.
 *  - `create` can kill before any byte exists, or mid-write — leaving a
 *    TORN, VISIBLE file (weaker than real S3, which aborts multipart
 *    uploads; a protocol safe under torn visibility is safe under both).
 *  - `listStatus` can LAG writes (hide freshly committed paths from the
 *    next listings) and serve PHANTOMS (list already-deleted paths for
 *    the next N listings — a reader racing log GC).
 *
 * All injection state is JVM-global (companion object), so executor-side
 * instances in local mode share it. Arm points are one-shot.
 */
class FaultyFs extends RawLocalFileSystem {
  import FaultyFs._

  override def getScheme: String = "faulty"
  override def getUri: URI = URI.create("faulty:///")

  private def localFile(p: Path): File = new File(p.toUri.getPath)

  override def rename(src: Path, dst: Path): Boolean = {
    maybeKill("rename:before", dst)
    val s = localFile(src)
    if (!s.exists()) return false
    // Hadoop contract: renaming onto an existing directory moves INSIDE it
    val d0 = localFile(dst)
    val d = if (d0.isDirectory) new File(d0, s.getName) else d0
    if (d.exists()) return false
    d.getParentFile.mkdirs()
    // copy to a hidden sibling, then local-atomic publish = one atomic PUT
    val tmp = new File(d.getParentFile, s".faultyput.${d.getName}.${System.nanoTime()}")
    copyTree(s, tmp)
    if (!tmp.renameTo(d)) { deleteTree(tmp); throw new IOException(s"faulty put failed: $d") }
    maybeKill("rename:after-put", dst) // dest committed, source still present
    if (renameDelayMs > 0) Thread.sleep(renameDelayMs)
    deleteTree(s)
    maybeKill("rename:after-delete", dst) // op complete, caller never learns
    true
  }

  // every public create overload funnels through this protected hook
  override def createOutputStreamWithMode(f: Path, append: Boolean,
      permission: FsPermission): java.io.OutputStream = {
    maybeKill("create:before", f)
    val out = super.createOutputStreamWithMode(f, append, permission)
    if ("create:torn" == killAt.get() && pathArmed(f)) new java.io.OutputStream {
      override def write(b: Int): Unit = write(Array(b.toByte), 0, 1)
      override def write(b: Array[Byte], off: Int, len: Int): Unit = {
        // half the first write reaches the file, then the writer dies —
        // the torn content stays VISIBLE at `f`
        out.write(b, off, math.max(1, len / 2))
        out.close()
        maybeKill("create:torn", f)
      }
      override def close(): Unit = () // already closed at the kill
    }
    else out
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val real = super.listStatus(f)
      .filterNot(st => hidden.contains(st.getPath.toUri.getPath))
    val dirPath = f.toUri.getPath
    // the budget counts listings OF A PHANTOM'S PARENT only (ADVICE r18:
    // decrementing on every listing of ANY directory let an unrelated
    // concurrent listing — Spark parquet IO on the same scheme — drain the
    // budget before the reader under test ever saw a ghost)
    val mine = phantoms.filter(_.getParent.toString == dirPath)
    val ghosts =
      if (mine.nonEmpty && phantomListings.get() > 0) {
        phantomListings.decrementAndGet()
        mine.map { gp =>
          new FileStatus(0L, false, 1, 4096L, 0L,
            new Path("faulty://" + gp.toString))
        }.toArray
      } else Array.empty[FileStatus]
    real ++ ghosts
  }

  private def copyTree(src: File, dst: File): Unit = {
    if (src.isDirectory) {
      dst.mkdirs()
      val kids = src.listFiles()
      if (kids != null) kids.foreach(k => copyTree(k, new File(dst, k.getName)))
    } else {
      java.nio.file.Files.copy(src.toPath, dst.toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  private def deleteTree(f: File): Unit = {
    if (f.isDirectory) {
      val kids = f.listFiles()
      if (kids != null) kids.foreach(deleteTree)
    }
    f.delete(): Unit
  }
}

/** `FileContext` twin of [[FaultyFs]] (Hadoop resolves the two APIs
  * through separate registries) — delegates every operation, INCLUDING
  * the non-atomic copy+delete rename, to the same instance-shared
  * injection state. */
class FaultyAbstractFs(uri: URI, conf: org.apache.hadoop.conf.Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new FaultyFs, conf, "faulty", false)

object FaultyFs {
  /** Thrown at an armed kill point — "the writer process died here". */
  final class Killed(point: String) extends IOException(s"injected kill at $point")

  private val killAt = new java.util.concurrent.atomic.AtomicReference[String](null)
  /** When non-null, armed kills fire only on operations whose local path
    * contains this substring — the lever that targets a specific commit
    * step (e.g. the LATEST pointer flip) inside a lifecycle that does
    * plenty of unrelated parquet IO on the same scheme. An unscoped kill
    * inside a Spark TASK models a task failure (retried and survived),
    * not the writer crash under test. */
  @volatile private var killPathFilter: String = null
  /** Absolute local paths omitted from listings (lagging visibility). */
  @volatile var hidden: Set[String] = Set.empty
  /** Deleted paths still served by the next [[phantomListings]] listings
    * (a reader racing GC sees the stale entry, then a fresh listing). */
  @volatile var phantoms: Set[java.nio.file.Path] = Set.empty
  private val phantomListings = new java.util.concurrent.atomic.AtomicInteger(0)
  @volatile var renameDelayMs: Long = 0L

  def arm(point: String): Unit = { killPathFilter = null; killAt.set(point) }
  /** True while an armed kill has not fired yet — a spec that expects the
    * kill to have fired asserts `!armed` (the arm is one-shot, so a
    * consumed arm IS the witness, robust to layers that swallow the
    * [[Killed]] from their cause/suppressed chains — parquet's close path
    * does). */
  def armed: Boolean = killAt.get() != null
  /** One-shot kill scoped to paths containing `pathContains`. */
  def arm(point: String, pathContains: String): Unit = {
    killPathFilter = pathContains
    killAt.set(point)
  }
  private def pathArmed(p: Path): Boolean = {
    val f = killPathFilter
    f == null || p.toUri.getPath.contains(f)
  }
  def armPhantoms(paths: Set[String], listings: Int): Unit = {
    phantoms = paths.map(java.nio.file.Paths.get(_))
    phantomListings.set(listings)
  }
  private def maybeKill(point: String, p: Path): Unit =
    if (pathArmed(p) && killAt.compareAndSet(point, null)) throw new Killed(point)

  def reset(): Unit = {
    killAt.set(null)
    killPathFilter = null
    hidden = Set.empty
    phantoms = Set.empty
    phantomListings.set(0)
    renameDelayMs = 0L
  }

  /** Make the scheme resolvable through the session's Hadoop conf (shared
    * SparkContext conf feeds every `sessionState.newHadoopConf()`) — both
    * the `FileSystem` API (StoreIO, Spark parquet IO) and the
    * `FileContext`/`AbstractFileSystem` API (writeStringAtomic's
    * rename-with-overwrite). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.faulty.impl", classOf[FaultyFs].getName)
    hc.set("fs.AbstractFileSystem.faulty.impl", classOf[FaultyAbstractFs].getName)
    // fresh semantics per test run beat instance caching
    hc.set("fs.faulty.impl.disable.cache", "true")
  }
}
