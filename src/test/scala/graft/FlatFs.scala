package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataOutputStream, Path, RawLocalFileSystem}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Test-only Hadoop FileSystem simulating a FLAT OBJECT STORE's
  * `create(path, overwrite = false)`: HEAD (exists check) then PUT
  * (unconditional create) — the s3a-class semantics where two racers
  * can both pass the HEAD and both "win" the create. The injectable
  * [[FlatFs.betweenHeadAndPut]] hook runs between the two, so a spec
  * can deterministically interleave a second writer inside the window
  * a real race would only sample. Registered per-test via
  * `fs.flat.impl` in the Hadoop conf.
  */
object FlatFs {
  /** Fires once between the exists-check and the create of the next
    * create-exclusive call on a `*.claim` path (the commit protocol's
    * claim marker — other create-exclusive calls, e.g. parquet task
    * files and manifest temps, pass through), then disarms.
    */
  @volatile var betweenHeadAndPut: Path => Unit = null

  /** CONDITIONAL-PUT mode: when true, `create(overwrite = false)`
    * becomes a true If-None-Match write (kernel-atomic O_EXCL
    * reservation) — the modern object-store capability
    * [[graft.ops.ConditionalPutArbiter]] certifies. When false (the
    * default), the HEAD-then-PUT hazard stands.
    */
  @volatile var conditionalPut: Boolean = false

  /** Transient-fault injection for conditional puts, firing once on the
    * next matching exclusive create then disarming:
    *  - [[faultBeforePut]]: the store errors BEFORE the object exists —
    *    a genuine outage; the arbiter must surface I/O, not contention.
    *  - [[faultAfterPut]]: the bytes LAND but the response is lost
    *    (close persists, then errors) — ambiguous success; the arbiter's
    *    re-read must recognize its own token instead of orphaning it.
    */
  @volatile var faultBeforePut: Path => Boolean = null
  @volatile var faultAfterPut: Path => Boolean = null
}

class FlatFs extends RawLocalFileSystem {
  override def getScheme: String = "flat"
  override def getUri: URI = URI.create("flat:///")

  // HEAD (exists) … hook … then PUT unconditionally — the
  // non-atomicity under test. In conditional-put mode the path is
  // instead RESERVED atomically (one racer's PUT wins, the store
  // enforces it server-side).
  private def headThenPut(f: Path): Unit = {
    val before = FlatFs.faultBeforePut
    if (before != null && before(f)) {
      FlatFs.faultBeforePut = null
      throw new java.io.IOException(s"injected store fault (pre-PUT): $f")
    }
    if (FlatFs.conditionalPut) {
      val p = java.nio.file.Paths.get(f.toUri.getPath)
      // an object store has no directories — "parents" always exist
      if (p.getParent != null)
        java.nio.file.Files.createDirectories(p.getParent)
      try java.nio.file.Files.createFile(p)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          throw new org.apache.hadoop.fs.FileAlreadyExistsException(
            f.toString)
      }
      return
    }
    if (exists(f))
      throw new org.apache.hadoop.fs.FileAlreadyExistsException(f.toString)
    val hook = FlatFs.betweenHeadAndPut
    if (hook != null && f.getName.endsWith(".claim")) {
      FlatFs.betweenHeadAndPut = null; hook(f)
    }
  }

  // "PUT landed, response lost": bytes write through and close persists
  // them, THEN the caller sees an error — the ambiguous-success shape
  private def maybeLossy(f: Path, out: FSDataOutputStream): FSDataOutputStream = {
    val after = FlatFs.faultAfterPut
    if (after == null || !after(f)) return out
    FlatFs.faultAfterPut = null
    new FSDataOutputStream(new java.io.FilterOutputStream(out) {
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        out.write(b, off, len)
      override def close(): Unit = {
        super.close()
        throw new java.io.IOException(s"injected response loss (post-PUT): $f")
      }
    }, null)
  }

  // both create overloads RawLocalFileSystem routes exclusive creates
  // through: with and without an explicit permission
  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    if (!overwrite) {
      headThenPut(f)
      return maybeLossy(f, super.create(f, permission, true, bufferSize,
        replication, blockSize, progress))
    }
    super.create(f, permission, overwrite, bufferSize, replication,
      blockSize, progress)
  }

  override def create(f: Path, overwrite: Boolean, bufferSize: Int,
      replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    if (!overwrite) {
      headThenPut(f)
      return maybeLossy(f, super.create(f, true, bufferSize, replication,
        blockSize, progress))
    }
    super.create(f, overwrite, bufferSize, replication, blockSize, progress)
  }
}
