package graft.ops

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** SHIPPED [[ClaimArbiter]] implementations — the flat-object-store
  * commit answer, so a deployment on s3a-class storage configures one
  * line and COMMITS instead of refusing:
  *
  * {{{
  * // all writers share one Spark driver (the common case):
  * spark.conf.set("spark.graft.commit.arbiter",
  *   classOf[graft.ops.SingleDriverArbiter].getName)
  *
  * // multiple drivers: point the lock root at any atomic-create store
  * spark.conf.set("spark.graft.commit.arbiter",
  *   classOf[graft.ops.LockRootArbiter].getName)
  * spark.conf.set("spark.graft.commit.lockRoot", "hdfs://nn/graft-locks")
  * }}}
  *
  * Both follow the public table-format playbook: when the data store
  * has no conditional write, move the claim's atomicity somewhere that
  * does — an in-driver CAS (the single-writer-process model S3 Delta
  * deployments ran on for years) or a lock service/filesystem with a
  * real create-exclusive (the DynamoDB-lock-table shape, with a
  * filesystem standing in for the table).
  */
object Arbiters {
  /** Claim entries carry their claim time so an arbiter can expire a
    * crash-orphaned claim after [[Layout.ClaimGraceMillis]] — the same
    * grace the filesystem default gives [[Layout.vacuumOrphanFiles]].
    */
  final case class Entry(token: String, at: Long)

  /** Fully-qualified table key — scheme+authority+path, so `file:/x`
    * and `s3a://bucket/x` never collide.
    */
  private[ops] def qualifiedKey(spark: SparkSession, root: String): String = {
    val p = new Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .makeQualified(p).toString
  }

  /** Whether version `v` of the table at `root` has a COMMITTED
    * manifest. A TTL break must never fire on a committed version: the
    * claim behind a published manifest is inert history, and handing
    * its version to a new writer would let a rename clobber the
    * manifest. (A claim older than the grace WITHOUT a manifest is a
    * crashed writer — expiring it is exactly what the grace is for.)
    */
  private[ops] def manifestExists(spark: SparkSession, root: String,
      v: Int): Boolean = {
    val p = new Path(s"$root/_manifests/v$v.manifest")
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}

/** In-driver claim arbiter: a JVM-global compare-and-set keyed by the
  * fully-qualified (table, version). ATOMIC by
  * `ConcurrentHashMap.putIfAbsent` — a real conditional write, just
  * scoped to this JVM.
  *
  * DEPLOYMENT CONTRACT (the honest part): correct ONLY when every
  * writer to the table runs in THIS driver JVM — the same contract
  * Delta's S3 "single-driver" LogStore shipped with. Concurrent Spark
  * jobs, streaming queries, and maintenance threads inside one driver
  * all arbitrate correctly; a second driver writing the same table
  * races un-arbitrated (use [[LockRootArbiter]] there). Claims from a
  * writer that died mid-commit expire after
  * [[Layout.ClaimGraceMillis]], but never while uncommitted-ness is in
  * doubt: expiry requires the version's manifest to be absent.
  */
class SingleDriverArbiter extends ClaimArbiter {
  import SingleDriverArbiter.table
  import Arbiters._

  private def key(spark: SparkSession, root: String, version: Int) =
    qualifiedKey(spark, root) + "#" + version

  override def tryClaim(spark: SparkSession, root: String, version: Int,
      token: String): Boolean = {
    val k = key(spark, root, version)
    val mine = Entry(token, System.currentTimeMillis())
    val existing = table.putIfAbsent(k, mine)
    if (existing == null) return true
    // TTL break: a stale claim with NO manifest behind it is a crashed
    // writer — replace it atomically (the CAS arbitrates concurrent
    // breakers). The residual window — the crashed-looking writer
    // committing between our manifest-absence check and its own
    // pre-rename re-read — is the protocol's documented one-metadata-op
    // window after a >grace stall, identical to the filesystem sweep's.
    if (System.currentTimeMillis() - existing.at > Layout.ClaimGraceMillis &&
        !manifestExists(spark, root, version))
      table.replace(k, existing, mine)
    else false
  }

  override def holder(spark: SparkSession, root: String,
      version: Int): Option[String] =
    Option(table.get(key(spark, root, version))).map(_.token)

  override def release(spark: SparkSession, root: String, version: Int,
      token: String): Unit =
    table.computeIfPresent(key(spark, root, version),
      (_, e) => if (e.token == token) null else e)
}

object SingleDriverArbiter {
  private[ops] val table =
    new ConcurrentHashMap[String, Arbiters.Entry]()
  /** Test hook: age a held claim as if its writer stalled. */
  private[graft] def backdate(spark: SparkSession, root: String,
      version: Int, byMillis: Long): Unit = {
    val k = Arbiters.qualifiedKey(spark, root) + "#" + version
    table.computeIfPresent(k, (_, e) => e.copy(at = e.at - byMillis))
  }
}

/** Lock-directory claim arbiter: claims are CREATE-EXCLUSIVE files
  * under a SEPARATE root on an atomic-create store — the "lock table"
  * pattern with a filesystem standing in for DynamoDB. The data can
  * live on any flat object store; only the (tiny, metadata-only) lock
  * root needs real create-exclusive semantics, and every deployment
  * has one (HDFS, ABFS, a local NFS mount, the driver's own disk for
  * single-node).
  *
  * Layout: `<lockRoot>/<sha1(qualified table root)>/v<N>.lock`, content
  * = the writer token. The digest directory keys the table identity,
  * so two tables never share a lock namespace and the lock root stays
  * one flat listing per table.
  *
  * Crash expiry: a lock older than [[Layout.ClaimGraceMillis]] whose
  * version has NO committed manifest is broken by renaming it to a
  * tombstone — rename is atomic on the lock store, so concurrent
  * breakers resolve to exactly one winner — then re-claimed with a
  * fresh create-exclusive (a third writer may still win that create;
  * the break conveys no priority). The residual stall window is the
  * protocol's documented one (see [[SingleDriverArbiter]]).
  */
class LockRootArbiter extends ClaimArbiter {
  import Arbiters._

  private def lockRootOf(spark: SparkSession): String = {
    val lr = spark.conf.get("spark.graft.commit.lockRoot", "")
    require(lr.nonEmpty,
      "LockRootArbiter requires spark.graft.commit.lockRoot — a " +
        "directory on an ATOMIC-create store (one of: " +
        Layout.AtomicClaimSchemes.mkString(", ") + ") that holds the " +
        "claim files. The data table itself may live on a flat store.")
    lr
  }

  private def fsOf(spark: SparkSession, p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def lockPath(spark: SparkSession, root: String,
      version: Int): Path = {
    val lr = lockRootOf(spark)
    val lrPath = new Path(lr)
    val scheme = Option(fsOf(spark, lrPath).getScheme).getOrElse("")
      .toLowerCase
    if (!Layout.AtomicClaimSchemes.contains(scheme))
      throw new IllegalStateException(
        s"spark.graft.commit.lockRoot=$lr resolves to scheme '$scheme', " +
          "which has no atomic create-exclusive — the lock root must " +
          s"live on one of: ${Layout.AtomicClaimSchemes.mkString(", ")} " +
          "(the whole point is moving the claim somewhere atomic)")
    val digest = java.security.MessageDigest.getInstance("SHA-1")
      .digest(qualifiedKey(spark, root).getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(20)
    new Path(new Path(lrPath, digest), s"v$version.lock")
  }

  /** Create-exclusive on the lock store: kernel-atomic O_EXCL via
    * java.nio for local paths (Hadoop's RawLocalFileSystem implements
    * create(overwrite=false) as exists-then-create — NOT atomic),
    * namenode-/HNS-atomic `create(overwrite=false)` elsewhere.
    */
  private def createExclusive(spark: SparkSession, p: Path,
      token: String): Boolean = {
    val fs = fsOf(spark, p)
    fs.mkdirs(p.getParent)
    if (fs.getScheme == "file") {
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(p.toUri.getPath),
          token.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try {
        val out = fs.create(p, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        // same error taxonomy as [[ConditionalPutArbiter.condPut]]: only
        // already-exists means a lost race; an ambiguous error re-reads
        // (own token = landed), and a store fault rethrows as I/O
        case e: java.io.IOException =>
          val readBack =
            try {
              val in = fs.open(p)
              try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
              finally in.close()
            } catch { case _: java.io.FileNotFoundException => None }
          readBack match {
            case Some(c) if c == token => true
            case Some(_) => false
            case None => throw new java.io.IOException(
              s"create-exclusive of lock $p failed with a STORE error, not " +
                "a concurrent claim (the lock is absent after the error): " +
                "an I/O fault to retry/alert on, not commit contention", e)
          }
      }
    }
  }

  override def tryClaim(spark: SparkSession, root: String, version: Int,
      token: String): Boolean = {
    val p = lockPath(spark, root, version)
    if (createExclusive(spark, p, token)) return true
    // held — maybe by a crashed writer: break ONLY a stale lock on an
    // UNCOMMITTED version, via atomic rename-to-tombstone (one breaker
    // wins the rename; the rest keep losing the claim)
    val fs = fsOf(spark, p)
    val stale =
      try System.currentTimeMillis() -
        fs.getFileStatus(p).getModificationTime > Layout.ClaimGraceMillis
      catch { case _: java.io.FileNotFoundException => false }
    if (stale && !manifestExists(spark, root, version)) {
      val tomb = new Path(p.getParent,
        s"${p.getName}.broken-${java.util.UUID.randomUUID().toString.take(8)}")
      if (try fs.rename(p, tomb) catch { case _: java.io.IOException => false }) {
        fs.delete(tomb, false)
        return createExclusive(spark, p, token)
      }
    }
    false
  }

  override def holder(spark: SparkSession, root: String,
      version: Int): Option[String] = {
    val p = lockPath(spark, root, version)
    try {
      val in = fsOf(spark, p).open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }
  }

  override def release(spark: SparkSession, root: String, version: Int,
      token: String): Unit = {
    // content-guarded delete (release is only ever our own failed-rename
    // path; a lost guard here at worst expires the claim early, which
    // the pre-rename holder re-read already tolerates)
    if (holder(spark, root, version).contains(token))
      fsOf(spark, lockPath(spark, root, version))
        .delete(lockPath(spark, root, version), false)
  }
}

/** Conditional-put claim arbiter AGAINST THE DATA STORE ITSELF — for
  * object stores whose PUT honors create-exclusive (If-None-Match)
  * semantics, which every major store now exposes. No lock root, no
  * second system: the claim is an object under the table's own
  * `_manifests/` directory, and the store's conditional write is the
  * arbitration. This removes the last deployment dependency the other
  * two arbiters carry (one-driver contract / separate atomic store).
  *
  * {{{
  * spark.conf.set("spark.graft.commit.arbiter",
  *   classOf[graft.ops.ConditionalPutArbiter].getName)
  * // certify the scheme(s) whose PUT is conditional-write-capable:
  * spark.conf.set("spark.graft.commit.conditionalPutSchemes", "s3a")
  * }}}
  *
  * Layout: `<root>/_manifests/v<N>.cput.g<G>` — GENERATION-numbered
  * claim objects, because a flat store has conditional put but NO
  * atomic rename, so the lock-root tombstone break doesn't transplant.
  * The protocol uses only put-if-absent + list + read:
  *
  *  - CLAIM: list the version's claim objects; none → conditional-put
  *    generation 0 (one racer's PUT succeeds — the store arbitrates).
  *  - HOLDER: the content of the HIGHEST generation (what the
  *    pre-rename re-read compares).
  *  - BREAK: the highest generation stale past
  *    [[Layout.ClaimGraceMillis]] with NO committed manifest →
  *    conditional-put generation G+1. Concurrent breakers race on the
  *    SAME object name, so exactly one wins; the broken writer's next
  *    holder re-read resolves to the higher generation and it aborts
  *    instead of renaming (the same documented post-stall window as
  *    the other arbiters).
  *  - RELEASE (own failed rename only): delete the highest-gen object
  *    if it still carries our token. The read-then-delete window is
  *    tolerated for the same reason [[LockRootArbiter.release]]'s is —
  *    the pre-rename holder re-read absorbs an early-expired claim.
  *
  * The scheme must be CERTIFIED via
  * `spark.graft.commit.conditionalPutSchemes` (comma-separated) —
  * an uncertified flat scheme's create-exclusive is HEAD-then-PUT and
  * would reintroduce the exact hazard this exists to close. Schemes in
  * [[Layout.AtomicClaimSchemes]] are accepted without certification
  * (their create-exclusive already implies it).
  */
class ConditionalPutArbiter extends ClaimArbiter {
  import Arbiters._
  import org.apache.hadoop.fs.FileSystem

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def msDir(root: String) = new Path(s"$root/_manifests")

  private def certifiedSchemes(spark: SparkSession): Set[String] =
    spark.conf.get("spark.graft.commit.conditionalPutSchemes", "")
      .split(",").map(_.trim.toLowerCase).filter(_.nonEmpty).toSet

  private def checkedFs(spark: SparkSession, root: String): FileSystem = {
    val fs = fsOf(spark, msDir(root))
    val scheme = Option(fs.getScheme).getOrElse("").toLowerCase
    if (!Layout.AtomicClaimSchemes.contains(scheme) &&
        !certifiedSchemes(spark).contains(scheme))
      throw new IllegalStateException(
        s"ConditionalPutArbiter on scheme '$scheme': this store is not " +
          "certified conditional-put-capable. If its PUT honors " +
          "If-None-Match (create-exclusive enforced server-side), add " +
          "the scheme to spark.graft.commit.conditionalPutSchemes; " +
          "otherwise its create(overwrite=false) is HEAD-then-PUT and " +
          "cannot arbitrate a claim — use LockRootArbiter or " +
          "SingleDriverArbiter instead.")
    fs
  }

  private def claimPath(root: String, version: Int, gen: Int): Path =
    new Path(msDir(root), s"v$version.cput.g$gen")

  /** The version's claim objects, ascending by generation. */
  private def claims(fs: FileSystem, root: String,
      version: Int): Seq[(Int, org.apache.hadoop.fs.FileStatus)] = {
    val dir = msDir(root)
    val pre = s"v$version.cput.g"
    val listed =
      try fs.listStatus(dir).toSeq
      catch { case _: java.io.FileNotFoundException => Nil }
    listed.flatMap { st =>
      val n = st.getPath.getName
      if (n.startsWith(pre) && n.length > pre.length &&
          n.drop(pre.length).forall(_.isDigit))
        Some(n.drop(pre.length).toInt -> st)
      else None
    }.sortBy(_._1)
  }

  /** One conditional PUT: kernel-atomic O_EXCL on local paths (the
    * same RawLocalFileSystem caveat as [[LockRootArbiter]]);
    * `create(overwrite=false)` elsewhere — which on a certified store
    * IS the If-None-Match write.
    *
    * ERROR TAXONOMY matters here: only the store's conditional-write-
    * failure signal (already-exists / precondition-failed) means "a
    * concurrent claim won". Any OTHER IOException is a store fault —
    * mapping it to `false` would surface an outage as
    * CommitConflictException (diagnostics chase a non-existent
    * concurrent writer), and a PUT that LANDED but lost its response
    * would orphan the writer's own claim, blocking the version for the
    * full grace. So: ambiguous error → re-read the object; our token
    * there = the PUT succeeded (claim won); someone else's = lost;
    * absent = a real store fault, rethrown as I/O with a named
    * diagnostic so the caller's retry/alerting sees an outage, not
    * contention.
    */
  private def condPut(fs: FileSystem, p: Path, token: String): Boolean = {
    fs.mkdirs(p.getParent)
    if (fs.getScheme == "file") {
      try {
        java.nio.file.Files.write(
          java.nio.file.Paths.get(p.toUri.getPath),
          token.getBytes("UTF-8"),
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try {
        val out = fs.create(p, false)
        try out.write(token.getBytes("UTF-8")) finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException =>
          contentOf(fs, p) match {
            case Some(c) if c == token => true // own PUT landed; response lost
            case Some(_) => false // a concurrent claim really is there
            case None => throw new java.io.IOException(
              s"conditional PUT of claim $p failed with a STORE error, not " +
                "a concurrent claim (the object is absent after the error): " +
                "this is an I/O fault to retry/alert on, not commit " +
                "contention", e)
          }
      }
    }
  }

  private def contentOf(fs: FileSystem, p: Path): Option[String] =
    try {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8").mkString)
      finally in.close()
    } catch { case _: java.io.FileNotFoundException => None }

  override def tryClaim(spark: SparkSession, root: String, version: Int,
      token: String): Boolean = {
    val fs = checkedFs(spark, root)
    claims(fs, root, version).lastOption match {
      case None => condPut(fs, claimPath(root, version, 0), token)
      case Some((g, st)) =>
        // break path: the TARGET generation (G+1) came from THIS
        // listing, so a concurrent breaker that saw the same listing
        // races on the same object name and the store picks one winner;
        // a breaker working from a NEWER listing targets a generation
        // we'd lose to anyway
        val stale = System.currentTimeMillis() -
          st.getModificationTime > Layout.ClaimGraceMillis
        if (stale && !manifestExists(spark, root, version))
          condPut(fs, claimPath(root, version, g + 1), token)
        else false
    }
  }

  override def holder(spark: SparkSession, root: String,
      version: Int): Option[String] = {
    val fs = fsOf(spark, msDir(root))
    claims(fs, root, version).lastOption
      .flatMap { case (_, st) => contentOf(fs, st.getPath) }
  }

  override def release(spark: SparkSession, root: String, version: Int,
      token: String): Unit = {
    val fs = fsOf(spark, msDir(root))
    // read-then-delete window tolerated: release runs only on our own
    // failed rename, and an early-expired claim is absorbed by every
    // writer's pre-rename holder re-read (see LockRootArbiter.release)
    claims(fs, root, version).lastOption.foreach { case (_, st) =>
      if (contentOf(fs, st.getPath).contains(token))
        fs.delete(st.getPath, false)
    }
  }
}

object ConditionalPutArbiter {
  /** Housekeeping: drop claim objects of COMMITTED versions past the
    * grace (inert history) — the conditional-put mirror of
    * [[LockRootArbiter.sweep]]. Live uncommitted claims survive.
    */
  def sweep(spark: SparkSession, tableRoot: String): Int = {
    val dir = new Path(s"$tableRoot/_manifests")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return 0
    val now = System.currentTimeMillis()
    val Pat = "v(\\d+)\\.cput\\.g\\d+".r
    fs.listStatus(dir).toSeq.count { st =>
      st.getPath.getName match {
        case Pat(v) =>
          Arbiters.manifestExists(spark, tableRoot, v.toInt) &&
            now - st.getModificationTime > Layout.ClaimGraceMillis &&
            fs.delete(st.getPath, false)
        case _ => false
      }
    }
  }
}

object LockRootArbiter {
  /** Housekeeping: drop locks whose version HAS a committed manifest
    * (inert history) and are older than the grace — the lock-root
    * mirror of [[Layout.vacuumOrphanFiles]]'s claim sweep. Returns the
    * number of locks removed.
    */
  def sweep(spark: SparkSession, tableRoot: String): Int = {
    val arb = new LockRootArbiter
    val dir = arb.lockPath(spark, tableRoot, 0).getParent
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return 0
    val now = System.currentTimeMillis()
    fs.listStatus(dir).toSeq.count { st =>
      val n = st.getPath.getName
      val committed = n match {
        case s if s.matches("v\\d+\\.lock") =>
          Arbiters.manifestExists(spark, tableRoot,
            s.stripPrefix("v").stripSuffix(".lock").toInt)
        case s if s.contains(".broken-") => true // orphaned tombstone
        case _ => false
      }
      committed && now - st.getModificationTime > Layout.ClaimGraceMillis &&
        fs.delete(st.getPath, false)
    }
  }
}
