package graft.ops

import org.apache.spark.sql.SparkSession

/** The VERSION-CLAIM ARBITER seam — how a snapshot commit wins the
  * right to publish version N exactly once.
  *
  * The default arbiter is the filesystem itself: a CREATE-EXCLUSIVE
  * claim marker (kernel-atomic on local paths, namenode-atomic on
  * hierarchical stores) — no configuration, no extra service. But a
  * flat object store implements `create(overwrite = false)` as
  * HEAD-then-PUT, so two racers can both "win"; that is exactly why
  * every production table format ships a pluggable commit coordinator
  * (S3A committers' DynamoDB lock table, delta-storage-s3's
  * LogStore, Iceberg's lock-manager catalog): the atomicity moves to a
  * service that HAS a conditional write. This trait is that slot:
  *
  * {{{
  * spark.conf.set("spark.graft.commit.arbiter", classOf[MyLockTable].getName)
  * }}}
  *
  * and every [[Layout]] commit claims/re-reads/releases through it
  * instead of the claim file — the rest of the protocol (per-attempt
  * token, owned-claim reclaim for idempotent writers, pre-rename
  * re-read, loud loss) is UNCHANGED, because it was already written
  * against the claim's three primitives, not the filesystem.
  *
  * Contract:
  *  - [[tryClaim]] must be ATOMIC (compare-and-set on absence): at most
  *    one token ever observes `true` per (root, version) until a
  *    [[release]]. An implementation backed by a conditional PUT
  *    (If-None-Match), a lock table's putIfAbsent, or a catalog
  *    transaction all satisfy this.
  *  - [[holder]] must read the CURRENT holder (the re-read that stops a
  *    stalled writer from clobbering a re-claimed version).
  *  - [[release]] is called only by the token's own writer on a failed
  *    rename; crash-orphaned claims are the implementation's to expire
  *    (the FS default sweeps them by age via
  *    [[Layout.vacuumOrphanFiles]]'s grace window — an external lock
  *    service should carry a TTL with the same reasoning).
  *
  * Implementations need a public no-arg constructor (instantiated
  * reflectively once per class name) and must be driver-thread-safe.
  */
trait ClaimArbiter {
  def tryClaim(spark: SparkSession, root: String, version: Int,
      token: String): Boolean
  def holder(spark: SparkSession, root: String, version: Int): Option[String]
  def release(spark: SparkSession, root: String, version: Int,
      token: String): Unit
}
