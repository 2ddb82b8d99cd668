package graft

import java.net.URI

import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}

/** Test-only Hadoop FileSystem for commit-protocol interleaving specs: a
  * local FS under the scheme `stall:` whose claim-file opens can run an
  * injected hook FIRST. The hook is the "meanwhile, on another writer"
  * seam — it mutates the claim between this writer's claim-create and
  * its pre-rename re-read, deterministically reproducing the
  * stalled-writer sweep/re-claim interleaving that a sleep-based race
  * test could only sample. Registered per-test via
  * `fs.stall.impl` in the Hadoop conf.
  */
object StallFs {
  /** Fires once on the next open of a `*.claim` path, then disarms. */
  @volatile var onClaimOpen: Path => Unit = null
}

class StallFs extends RawLocalFileSystem {
  override def getScheme: String = "stall"
  override def getUri: URI = URI.create("stall:///")

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    val hook = StallFs.onClaimOpen
    if (hook != null && p.getName.endsWith(".claim")) {
      StallFs.onClaimOpen = null
      hook(p)
    }
    super.open(p, bufferSize)
  }
}
