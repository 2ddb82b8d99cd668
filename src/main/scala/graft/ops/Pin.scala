package graft.ops

import org.apache.spark.sql.Dataset

/** CHECKPOINT-STRATEGY KNOB for every operator that pins an
  * intermediate result (dedup signature passes, iterative
  * connected-components rounds, the flagship's gated survivors):
  *
  *  - `spark.graft.checkpoint.mode = local` (default):
  *    `localCheckpoint()` — executor-memory-pinned blocks
  *    (MEMORY_AND_DISK), zero extra I/O, the right default on a real
  *    cluster where the working set spreads across executors.
  *  - `spark.graft.checkpoint.mode = disk`: reliable `checkpoint()` to
  *    `spark.graft.checkpoint.dir` (defaults to a per-JVM temp dir) —
  *    blocks leave the heap entirely. This is the single-JVM /
  *    memory-constrained escape hatch: local[32] concentrates the whole
  *    "cluster's" pinned working set in ONE heap, and at sf1 the
  *    flagship's concurrent checkpoint blocks + broadcast builds
  *    exhaust the default 8 g — with `disk` the same run fits
  *    (measured; SURVEY §5.4). On a real cluster this memory is
  *    per-executor, so `local` stays the default.
  *
  * Both modes cut lineage eagerly — the property the iterative callers
  * (CC loops, fixed-point ranks) actually rely on — so the swap is
  * semantics-free. One helper, session-scoped, read per call: a
  * memory-tight stage can flip the conf mid-pipeline.
  */
object Pin {

  private val dirLock = new Object

  def apply[T](ds: Dataset[T]): Dataset[T] = {
    val spark = ds.sparkSession
    spark.conf.get("spark.graft.checkpoint.mode", "local") match {
      case "disk" =>
        val sc = spark.sparkContext
        dirLock.synchronized {
          if (sc.getCheckpointDir.isEmpty) {
            val d = spark.conf.get("spark.graft.checkpoint.dir",
              java.nio.file.Files
                .createTempDirectory("graft-ckpt").toString)
            sc.setCheckpointDir(d)
          }
        }
        ds.checkpoint()
      case _ => ds.localCheckpoint()
    }
  }

  /** `df.pin()` — the drop-in spelling at every former
    * `localCheckpoint()` call site.
    */
  implicit class Pinned[T](private val ds: Dataset[T]) extends AnyVal {
    def pin(): Dataset[T] = Pin(ds)
  }
}
