package graft

import org.apache.spark.sql.DataFrame

/** The materialization barrier every iterative / self-joining stage uses
  * (shingle tables, LSH signatures, Lloyd codebooks, connected-component
  * rounds): cuts lineage so Catalyst can't inline an expensive derived
  * expression into post-explode projections (CollapseProject) or
  * re-derive giant constraint trees through Filters, and so iterative
  * plans don't nest ITER lineages deep.
  *
  * `localCheckpoint()` (the default) stores blocks in executor memory —
  * fastest, but NOT fault-tolerant: losing an executor loses blocks with
  * no lineage to recompute them, aborting the job. Fine on local[n];
  * wrong posture for a 1000-executor cluster where executor loss is
  * routine. Setting `spark.graft.checkpointDir` (session conf, or the
  * `SPARK_GRAFT_CHECKPOINT_DIR` env var) flips EVERY barrier in the
  * library to a reliable `checkpoint()` against that directory (HDFS/
  * object store) — the documented 100 TB posture as one config switch,
  * not a rewrite. CheckpointSpec proves results are identical either way.
  */
object Checkpoint {

  val CONF_KEY = "spark.graft.checkpointDir"

  private def reliableDir(df: DataFrame): Option[String] =
    df.sparkSession.conf.getOption(CONF_KEY)
      .orElse(sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR"))
      .filter(_.nonEmpty)

  // the dir each SparkContext's checkpoints were last pointed at by US:
  // SparkContext.setCheckpointDir stores a UUID SUBDIR of what it's
  // given, so the configured value can't be recovered from
  // sc.getCheckpointDir for comparison — track it here instead. Without
  // this, a checkpoint dir already set earlier in the session (by us
  // with an old conf value, or by other code) silently won and a
  // changed spark.graft.checkpointDir was ignored.
  private val pointedAt =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Materialize `df` and cut its lineage — reliably when a checkpoint
    * dir is configured, in executor memory otherwise. The returned
    * frame's INHERITED size estimate is capped at Long.Max
    * ([[org.apache.spark.sql.graft.Shim.capStats]]): the checkpoint
    * carries the origin plan's Statistics, and in iterative loops the
    * join-product estimate otherwise compounds DOUBLE-exponentially —
    * the r16 phash-CC probe spent 367 of 432 s multiplying a
    * ~5¹³-digit BigInt inside driver-side stats estimation. Capping
    * changes no planning decision (all thresholds are longs).
    */
  def of(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.Shim.capStats(reliableDir(df) match {
      case Some(dir) =>
        val sc = df.sparkSession.sparkContext
        if (sc.getCheckpointDir.isEmpty ||
            !pointedAt.get(sc.applicationId).contains(dir)) {
          sc.setCheckpointDir(dir)
          pointedAt(sc.applicationId) = dir
        }
        df.checkpoint()
      case None => df.localCheckpoint()
    })

  /** [[of]] fused with a convergence probe: materialize `df` and return
    * whether any row matches `pred`, in ONE job where the backend allows
    * it. An iterative loop (connected components) otherwise pays two job
    * launches per round — the checkpoint write plus a probe action — and
    * at the ~0.5 s/round action floor the probe is pure overhead.
    *
    *   - local (block-cache) mode FUSES: the checkpoint is marked lazy
    *     and the probe's FULL-scan count is the action that materializes
    *     it. The scan must be full — a limit-1 probe could early-exit
    *     with partitions uncomputed, leaving the lazy checkpoint partial
    *     and silently re-deriving them from a lineage the caller
    *     believes cut.
    *   - reliable (checkpoint-dir) mode does NOT fuse: a lazy reliable
    *     checkpoint re-computes the whole lineage inside the write job
    *     it triggers, costing more than the probe saves — keep the eager
    *     write plus a cheap limit-1 read of the checkpointed blocks.
    *
    * CheckpointSpec pins both modes to identical rows and flag.
    */
  def ofChanged(df: DataFrame,
      pred: org.apache.spark.sql.Column): (DataFrame, Boolean) =
    reliableDir(df) match {
      case Some(_) =>
        val cp = of(df)
        (cp, cp.filter(pred).limit(1).count() > 0)
      case None =>
        val cp = org.apache.spark.sql.graft.Shim.capStats(
          df.localCheckpoint(false))
        (cp, cp.filter(pred).count() > 0)
    }
}
