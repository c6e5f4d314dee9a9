package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Replay-idempotent parquet batch-state loop shared by the streaming
  * dedup sinks ([[Streaming.minhashDedupSink]], [[Streaming.phashDedupSink]],
  * the text-index ingest): a plain parquet directory partitioned by the
  * WRITING batch's id, so
  *
  *  - a replayed batch (failure between state write and checkpoint
  *    commit) reads only STRICTLY older partitions, then dynamically
  *    overwrites its own — same output, no double-counting;
  *  - every `compactEvery` batches, partitions strictly older than the
  *    previous batch fold (distinct rows) into the previous batch's
  *    partition and their directories are deleted, bounding the per-batch
  *    read at O(compactEvery) partitions. Replay-safe: a replayed batch B
  *    still reads `batch_id < B`, which contains the compacted partition
  *    (id B−1 < B); a crash between the fold write and the delete only
  *    leaves duplicate rows, harmless under the sinks' semi-join /
  *    distinct match logic;
  *  - `retentionBatches = Some(n)` additionally hides (and eventually
  *    deletes) partitions older than n batches — the standard TTL trade.
  *    Compaction coarsens the clock: folded rows adopt the compacted
  *    partition's id, so retention is an at-LEAST bound with granularity
  *    `compactEvery`.
  *
  * `dataSchema` is the persisted row shape WITHOUT the batch_id column;
  * reads use the explicit schema so a state dir holding only _SUCCESS (an
  * earlier batch produced zero rows) loads as zero rows instead of
  * failing inference, while a real read error still propagates.
  */
private[streaming] final class BatchState(
    spark: SparkSession, stateDir: String, dataSchema: StructType,
    compactEvery: Int, retentionBatches: Option[Long]) {
  require(compactEvery >= 2, s"compactEvery must be >= 2, got $compactEvery")

  private val stateSchema = dataSchema.add("batch_id", "long")
  private val dataCols = dataSchema.fieldNames.toSeq
  private val path = new org.apache.hadoop.fs.Path(stateDir)
  private val fs =
    path.getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readState(): DataFrame =
    spark.read.schema(stateSchema).parquet(stateDir)

  private def horizon(batchId: Long): Long =
    retentionBatches.fold(Long.MinValue)(n => batchId - n)

  /** The history visible to `batchId`: strictly older than it, within
    * retention. Empty (not an error) before the first commit.
    */
  def visible(batchId: Long): DataFrame =
    if (fs.exists(path))
      readState().filter(col("batch_id") < batchId &&
        col("batch_id") >= horizon(batchId))
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], stateSchema)

  /** Write `rows` (dataSchema columns) as this batch's partition, then
    * compact when due. Call AFTER the sink has emitted its output for
    * the batch, so a crash mid-commit replays cleanly.
    */
  def commit(rows: DataFrame, batchId: Long): Unit = {
    rows.select(dataCols.map(col): _*).distinct()
      .withColumn("batch_id", lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(stateDir)
    // fold history into the PREVIOUS batch's partition (never this one:
    // a replay of batch `batchId` reads strictly older ids, so the
    // compacted rows must stay visible to it)
    if (batchId > 0 && batchId % compactEvery == 0) {
      val target = batchId - 1
      // deletion candidates ignore the horizon: an EXPIRED partition is
      // excluded from reads and from the fold, but its directory still
      // sits on disk — without this it would never appear in oldIds and
      // would accumulate forever
      val old = readState().filter(col("batch_id") < target)
      val oldIds = old.select("batch_id").distinct()
        .collect().map(_.getLong(0)) // ≤ compactEvery ids, driver-tiny
      if (oldIds.nonEmpty) {
        // materialize BEFORE writing: the fold reads the very partitions
        // the dynamic overwrite rewrites — checkpointing breaks the
        // read-while-overwrite cycle; only live (>= horizon) rows fold
        val folded = old.filter(col("batch_id") >= horizon(batchId))
          .select(dataCols.map(col): _*)
          .union(readState().filter(col("batch_id") === target)
            .select(dataCols.map(col): _*))
          .distinct()
          .localCheckpoint()
        try {
          folded
            .withColumn("batch_id", lit(target))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(stateDir)
        } finally folded.unpersist()
        // delete AFTER the fold is durable; a crash in between only
        // leaves duplicates the match logic ignores
        oldIds.foreach { id =>
          fs.delete(new org.apache.hadoop.fs.Path(path,
            s"batch_id=$id"), true)
        }
      }
    }
  }
}
