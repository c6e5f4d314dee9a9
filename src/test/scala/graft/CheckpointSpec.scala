package graft

import java.nio.file.Files

/** The reliable-checkpoint switch must be a pure posture change: with
  * `spark.graft.checkpointDir` set, every Checkpoint.of barrier writes
  * to the reliable directory instead of executor memory, and results
  * are IDENTICAL (the barriers sit on deterministic frames).
  */
class CheckpointSpec extends SparkSpec {

  test("dedup_minhash_lsh is unchanged under reliable checkpointing, " +
      "and the reliable dir is actually used") {
    val q = SparkEntry.queries("dedup_minhash_lsh")
    val local = q(spark, sfDir).collect().toSeq
    val dir = Files.createTempDirectory("graft-ckpt").toFile
    try {
      spark.conf.set(Checkpoint.CONF_KEY, dir.getAbsolutePath)
      val reliable = q(spark, sfDir).collect().toSeq
      assert(reliable == local)
      // the barrier must have gone through the configured directory
      val wrote = Option(dir.listFiles()).exists(_.nonEmpty)
      assert(wrote, "no checkpoint data written to the reliable dir")
    } finally {
      spark.conf.unset(Checkpoint.CONF_KEY)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm))
        f.delete()
      }
      rm(dir)
    }
  }

  test("a changed checkpoint dir conf re-points reliable checkpoints " +
      "mid-session") {
    import org.apache.spark.sql.functions.col
    val dirA = Files.createTempDirectory("graft-ckpt-a").toFile
    val dirB = Files.createTempDirectory("graft-ckpt-b").toFile
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    try {
      val df = spark.range(100).select(col("id"))
      spark.conf.set(Checkpoint.CONF_KEY, dirA.getAbsolutePath)
      Checkpoint.of(df.toDF()).collect()
      assert(Option(dirA.listFiles()).exists(_.nonEmpty))
      // conf changes mid-session: checkpoints must follow it, not land
      // silently in the first directory ever set (ADVICE r4)
      spark.conf.set(Checkpoint.CONF_KEY, dirB.getAbsolutePath)
      Checkpoint.of(df.toDF()).collect()
      assert(Option(dirB.listFiles()).exists(_.nonEmpty),
        "checkpoint data must land in the NEW configured dir")
    } finally {
      spark.conf.unset(Checkpoint.CONF_KEY)
      rm(dirA); rm(dirB)
    }
  }
}
