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

  test("ofChanged returns identical rows and flag in both modes, and " +
      "the local fusion leaves the checkpoint fully materialized") {
    import org.apache.spark.sql.functions.col
    val df = spark.range(1000).repartition(4)
      .select(col("id"), (col("id") % 7).as("m"))
    val pred = col("m") === 3
    val (cpL, changedL) = Checkpoint.ofChanged(df.toDF(), pred)
    assert(changedL)
    // the fused probe's scan must have materialized EVERY partition: a
    // second action over the checkpointed frame sees the full row set
    assert(cpL.count() == 1000)
    assert(cpL.collect().toSeq.sortBy(_.getLong(0)) ==
      df.collect().toSeq.sortBy(_.getLong(0)))
    val (_, noneL) = Checkpoint.ofChanged(df.toDF(), col("m") === 99)
    assert(!noneL)
    val dir = Files.createTempDirectory("graft-ckpt-fused").toFile
    try {
      spark.conf.set(Checkpoint.CONF_KEY, dir.getAbsolutePath)
      val (cpR, changedR) = Checkpoint.ofChanged(df.toDF(), pred)
      assert(changedR == changedL)
      assert(cpR.collect().toSeq.sortBy(_.getLong(0)) ==
        cpL.collect().toSeq.sortBy(_.getLong(0)))
    } finally {
      spark.conf.unset(Checkpoint.CONF_KEY)
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
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

  test("checkpoints cap the inherited size estimate — an iterative loop " +
      "whose round references the prior checkpoint through joins must " +
      "not compound the stats BigInt double-exponentially") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // the r16 phash-CC shape in miniature: each round's body joins the
    // previous round's checkpoint THREE times; visitJoin's default
    // estimate is the product of child estimates, so uncapped stats
    // multiply their digit count ~3x per round — by round 14 the real
    // loop spent 367 of 432 s in BigInteger.multiply inside driver
    // stats estimation (CCSTATS_r16.json)
    var labels = Checkpoint.of(
      Seq((1L, 1L), (2L, 1L), (3L, 2L)).toDF("id", "label"))
    val want = labels.collect().toSet
    for (round <- 1 to 15) {
      val l1 = labels.select(col("id").as("a"), col("label").as("x"))
      val l2 = labels.select(col("label").as("y"), col("id").as("b"))
      val plan = labels
        .join(l1, col("id") === col("a"))
        .join(l2, col("label") === col("y"))
        .select(col("id"), col("label")).distinct()
      val (next, _) =
        Checkpoint.ofChanged(plan, col("label") < col("id"))
      labels = next.select(col("id"), col("label"))
      val est = labels.queryExecution.optimizedPlan.stats.sizeInBytes
      assert(est <= BigInt(Long.MaxValue),
        s"round $round: checkpointed estimate must stay capped, got " +
          s"a ${est.toString.length}-digit BigInt")
    }
    // capping is estimate-only: rows ride through bit-identically
    assert(labels.collect().toSet == want)
  }
}
