package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Sources

/** Scale tooling: salting and bucketing behave as designed. */
class ScaleSpec extends SparkSpec {

  test("saltedJoin equals plain join and spreads the hot key") {
    val li = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity")
    val parts = Tables(spark, sfDir, "part").select("p_partkey", "p_name")
      .withColumnRenamed("p_partkey", "l_partkey")
    val plain = li.join(parts, "l_partkey")
      .agg(count(lit(1)), sum("l_quantity")).collect().head
    val salted = Skew.saltedJoin(li, parts, "l_partkey", 8)
      .agg(count(lit(1)), sum("l_quantity")).collect().head
    assert(salted.getLong(0) == plain.getLong(0))
    assert(math.abs(salted.getDouble(1) - plain.getDouble(1)) < 1e-6)
  }

  test("AQE splits a skewed join partition (OptimizeSkewedJoin fires)") {
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // one hot key (50k rows) among 100 — a single reducer partition far
      // over the 8KB threshold, the shape salting/AQE exists for
      val left = spark.range(50000)
        .select((col("id") % lit(100) * when(col("id") < 49900, 0)
          .otherwise(1)).as("k"), col("id").as("v"))
      val right = spark.range(100).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val j = left.join(right, "k")
      // collect() on THIS dataframe: count() would run a different
      // execution and leave this plan un-finalized (isFinalPlan=false)
      assert(j.collect().length == 50000)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected a skew-split SortMergeJoin, got:\n${plan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("saltedAgg equals direct aggregation") {
    val li = Tables(spark, sfDir, "lineitem")
    val direct = li.groupBy("l_suppkey")
      .agg(count(lit(1)).as("n"), sum("l_quantity").as("q"))
      .orderBy("l_suppkey").collect().toSeq
    val salted = Skew.saltedAgg(li, "l_suppkey", 8,
      phase1 = Seq(count(lit(1)).as("n"), sum("l_quantity").as("q")),
      phase2 = Seq(sum("n").as("n"), sum("q").as("q")))
      .orderBy("l_suppkey").collect().toSeq
    assert(salted == direct)
  }

  test("bucketed tables join without an exchange") {
    for (t <- Seq("b_orders", "b_customer")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      // a killed previous run can leave the managed location behind
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t)
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) f.listFiles().foreach(rm)
          f.delete()
        }
        rm(loc)
      }
    }
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false") {
      Sources.writeBucketed(
        Tables(spark, sfDir, "orders").select("o_orderkey", "o_custkey"),
        "b_orders", "o_custkey", 4, sortCols = Seq("o_custkey"))
      Sources.writeBucketed(
        Tables(spark, sfDir, "customer").select("c_custkey", "c_name"),
        "b_customer", "c_custkey", 4, sortCols = Seq("c_custkey"))
      val joined = spark.table("b_orders").join(spark.table("b_customer"),
        col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle:\n$plan")
      assert(joined.count() ==
        Tables(spark, sfDir, "orders").join(
          Tables(spark, sfDir, "customer"),
          col("o_custkey") === col("c_custkey")).count())
    }
  }

  test("runtime bloom-filter join: the selective dim leg injects a " +
      "might_contain pre-filter on the fact scan") {
    // The 100 TB shuffle-join saver Spark ships DISABLED by default:
    // with a selective filter on one join leg, the optimizer builds a
    // bloom filter over that leg's join keys and pre-filters the FACT
    // scan with might_contain — rows that cannot join die before the
    // exchange instead of shuffling. (Broadcast joins don't need it;
    // this is for the dim-too-big-to-broadcast regime, so broadcast is
    // disabled here.)
    withSQLConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter." +
        "applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = Tables(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_quantity")
      val o = Tables(spark, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val j = li.join(o, col("l_orderkey") === col("o_orderkey"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter must inject on the fact leg:\n$plan")
      val n = j.count()
      withSQLConf(
          "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        assert(n === li.join(o,
          col("l_orderkey") === col("o_orderkey")).count(),
          "the bloom pre-filter must not change the join result")
      }
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(body: => T): T = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("dedup_embedding block grid tracks parallelism: B ~ sqrt(2*p), " +
      "tiles ~ p") {
    import graft.dedup.Dedup.nBlocksFor
    // the sizing rule: B(B+1)/2 uniform tiles land within a small
    // factor of the task-slot count at every scale
    for (p <- Seq(4, 8, 32, 128, 1000, 4000)) {
      val b = nBlocksFor(p)
      assert(b == math.round(math.sqrt(2.0 * p)).toInt)
      val tiles = b * (b + 1) / 2
      assert(tiles >= p * 3 / 4 && tiles <= p * 2,
        s"p=$p B=$b tiles=$tiles not within [0.75p, 2p]")
    }
    assert(nBlocksFor(1) == 1)
    // the session's own grid: the fan-out the oracle-gated query used
    val b = nBlocksFor(spark.sparkContext.defaultParallelism)
    assert(b >= 2, "local session must still tile the pair space")
  }
}
