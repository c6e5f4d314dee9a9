package graft

import java.nio.file.Files

import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._

import graft.sources.Sources

class SourcesSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft_sources").toString

  private lazy val df = Tables(spark, sfDir, "nation")

  test("parquet roundtrip preserves schema and rows") {
    val dir = tmp() + "/nation_pq"
    Sources.writeParquet(df, dir)
    val back = Sources.readParquet(spark, dir)
    assert(back.schema == df.schema)
    assert(back.count() == df.count())
  }

  test("partitioned parquet write enables partition pruning") {
    val dir = tmp() + "/nation_part"
    Sources.writeParquet(df, dir, partitionBy = Seq("n_regionkey"))
    val back = Sources.readParquet(spark, dir)
      .filter(col("n_regionkey") === 0)
    // partition filter must appear as PartitionFilters, not a data filter
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"))
    assert(back.count() ==
      df.filter(col("n_regionkey") === 0).count())
  }

  test("csv roundtrip with explicit schema-on-read") {
    val dir = tmp() + "/nation_csv"
    Sources.writeCsv(df, dir)
    val schema = StructType(Seq(
      StructField("n_nationkey", LongType),
      StructField("n_name", StringType),
      StructField("n_regionkey", LongType)))
    val back = Sources.readCsv(spark, dir, Some(schema))
    assert(back.schema.fieldNames.toSeq ==
      Seq("n_nationkey", "n_name", "n_regionkey"))
    assert(back.count() == df.count())
  }

  test("orc roundtrip with pushed filter and pruned columns") {
    val dir = tmp() + "/nation_orc"
    Sources.writeOrc(df, dir)
    val back = Sources.readOrc(spark, dir)
      .filter(col("n_regionkey") === 1).select("n_name")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(n_regionkey), " +
      "EqualTo(n_regionkey,1)]"), plan)
    assert(back.count() == df.filter(col("n_regionkey") === 1).count())
  }

  test("json roundtrip preserves rows") {
    val dir = tmp() + "/nation_json"
    Sources.writeJson(df, dir)
    val back = Sources.readJson(spark, dir)
    assert(back.count() == df.count())
    assert(back.select("n_name").as[String](org.apache.spark.sql.Encoders.STRING)
      .collect().sorted.toSeq ==
      df.select("n_name").as[String](org.apache.spark.sql.Encoders.STRING)
        .collect().sorted.toSeq)
  }

  test("compactParquet merges small files, preserves rows exactly, " +
      "leaves no staging dirs") {
    val dir = tmp() + "/li_small"
    val li = Tables(spark, sfDir, "lineitem")
    // accrete an artificially fragmented layout (64 tiny files)
    li.repartition(64).write.parquet(dir)
    val before = li.collect().map(_.toSeq).groupBy(identity)
      .view.mapValues(_.length).toMap
    val (nBefore, nAfter) =
      Sources.compactParquet(spark, dir, targetBytes = 4L << 20)
    assert(nBefore == 64)
    assert(nAfter < nBefore, s"$nAfter files after vs $nBefore before")
    val back = Sources.readParquet(spark, dir)
    assert(back.schema == li.schema)
    val after = back.collect().map(_.toSeq).groupBy(identity)
      .view.mapValues(_.length).toMap
    assert(after == before, "compaction must preserve the exact multiset")
    // staging dirs cleaned up
    val parent = new java.io.File(dir).getParentFile
    assert(parent.listFiles().map(_.getName).toSet == Set("li_small"))
  }

  test("compactParquet: empty state dir is a (0,0) no-op; a partitioned " +
      "root is rejected to protect the DPP layout") {
    // idle streaming sink: directory exists, only _SUCCESS committed
    val empty = tmp() + "/idle_state"
    new java.io.File(empty).mkdirs()
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(empty, "_SUCCESS"))
    assert(Sources.compactParquet(spark, empty) == ((0, 0)))
    assert(new java.io.File(empty, "_SUCCESS").exists(),
      "no-op must not touch the directory")
    // partitioned root: pb= subdirectories must be refused, not
    // flattened into a layout that loses the partition columns
    val parted = tmp() + "/parted"
    Tables(spark, sfDir, "nation")
      .withColumn("pb", col("n_nationkey") % 4)
      .write.partitionBy("pb").parquet(parted)
    val e = intercept[IllegalArgumentException] {
      Sources.compactParquet(spark, parted)
    }
    assert(e.getMessage.contains("partitioned root"))
    // each leaf partition dir still compacts fine
    val (b, a) = Sources.compactParquet(spark, parted + "/pb=0")
    assert(b >= 1 && a >= 1)
  }

  test("writeZOrdered: a second-dimension box filter reads fewer bytes " +
      "than on a first-dimension-sorted layout, same rows") {
    val li = Tables(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_quantity", "l_extendedprice")
    val dir = tmp()
    val zdir = s"$dir/zorder"
    val ldir = s"$dir/linear"
    Sources.writeZOrdered(li, zdir, "l_orderkey", "l_partkey", 32)
    // control: linearly sorted on the FIRST dimension only — every file
    // spans the full l_partkey range, so a partkey filter skips nothing
    li.repartitionByRange(32, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.parquet(ldir)
    val lo = 100L
    val hi = 120L
    val bytes = new java.util.concurrent.atomic.AtomicLong()
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        bytes.addAndGet(e.taskMetrics.inputMetrics.bytesRead)
    }
    def bytesReadOf(path: String): (Long, Set[(Long, Long)]) = {
      spark.sparkContext.addSparkListener(listener)
      bytes.set(0L)
      val rows = try {
        spark.read.parquet(path)
          .filter(col("l_partkey").between(lo, hi))
          .select("l_orderkey", "l_partkey")
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      } finally {
        org.apache.spark.sql.graft.Shim.waitListeners(spark)
        spark.sparkContext.removeSparkListener(listener)
      }
      (bytes.get(), rows)
    }
    val (zBytes, zRows) = bytesReadOf(zdir)
    val (lBytes, lRows) = bytesReadOf(ldir)
    assert(zRows == lRows && zRows.nonEmpty, "layout must not change results")
    assert(zBytes < lBytes / 2,
      s"z-ordered layout must read <half the bytes for a partkey box " +
        s"($zBytes vs $lBytes)")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
    }
    rm(new java.io.File(dir))
  }

  test("keyed upsert merges like MERGE and rewrites only touched buckets") {
    import spark.implicits._
    val dir = tmp() + "/upsert"
    val n = 16
    // seed: 100 keys, version 1
    Sources.upsertParquet(spark,  dir,
      (0L until 100L).map(k => (k, s"v1_$k")).toDF("id", "payload"),
      "id", n)
    assert(Sources.readUpserted(spark, dir).count() == 100)
    // capture per-bucket parquet file names+mtimes before the upsert
    def bucketFiles(): Map[String, Set[(String, Long)]] =
      new java.io.File(dir).listFiles.filter(_.getName.startsWith("_bucket="))
        .map(d => d.getName -> d.listFiles
          .filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet).toMap
    val before = bucketFiles()
    // update 3 existing keys, insert 2 new ones
    val updates = Seq((5L, "v2_5"), (6L, "v2_6"), (7L, "v2_7"),
      (100L, "v1_100"), (101L, "v1_101")).toDF("id", "payload")
    Sources.upsertParquet(spark, dir, updates, "id", n)
    val after = bucketFiles()
    val got = Sources.readUpserted(spark, dir)
      .as[(Long, String)].collect().toMap
    assert(got.size == 102, "100 seeds - 0 deletes + 2 inserts")
    assert(got(5L) == "v2_5" && got(6L) == "v2_6" && got(7L) == "v2_7",
      "matched keys take the update")
    assert(got(4L) == "v1_4" && got(99L) == "v1_99",
      "unmatched keys survive untouched")
    assert(got(100L) == "v1_100" && got(101L) == "v1_101",
      "unmatched updates insert")
    // buckets not containing any update key must be byte-identical
    val touched = updates.select(
        pmod(hash(col("id")), lit(n)).as("b")).distinct()
      .collect().map(r => s"_bucket=${r.getInt(0)}").toSet
    val untouched = before.keySet -- touched
    assert(untouched.nonEmpty, "fixture must leave some buckets alone")
    for (b <- untouched)
      assert(after(b) == before(b), s"$b was rewritten but had no updates")
    for (b <- touched)
      assert(after(b) != before(b), s"$b had updates but was not rewritten")
    // upserts are idempotent: replaying the same updates changes nothing
    Sources.upsertParquet(spark, dir, updates, "id", n)
    assert(Sources.readUpserted(spark, dir)
      .as[(Long, String)].collect().toMap == got)
  }
}
