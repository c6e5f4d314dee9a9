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
}
