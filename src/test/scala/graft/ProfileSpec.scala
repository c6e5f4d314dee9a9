package graft

class ProfileSpec extends SparkSpec {

  test("profileTable: exact nulls/ndv/min/max on a constructed frame") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("a", LongType), StructField("b", StringType),
      StructField("c", DoubleType)))
    val rows = Seq(
      Row(1L, "x", 1.5), Row(2L, null, 0.25), Row(2L, "y", null),
      Row(null, "x", -3.0))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val got = graft.operators.Profile.profileTable(df)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).toSeq
    assert(got == Seq(
      ("a", 4L, 1L, 2L, "1", "2"),
      ("b", 4L, 1L, 2L, "x", "y"),
      ("c", 4L, 1L, 3L, "-3.0", "1.5")))
  }

  test("profile_table plans per-column pruned scans, no Expand") {
    val d = SparkEntry.queries("profile_table")(spark, sfDir)
    d.collect()
    val plan = d.queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"),
      "multi-count-distinct Expand would multiply every row by the " +
        "column count before the exchange")
  }
}
