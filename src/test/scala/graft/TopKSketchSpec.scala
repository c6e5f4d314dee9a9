package graft

import org.apache.spark.sql.functions._

import graft.functions.TopKSketch

object TopKSketchSpec {
  // standalone extractors/keys: Spark serializes these closures
  val keyOf: ((Long, Long)) => Long = _._1
  // zero-padded so the sketch's lexicographic tie-break matches the exact
  // query's numeric one
  val itemOf: ((Long, Long)) => String = p => f"${p._2}%06d"
}

class TopKSketchSpec extends SparkSpec {
  import spark.implicits._
  import TopKSketchSpec._

  test("sketch equals exact per-group top-k when capacity covers the group") {
    val pairs = Tables(spark, sfDir, "lineitem")
      .select(col("l_suppkey"), col("l_partkey"))
      .as[(Long, Long)]
    val sketched = pairs.groupByKey(keyOf)
      .agg(TopKSketch.topK[(Long, Long)](3)(itemOf))
      .collect()
      .map { case (supp, items) => supp -> items }.toMap
    val exact = graft.operators.CustomJoins
      .topkPerGroup(
        Tables(spark, sfDir, "lineitem"), "l_suppkey", "l_partkey", 3)
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.sortBy(_.getLong(3))
        .map(r => (f"${r.getLong(1)}%06d", r.getLong(2))).toSeq)
      .toMap
    assert(sketched.keySet == exact.keySet)
    for ((supp, items) <- exact)
      assert(sketched(supp) == items, s"supplier $supp")
  }

  test("sketch stays bounded and ordered under eviction pressure") {
    val skewed = (1 to 1000).map(i => (1L, (i % 7).toLong)) ++
      (1 to 50).map(i => (1L, (100 + i).toLong))
    val ds = spark.createDataset(skewed)
    val result = ds.groupByKey(keyOf)
      .agg(TopKSketch.topK[(Long, Long)](3, capacity = 8)(itemOf))
      .collect().head._2
    assert(result.length == 3)
    // the 7 hot items (~143 each) dominate the 50 singletons
    assert(result.forall { case (item, _) => item.toLong < 7L })
    assert(result.map(_._2).sliding(2).forall {
      case Seq(a, b) => a >= b
      case _ => true
    })
  }
}
