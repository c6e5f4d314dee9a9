package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TopEdges

/** [[graft.functions.TopEdges]] must select EXACTLY the rows the
  * row_number-window form selects — same (score desc, id asc) total
  * order, tie-heavy input, groups below/at/above k — because
  * knnGraphFrom's oracle (and every artifact spec built on it) pins
  * the window semantics.
  */
class TopEdgesSpec extends SparkSpec {

  test("TopEdges equals the row_number window form on tie-heavy data, " +
      "including groups smaller than k") {
    import spark.implicits._
    val k = 3
    // deterministic tie-heavy data: scores quantized to 4 levels so
    // most groups tie at the cut; group 0 has fewer than k rows
    val rows = for {
      g <- 0L until 40L
      i <- 0L until (if (g == 0) 2L else 17L)
    } yield (g, ((g * 31 + i * 17) % 4).toDouble / 4.0, i)
    val df = rows.toDF("g", "score", "id")
      .repartition(7) // exercise partial/merge paths
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("id"))
    val want = df.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("g"), col("id"), col("rk").cast("long"), col("score"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val got = df.groupBy("g")
      .agg(TopEdges.topK(k)(col("score"), col("id")).as("tops"))
      .select(col("g"), posexplode(col("tops")))
      .select(col("g"), col("col._2"),
        (col("pos") + 1).cast("long"), col("col._1"))
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == want)
    assert(got.count(_._1 == 0L) == 2,
      "a group smaller than k keeps all its rows")
  }

  test("knnGraphFrom plans the aggregate (no window sort of the " +
      "candidate stream) and matches the stored artifact contract") {
    import org.apache.spark.sql.functions.col
    val e = Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val g = graft.sim.Knn.knnGraphFrom(e,
      graft.sim.Knn.codebook(e))
    g.collect() // AQE hides plan markers until first action
    val plan = g.queryExecution.executedPlan.toString
    assert(!plan.contains("WindowGroupLimit") && !plan.contains("Window "),
      "the candidate top-k must be an aggregate, not a window sort")
    assert(plan.contains("ObjectHashAggregate"),
      "TopEdges must run as an object hash aggregate (map-side combine)")
  }
}
