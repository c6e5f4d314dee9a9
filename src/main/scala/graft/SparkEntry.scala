package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — queries + DuckDB oracle SQL per SURVEY.md §2.
  *
  * Aggregated from the per-module suites; every `Q` with `oracle=Some(sql)`
  * is hash-compared against DuckDB by the driver, the rest get rows-only
  * checks (and have ScalaTest specs).
  */
object SparkEntry {

  /** `events.ts` is nanosecond-precision parquet, which Spark 4's vectorized
    * reader rejects unless surfaced as a raw Long. Settable at runtime; every
    * entry point calls this so driver-created sessions work too.
    */
  def tune(spark: SparkSession): SparkSession = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    // ObjectHashAggregate falls back to SORT-BASED aggregation past
    // this many distinct keys per task (default 128!) — the fallback
    // sorts the aggregate's whole input stream, which for the
    // TopEdges bounded-heap top-k re-creates exactly the n²-candidate
    // sort spill the aggregate exists to avoid (the sf3 sweep filled
    // 79 GB of disk through it). The conf is read at ACTION time (the
    // exec's doExecute), so it cannot be scoped around lazy gated
    // frames (knn_join materializes at the driver's collect) — it must
    // be session-global. Sized to the state, not "unbounded": TopEdges
    // holds ≤JOIN_K boxed (Double, Long) pairs per group, ~1 KB with
    // tuple + hash-map-entry overhead, so 2^19 groups is a ≤0.5 GB
    // per-task hash ceiling before the sort valve returns. The conf is
    // shared by every TypedImperativeAggregate (collect_list/set,
    // percentile_approx): heavy-list aggregates keep the valve past
    // 2^19 groups per task, and a corpus that big should also raise
    // shuffle partitions, shrinking groups/task in step.
    spark.conf.set(
      "spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
      (1 << 19).toString)
    functions.CosineSim.register(spark)
    plans.AsofJoin.register(spark)
    spark
  }

  private def suites: Seq[Q] =
    operators.Relational.all ++ operators.CustomJoins.all ++
      operators.Sketches.all ++ operators.Profile.all ++
      operators.Dq.all ++
      text.TextOps.all ++ text.Sampling.all ++
      text.Decontam.all ++ text.Packing.all ++ text.Bpe.all ++
      text.Classify.all ++
      text.TextIndex.all ++
      text.Pipelines.all ++ dedup.Dedup.all ++ dedup.Overlap.all ++
      sim.Knn.all ++ sim.Pq.all ++
      sim.Quantize.all ++ sim.SemDedup.all ++ multimodal.Multimodal.all ++
      handler.HandlerQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    suites.head.fn(tune(spark), "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.map(q => q.name ->
      ((s: SparkSession, dir: String) => q.fn(tune(s), dir))).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    suites.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
