package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Sources/sinks — SURVEY.md §2.9. Thin, typed wrappers around the
  * DataFrameReader/Writer API so every graft pipeline reads and writes
  * through one place with scale-safe defaults:
  *  - schema-on-read optional for parquet (self-describing), explicit for
  *    csv/json (schema inference is a full extra pass at 100 TB — only on
  *    request);
  *  - partitioned writes for downstream partition pruning;
  *  - no coalesce(1)-style anti-patterns: parallelism is preserved.
  */
object Sources {

  // ------------------------------------------------------------- readers
  def readParquet(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.foreach(r.schema)
    r.parquet(path)
  }

  def readCsv(spark: SparkSession, path: String,
      schema: Option[StructType] = None, header: Boolean = true,
      inferSchema: Boolean = false): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema match {
      case Some(sc) => r.schema(sc)
      case None => r.option("inferSchema", inferSchema.toString)
    }
    r.csv(path)
  }

  def readJson(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.foreach(r.schema)
    r.json(path)
  }

  /** ORC is self-describing like parquet: schema optional, predicate
    * pushdown + column pruning reach the stripe reader.
    */
  def readOrc(spark: SparkSession, path: String,
      schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.foreach(r.schema)
    r.orc(path)
  }

  // ------------------------------------------------------------- writers
  def writeParquet(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*)
    w.parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  def writeOrc(df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    val w = df.write.mode(mode)
    if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*)
    w.orc(path)
  }

  /** Bucketed + sorted table write: co-located joins/aggregations on
    * `bucketCol` read back with NO exchange (and no sort, when
    * `sortCols` covers the operator's required ordering — e.g.
    * (key, time) for the native as-of join) — the 100 TB answer to
    * repeated large-large joins on a stable key. Bucket metadata lives
    * in the session catalog, so this writes a managed table rather than
    * a bare path.
    *
    * The frame is pre-shuffled onto the bucket key so each bucket lands
    * in ONE file: the scan only reports its sort order when every bucket
    * is single-file, and the sort-elision above depends on it.
    * (`repartition` and `bucketBy` share the same murmur3 hash
    * partitioning, so the task→bucket mapping is 1:1.) Readers that want
    * the sort elided (e.g. a zero-exchange zero-sort native as-of join —
    * AsofJoinSpec proves the plan) must also set
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true`: Spark 3
    * stopped reporting bucket sort order because multi-file buckets
    * would need a merge, which single-file buckets don't (SPARK-28595).
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.repartition(nBuckets, df.col(bucketCol))
      .write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
    if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*)
    w.saveAsTable(table)
  }
}
