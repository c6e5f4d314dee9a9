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
    * `bucketCol` read back with NO exchange (and no sort, when `sortCol`
    * matches the join key) — the 100 TB answer to repeated large-large
    * joins on a stable key. Bucket metadata lives in the session catalog,
    * so this writes a managed table rather than a bare path.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, bucketCol)
    sortCol.foreach(c => w.sortBy(c))
    w.saveAsTable(table)
  }
}
