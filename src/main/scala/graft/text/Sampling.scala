package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Deterministic dataset splitting / sampling — the training-data-pipeline
  * staple. Assignment is content-hash based (md5 → first 4 hex chars →
  * [0, 65536) bucket), so it is stable across engines, runs, partitionings
  * and cluster sizes — a row's split never depends on which executor saw
  * it. No shuffle: the split column is computed in the scan stage.
  */
object Sampling {

  /** Bucket in [0, 65536) from the md5 of a string column. NULLs hash as
    * the empty string (deterministic in both engines) rather than falling
    * through every `when` into the last split.
    */
  def hashBucket(c: Column): Column =
    conv(substring(md5(coalesce(c, lit(""))), 1, 4), 16, 10).cast("long")

  /** train/val/test label with an 80/10/10 split (by content hash). */
  def splitLabel(c: Column): Column = {
    val b = hashBucket(c)
    when(b < 52429, "train")          // 0.80 * 65536
      .when(b < 58982, "val")         // 0.90 * 65536
      .otherwise("test")
  }

  private val split = Q(
    "sample_split",
    (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          splitLabel(col("text")).as("split"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "split"),
    Some("""WITH labeled AS (
      SELECT doc_id, lang,
        CASE
          WHEN ('0x' || substr(md5(coalesce(text, '')), 1, 4))::INT < 52429
            THEN 'train'
          WHEN ('0x' || substr(md5(coalesce(text, '')), 1, 4))::INT < 58982
            THEN 'val'
          ELSE 'test'
        END AS split
      FROM documents)
    SELECT lang, split, COUNT(*) AS n_docs
    FROM labeled GROUP BY lang, split ORDER BY lang, split"""))

  val all: Seq[Q] = Seq(split)
}
