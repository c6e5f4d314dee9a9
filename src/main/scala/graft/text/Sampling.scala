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

  /** Stratified (domain-balanced) sampling — the domain-mixing staple:
    * every `source` is downsampled to the SMALLEST source's row count, a
    * doc surviving iff its content-hash bucket clears the per-source
    * rate. The accept test is pure integer arithmetic
    * (`hb·n_source < n_min·65536` — no float rate, no rounding-mode
    * edge), so membership is exact and identical across engines, runs
    * and partitionings; scaling a source's rate never flips the fate of
    * a doc that an equal-or-lower rate admitted (nested samples, the
    * property that makes hash sampling the right tool for re-mixing).
    *
    * Scale: per-source counts are one thin map-side-combined aggregate;
    * the (tiny) rate table broadcasts back onto the corpus scan — the
    * 100 TB side is never shuffled, and the output agg is map-side
    * combined on ~|sources| keys.
    */
  private val stratified = Q(
    "sample_stratified",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), hashBucket(col("text")).as("hb"))
      val counts = d.groupBy("source").agg(count(lit(1)).as("n"))
      val mn = counts.agg(min("n").as("mn"))
      d.join(broadcast(counts), "source")
        .crossJoin(broadcast(mn))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("hb") * col("n") < col("mn") * 65536L, 1))
            .as("n_sampled"))
        .orderBy("source")
    },
    Some("""WITH c AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    m AS (SELECT MIN(n) AS mn FROM c),
    k AS (SELECT d.source,
        ('0x' || substr(md5(coalesce(d.text, '')), 1, 4))::BIGINT AS hb,
        c.n, m.mn
      FROM documents d JOIN c USING (source) CROSS JOIN m)
    SELECT source, COUNT(*) AS n_docs,
      COUNT(*) FILTER (WHERE hb * n < mn * 65536) AS n_sampled
    FROM k GROUP BY source ORDER BY source"""))

  val all: Seq[Q] = Seq(split, stratified)
}
