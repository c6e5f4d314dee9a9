package graft.dedup

import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.text.TextOps

/** Cross-source corpus overlap — SURVEY.md §2.4.
  *
  * Before mixing data sources into a training corpus (corpus_mix /
  * sample_temperature weights), a pipeline needs to know how much the
  * sources REPEAT each other: two crawls of the same sites, a curated set
  * re-scraped inside a web dump, a benchmark slice leaking into a second
  * source. `corpus_overlap` reports, for every source pair, the distinct
  * normalized-fingerprint counts, the shared-fingerprint count, and the
  * Jaccard overlap in exact floor-millionths — the source-level roll-up of
  * the per-document dedup operators.
  *
  * Scale: the corpus is touched ONCE to build the thin distinct
  * (source, fp) frame (two narrow columns — at 100 TB this is the same
  * posting shape every dedup operator here reduces to). The pair join is
  * on `fp` (never doc×doc): its output is bounded by cross-source
  * duplicate mass, not |corpus|². The S×S grid side is |sources|² rows —
  * sources number in the hundreds at most, so the grid is a broadcast and
  * zero-overlap pairs still appear (a left join against the pair counts,
  * zero-filled). All arithmetic is integer (counts, floor-millionth
  * Jaccard) — nothing to drift.
  */
object Overlap {

  private val overlap = Q(
    "corpus_overlap",
    (s, dir) => {
      val f = Tables(s, dir, "documents")
        .select(col("source"), TextOps.normalizedMd5(col("text")).as("fp"))
        .distinct()
      val sizes = f.groupBy("source").agg(count(lit(1)).as("n"))
      val common = f.as("a")
        .join(f.as("b"),
          col("a.fp") === col("b.fp") && col("a.source") < col("b.source"))
        .groupBy(col("a.source").as("source_a"),
          col("b.source").as("source_b"))
        .agg(count(lit(1)).as("n_common"))
      val grid = sizes.as("x")
        .join(broadcast(sizes.as("y")), col("x.source") < col("y.source"))
        .select(col("x.source").as("source_a"),
          col("y.source").as("source_b"),
          col("x.n").as("n_a"), col("y.n").as("n_b"))
      grid.join(common, Seq("source_a", "source_b"), "left")
        .na.fill(0L, Seq("n_common"))
        .withColumn("jaccard_micro",
          expr("n_common * 1000000 DIV (n_a + n_b - n_common)"))
        .select("source_a", "source_b", "n_a", "n_b", "n_common",
          "jaccard_micro")
        .orderBy("source_a", "source_b")
    },
    Some("""WITH f AS (
      SELECT DISTINCT source,
        md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fp
      FROM documents),
    sizes AS (SELECT source, COUNT(*) AS n FROM f GROUP BY source),
    common AS (SELECT a.source AS source_a, b.source AS source_b,
        COUNT(*) AS n_common
      FROM f a JOIN f b ON a.fp = b.fp AND a.source < b.source
      GROUP BY 1, 2),
    grid AS (SELECT x.source AS source_a, y.source AS source_b,
        x.n AS n_a, y.n AS n_b
      FROM sizes x JOIN sizes y ON x.source < y.source)
    SELECT source_a, source_b, n_a, n_b,
      COALESCE(n_common, 0) AS n_common,
      (COALESCE(n_common, 0) * 1000000) // (n_a + n_b - COALESCE(n_common, 0))
        AS jaccard_micro
    FROM grid LEFT JOIN common USING (source_a, source_b)
    ORDER BY source_a, source_b"""))

  /** Per-source EXACT-DUPLICATE rate — the ingest dashboard number read
    * next to [[overlap]] (overlap: how much sources repeat EACH OTHER;
    * this: how much each source repeats ITSELF — a re-crawled site or a
    * pagination bug shows up as within-source duplicate mass before any
    * pair operator runs). Same normalized fingerprint as dedup_exact —
    * one definition of "same content" across the suite.
    *
    * Scale: ONE map-side-combined aggregate per source (Spark plans the
    * single-column COUNT DISTINCT as a two-phase partial distinct on
    * (source, fp) — no Expand, no pair space); all-integer output.
    */
  private val dupRate = Q(
    "corpus_dup_rate",
    (s, dir) => {
      Tables(s, dir, "documents")
        .select(col("source"), TextOps.normalizedMd5(col("text")).as("fp"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("fp")).as("n_unique"))
        .withColumn("n_dups", col("n_docs") - col("n_unique"))
        .withColumn("dup_share_m6", expr("n_dups * 1000000 DIV n_docs"))
        .orderBy("source")
    },
    Some("""WITH f AS (
      SELECT source,
        md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS fp
      FROM documents)
    SELECT source, COUNT(*)::BIGINT AS n_docs,
      COUNT(DISTINCT fp)::BIGINT AS n_unique,
      (COUNT(*) - COUNT(DISTINCT fp))::BIGINT AS n_dups,
      ((COUNT(*) - COUNT(DISTINCT fp)) * 1000000 // COUNT(*))::BIGINT
        AS dup_share_m6
    FROM f GROUP BY source ORDER BY source"""))

  val all: Seq[Q] = Seq(overlap, dupRate)
}
