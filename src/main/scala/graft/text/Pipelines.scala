package graft.text

import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.dedup.Dedup

/** End-to-end corpus preparation — the composed flow a training-data
  * pipeline actually runs, as one declarative plan Catalyst optimizes
  * whole: quality filter → exact dedup → near-dup removal → split.
  *
  * Stage order matters and the oracle enforces it: near-dup pairs are
  * computed on the QUALITY-FILTERED, exact-deduped corpus (not the raw
  * one), and the kept side of each pair is the lower doc_id.
  */
object Pipelines {

  private val MIN_TOKENS = 20
  private val MAX_STOPWORD_RATIO = 0.12

  private val prepare = Q(
    "pipeline_prepare",
    (s, dir) => {
      val nTok = size(TextOps.tokens(col("text")))
      val swRatio = TextOps.tokenMatchCount(col("text"), TextOps.stopwords)
        .cast("double") / nTok
      // 1. quality filter
      val quality = Tables(s, dir, "documents")
        .filter(nTok >= MIN_TOKENS && swRatio <= MAX_STOPWORD_RATIO)
      // 2. exact dedup (normalized-md5 keeper)
      val fp = quality.select(col("doc_id"), col("lang"), col("text"),
        TextOps.normalizedMd5(col("text")).as("fp"))
      val keepers = fp.groupBy("fp").agg(min("doc_id").as("keeper"))
      // checkpoint: consumed twice (shingle stage + final anti-join), and
      // truncating lineage stops downstream plans re-inlining filter+md5
      val deduped = fp.join(keepers, "fp")
        .filter(col("doc_id") === col("keeper"))
        .select("doc_id", "lang", "text")
        .transform(graft.Checkpoint.of)
      // 3. near-dup removal: drop the higher doc_id of each jaccard pair.
      // The shingle table is checkpointed BEFORE explode: CollapseProject
      // would otherwise inline the whole shingle-array expression into the
      // post-explode projection and re-evaluate it once per exploded row
      // (≈500× per doc) on both join sides.
      val sh = deduped
        .select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
        .withColumn("nsh", size(col("sh")))
        .transform(graft.Checkpoint.of)
      val drops = Dedup.jaccardPairs(sh, Dedup.TAU)
        .select(col("b_id").as("doc_id")).distinct()
      val clean = deduped.join(drops, Seq("doc_id"), "left_anti")
      // 4. deterministic split + summary
      clean
        .groupBy(col("lang"), Sampling.splitLabel(col("text")).as("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(length(col("text"))).as("total_chars"))
        .orderBy("lang", "split")
    },
    Some(s"""WITH toks AS (
      SELECT doc_id, lang, text,
        list_filter(string_split(text,' '), t -> t <> '') w
      FROM documents),
    quality AS (
      SELECT doc_id, lang, text, w FROM toks
      WHERE len(w) >= $MIN_TOKENS
        AND len(list_filter(w, t -> t IN (${TextOps.stopwordsSql})))
          * 1.0 / len(w) <= $MAX_STOPWORD_RATIO),
    fp AS (
      SELECT doc_id, lang, text, w,
        md5(regexp_replace(lower(trim(text)), ' +', ' ', 'g')) AS f
      FROM quality),
    deduped AS (
      SELECT doc_id, lang, text, w FROM fp
      WHERE doc_id = (SELECT MIN(doc_id) FROM fp f2 WHERE f2.f = fp.f)),
    sh AS (
      SELECT doc_id,
        list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
          for i in range(1, greatest(len(w)-1, 1))]) s
      FROM deduped),
    drops AS (
      SELECT DISTINCT b.doc_id FROM sh a, sh b
      WHERE a.doc_id < b.doc_id
        AND len(list_intersect(a.s, b.s)) * 1.0 /
          (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
          >= ${Dedup.TAU}),
    clean AS (
      SELECT * FROM deduped WHERE doc_id NOT IN (SELECT doc_id FROM drops))
    SELECT lang,
      CASE
        WHEN ('0x' || substr(md5(coalesce(text,'')), 1, 4))::INT < 52429
          THEN 'train'
        WHEN ('0x' || substr(md5(coalesce(text,'')), 1, 4))::INT < 58982
          THEN 'val'
        ELSE 'test'
      END AS split,
      COUNT(*) AS n_docs, CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM clean GROUP BY 1, 2 ORDER BY lang, split"""))

  val all: Seq[Q] = Seq(prepare)
}
