package graft.text

import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.dedup.Dedup

/** Benchmark decontamination — the GPT-3/Gopher-style n-gram overlap
  * check every training-data pipeline runs before a model sees the data:
  * a training document is CONTAMINATED if it shares at least one n-token
  * gram with any document of the held-out benchmark set.
  *
  * Here the "benchmark" is a deterministic content-hash slice of the
  * corpus itself ([[Sampling.hashBucket]] < 10% of the hash space — the
  * same engine-stable rule as `sample_split`), which makes the whole
  * check mirrorable in the DuckDB oracle; in production the benchmark
  * side is the eval suites.
  *
  * Scale posture: the benchmark n-gram set is SMALL by construction
  * (eval suites are at most millions of grams) while the training corpus
  * is the 100 TB side — so the plan broadcasts the distinct benchmark
  * grams and streams the training side through a broadcast hash join:
  * ZERO shuffle of the corpus, one map-side-combined per-doc count. If
  * the benchmark side ever outgrows broadcast range, the same plan
  * degrades gracefully to one shuffled equi-join on the gram key (or a
  * bloom-filter pre-pass feeding the exact join — same verify-on-thin
  * -candidates shape as the dedup suite).
  */
object Decontam {

  /** Gram width. Real pipelines use 8–13 tokens; 5 keeps planted
    * near-dup overlap detectable on the short synthetic docs while
    * staying long enough that unrelated docs rarely collide.
    */
  val N = 5

  /** Benchmark slice: content-hash bucket < 10% of the 16-bit space. */
  val BENCH_CUT = 6554

  /** Distinct n-grams of a `(…, text)` frame — the benchmark side of the
    * check (the shingle kernel already emits per-doc distinct grams;
    * `distinct()` dedups across docs so the broadcast side is minimal).
    */
  def benchmarkGrams(bench: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    bench
      .select(explode(Dedup.shingles(col("text"), N)).as("g"))
      .distinct()

  /** Per-doc contamination flags of a `(doc_id, text)` frame against a
    * benchmark gram set — the shared core of the batch query and the
    * streaming sink ([[graft.streaming.Streaming.decontamSink]]): gram
    * explode, broadcast hash join, map-side-combined hit count.
    */
  def flags(docs: org.apache.spark.sql.DataFrame,
      benchGrams: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val hits = docs
      .select(col("doc_id"), explode(Dedup.shingles(col("text"), N)).as("g"))
      .join(broadcast(benchGrams), "g")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
    docs.select("doc_id")
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"))
      .withColumn("contaminated", col("n_hits") > 0)
  }

  private val decontam = Q(
    "decontam_ngram",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          Sampling.hashBucket(col("text")).as("hb"))
      val bench = docs.filter(col("hb") < BENCH_CUT)
      val train = docs.filter(col("hb") >= BENCH_CUT)
      flags(train, benchmarkGrams(bench)).orderBy("doc_id")
    },
    Some(s"""WITH d AS (SELECT doc_id,
        ('0x' || substr(md5(coalesce(text, '')), 1, 4))::INT AS hb,
        list_filter(string_split(text,' '), t -> t <> '') w
      FROM documents),
    g AS (SELECT doc_id, hb,
        list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' ||
          w[i+3] || ' ' || w[i+4]
          for i in range(1, greatest(len(w)-3, 1))]) gs
      FROM d),
    bg AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE hb < $BENCH_CUT),
    tg AS (SELECT doc_id, unnest(gs) AS gram FROM g WHERE hb >= $BENCH_CUT),
    h AS (SELECT doc_id, COUNT(*) AS n_hits
      FROM tg JOIN bg USING (gram) GROUP BY doc_id)
    SELECT t.doc_id AS doc_id,
      COALESCE(h.n_hits, 0::BIGINT) AS n_hits,
      COALESCE(h.n_hits, 0::BIGINT) > 0 AS contaminated
    FROM (SELECT doc_id FROM d WHERE hb >= $BENCH_CUT) t
    LEFT JOIN h USING (doc_id)
    ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(decontam)
}
