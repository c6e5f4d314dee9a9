package graft.sim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.CosineSim.cosineSim

/** Similarity search over `embeddings` — SURVEY.md §2.5.
  *
  * `knn_bruteforce` is the exact baseline (oracle-gated); `knn_lsh` and
  * `knn_ivf` are the 100 TB scale paths (candidate generation bounded by
  * bucket/partition size instead of the full corpus) whose recall against
  * the baseline is measured in KnnSpec.
  */
object Knn {

  private val K = 5         // neighbors returned
  private val NQ = 10       // query set = vec_id < NQ

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  // -------------------------------------------------------- knn_bruteforce
  /** Exact top-k: broadcast the (small) query set against one pass over the
    * corpus — a BroadcastNestedLoopJoin that scales linearly in corpus size
    * and never shuffles the corpus; the final per-query top-k shuffles only
    * |queries|·|corpus-partition winners| rows.
    */
  private val bruteforce = Q(
    "knn_bruteforce",
    (s, dir) => {
      val e = emb(s, dir)
      val q = e.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val cos = cosineSim(col("qv"), col("v"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(cos.desc, col("vec_id"))
      e.join(broadcast(q), col("query_id") =!= col("vec_id"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          col("rank"), round(cos, 6).as("cosine"))
        .orderBy("query_id", "rank")
    },
    Some(s"""WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
    q AS (SELECT vec_id query_id, v qv FROM e WHERE vec_id < $NQ)
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT query_id, e.vec_id AS neighbor_id,
        row_number() OVER (PARTITION BY query_id
          ORDER BY list_cosine_similarity(qv, e.v) DESC, e.vec_id) AS rank,
        round(list_cosine_similarity(qv, e.v), 6) AS cosine
      FROM q, e WHERE query_id <> e.vec_id)
    WHERE rank <= $K ORDER BY query_id, rank"""))

  // -------------------------------------------------------------- knn_lsh
  /** Random-hyperplane LSH: 16 tables × 6-bit signatures from a fixed
    * seeded hyperplane bank (deterministic across runs/executors — the
    * planes are compile-time-seeded literals, broadcast with the plan).
    * Corpus rows land in 16 buckets each; queries probe their 16 buckets;
    * only bucket collisions are scored. Scale: candidate count per query
    * ≈ 16 · corpus/2^6 — tune tables/bits to the corpus; recall vs
    * brute force is asserted in KnnSpec.
    */
  private val TABLES = 16
  private val BITS = 6
  private val DIM = 64

  /** Fixed hyperplane bank [table][bit] — unit-free gaussians, seed 42. */
  private lazy val planes: Array[Array[Array[Double]]] =
    Hyperplanes.bank(TABLES, BITS, DIM, 42)

  private def lshBuckets(v: Column): Column = Hyperplanes.buckets(planes, v)

  private def lshProbeBuckets(v: Column): Column =
    Hyperplanes.probeBuckets(planes, v)

  /** The seeded plane bank as a DuckDB VALUES literal — one row per
    * (tbl, bit) with the 64-dim plane as DOUBLE[]. Scala's Double.toString
    * is the shortest round-trip form, so DuckDB parses the identical bit
    * pattern and sign(list_dot_product) matches the codegen'd dot_product
    * exactly (both are sequential left-to-right folds).
    */
  private lazy val planesSql: String =
    (for (t <- 0 until TABLES; b <- 0 until BITS) yield
      s"($t,$b,[${planes(t)(b).mkString(",")}]::DOUBLE[])").mkString(",\n      ")

  private val lsh = Q(
    "knn_lsh",
    (s, dir) => {
      val e = emb(s, dir)
      // bucket index and candidate pairs carry bare IDs (16 B/row), not
      // the 64-double vectors — dedup hashes longs, exchanges stay thin,
      // and vectors are re-attached only to the surviving candidates
      val corpus = e.select(col("vec_id"),
          explode(lshBuckets(col("v"))).as("b"))
        .select(col("vec_id"), col("b.tbl"), col("b.bucket"))
      val queries = e.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("query_id"),
          explode(lshProbeBuckets(col("v"))).as("b"))
        .select(col("query_id"), col("b.tbl"), col("b.bucket"))
      val cand = corpus.join(broadcast(queries), Seq("tbl", "bucket"))
        .filter(col("query_id") =!= col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
      val scored = cand
        .join(e, "vec_id")
        .join(broadcast(e.filter(col("vec_id") < NQ)
          .select(col("vec_id").as("query_id"), col("v").as("qv"))),
          "query_id")
      val cos = cosineSim(col("qv"), col("v"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(cos.desc, col("vec_id"))
      scored.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          col("rank"), round(cos, 6).as("cosine"))
        .orderBy("query_id", "rank")
    },
    // deterministic end-to-end (seeded literal planes, id tie-breaks), so
    // the whole LSH pipeline is mirrorable: bucket = Σ 2^bit over positive
    // plane dots, corpus indexes exact buckets, queries probe exact+1-bit
    // flips, candidates score like brute force
    Some(s"""WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
    planes(tbl, bit, p) AS (VALUES
      $planesSql),
    sig AS (
      SELECT e.vec_id, pl.tbl,
        SUM(CASE WHEN list_dot_product(e.v, pl.p) > 0
          THEN 1 << pl.bit ELSE 0 END)::INT AS bucket
      FROM e, planes pl GROUP BY e.vec_id, pl.tbl),
    qsig AS (SELECT vec_id AS query_id, tbl, bucket FROM sig
      WHERE vec_id < $NQ),
    probes AS (
      SELECT query_id, tbl, bucket FROM qsig
      UNION ALL
      SELECT query_id, tbl, xor(bucket, (1 << f.range)::INT) AS bucket
      FROM qsig, range($BITS) f),
    cand AS (
      SELECT DISTINCT p.query_id, c.vec_id
      FROM sig c JOIN probes p USING (tbl, bucket)
      WHERE p.query_id <> c.vec_id),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $NQ)
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT cd.query_id, cd.vec_id AS neighbor_id,
        row_number() OVER (PARTITION BY cd.query_id
          ORDER BY list_cosine_similarity(q.qv, e.v) DESC, cd.vec_id)
          AS rank,
        round(list_cosine_similarity(q.qv, e.v), 6) AS cosine
      FROM cand cd
      JOIN q ON cd.query_id = q.query_id
      JOIN e ON cd.vec_id = e.vec_id)
    WHERE rank <= $K ORDER BY query_id, rank"""))

  // -------------------------------------------------------------- knn_ivf
  /** IVF-style coarse quantizer: the codebook is the 16 lowest-vec_id
    * vectors (deterministic, no driver collect — a 16-row broadcast join
    * assigns every corpus vector to its nearest centroid by cosine).
    * Queries probe their 4 nearest centroids and scan only those inverted
    * lists. Scale: lists are hash-partitioned by centroid; probe joins are
    * broadcast; recall tunes with nprobe.
    */
  private val NLIST = 16
  private val NPROBE = 4

  private val ivf = Q(
    "knn_ivf",
    (s, dir) => {
      val e = emb(s, dir)
      val cents = e.filter(col("vec_id") < NLIST)
        .select(col("vec_id").as("cent_id"), col("v").as("cv"))
      val simToCent = cosineSim(col("v"), col("cv"))
      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(simToCent.desc, col("cent_id"))
      val assigned = e.crossJoin(broadcast(cents))
        .withColumn("rk", row_number().over(wAssign))
        .filter(col("rk") === 1)
        .select(col("vec_id"), col("v"), col("cent_id"))
      val q = e.filter(col("vec_id") < NQ)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val qSim = cosineSim(col("qv"), col("cv"))
      val wProbe = Window.partitionBy(col("query_id"))
        .orderBy(qSim.desc, col("cent_id"))
      val probes = q.crossJoin(broadcast(cents))
        .withColumn("rk", row_number().over(wProbe))
        .filter(col("rk") <= NPROBE)
        .select(col("query_id"), col("qv"), col("cent_id"))
      val cand = assigned.join(broadcast(probes), "cent_id")
        .filter(col("query_id") =!= col("vec_id"))
      val cos = cosineSim(col("qv"), col("v"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(cos.desc, col("vec_id"))
      cand.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= K)
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          col("rank"), round(cos, 6).as("cosine"))
        .orderBy("query_id", "rank")
    },
    // fully deterministic (codebook = vec_id < NLIST, cosine ties broken
    // by id), so the whole IVF pipeline is mirrorable as ground truth
    Some(s"""WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
    cents AS (SELECT vec_id AS cent_id, v AS cv FROM e
      WHERE vec_id < $NLIST),
    assigned AS (
      SELECT vec_id, v, cent_id FROM (
        SELECT e.vec_id, e.v, c.cent_id,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY list_cosine_similarity(e.v, c.cv) DESC, c.cent_id)
            AS rk
        FROM e, cents c) WHERE rk = 1),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $NQ),
    probes AS (
      SELECT query_id, qv, cent_id FROM (
        SELECT q.query_id, q.qv, c.cent_id,
          row_number() OVER (PARTITION BY q.query_id
            ORDER BY list_cosine_similarity(q.qv, c.cv) DESC, c.cent_id)
            AS rk
        FROM q, cents c) WHERE rk <= $NPROBE)
    SELECT query_id, neighbor_id, rank, cosine FROM (
      SELECT p.query_id, a.vec_id AS neighbor_id,
        row_number() OVER (PARTITION BY p.query_id
          ORDER BY list_cosine_similarity(p.qv, a.v) DESC, a.vec_id)
          AS rank,
        round(list_cosine_similarity(p.qv, a.v), 6) AS cosine
      FROM probes p JOIN assigned a ON p.cent_id = a.cent_id
      WHERE p.query_id <> a.vec_id)
    WHERE rank <= $K ORDER BY query_id, rank"""))

  val all: Seq[Q] = Seq(bruteforce, lsh, ivf)
}
