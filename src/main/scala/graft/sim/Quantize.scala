package graft.sim

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Embedding compression — symmetric per-vector int8 scalar quantization
  * (the standard storage step before shipping embeddings to a trainer:
  * 4× smaller than float32, dequantize = code · scale).
  *
  * `scale = max|x| / 127`, `code_i = round(x_i / scale)` ∈ [-127, 127]
  * (the max element lands exactly on ±127, so no clamp is needed;
  * all-zero vectors quantize to zeros with scale 0).
  *
  * Determinism: scale/codes/errors are IEEE ops on identical inputs in
  * both engines; the oracle compares integer code summaries plus the
  * max (order-independent, unlike a sum) absolute reconstruction error,
  * rounded 6 dp both sides.
  */
object Quantize {

  /** int8 codes for a vector column given its precomputed scale. The
    * scale must be a MATERIALIZED attribute, not the max-abs expression:
    * CollapseProject would inline that expression into the per-element
    * lambda and re-run the O(d) max once per element (O(d²)/row).
    */
  def int8Codes(v: Column, scaleAttr: Column): Column =
    transform(v, x => when(scaleAttr === 0.0, lit(0L))
      .otherwise(round(x / scaleAttr).cast("long")))

  /** Per-vector scale = max|x| / 127. */
  def int8Scale(v: Column): Column =
    array_max(transform(v, x => abs(x))) / 127.0

  private val quantize = Q(
    "emb_quantize",
    (s, dir) => {
      // checkpoint so scale_raw is a plain attribute inside the code
      // lambdas (see int8Codes); the table is small and the HOFs here
      // run O(d) per element on it — this is a storage/demo op, the hot
      // kernels live in graft.functions
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("scale_raw", int8Scale(col("v")))
        .transform(graft.Checkpoint.of)
      e.withColumn("codes", int8Codes(col("v"), col("scale_raw")))
        .select(
          col("vec_id"),
          round(col("scale_raw"), 6).as("scale"),
          aggregate(col("codes"), lit(0L), _ + _).as("code_sum"),
          array_min(col("codes")).as("code_min"),
          array_max(col("codes")).as("code_max"),
          round(array_max(zip_with(col("v"), col("codes"),
            (x, q) => abs(x - q * col("scale_raw")))), 6)
            .as("max_abs_err"))
        .orderBy("vec_id")
    },
    Some("""WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
    q AS (
      SELECT vec_id, v,
        list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale_raw
      FROM e),
    c AS (
      SELECT vec_id, v, scale_raw,
        list_transform(v, x -> CASE WHEN scale_raw = 0 THEN 0
          ELSE CAST(round(x / scale_raw) AS BIGINT) END) AS codes
      FROM q)
    SELECT vec_id,
      round(scale_raw, 6) AS scale,
      CAST(list_sum(codes) AS BIGINT) AS code_sum,
      CAST(list_min(codes) AS BIGINT) AS code_min,
      CAST(list_max(codes) AS BIGINT) AS code_max,
      round(list_max([abs(v[i] - codes[i] * scale_raw)
        for i in range(1, len(v) + 1)]), 6) AS max_abs_err
    FROM c ORDER BY vec_id"""))

  val all: Seq[Q] = Seq(quantize)
}
