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

  /** (codes: array<long>, scale: double) columns for a vector column. */
  def int8Codes(v: Column): (Column, Column) = {
    val scale = array_max(transform(v, x => abs(x))) / 127.0
    val codes = transform(v, x =>
      when(scale === 0.0, lit(0L)).otherwise(round(x / scale).cast("long")))
    (codes, scale)
  }

  private val quantize = Q(
    "emb_quantize",
    (s, dir) => {
      val e = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      val (codes, scale) = int8Codes(col("v"))
      e.withColumn("codes", codes).withColumn("scale_raw", scale)
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
