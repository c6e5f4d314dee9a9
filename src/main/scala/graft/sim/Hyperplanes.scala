package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Seeded random-hyperplane (sign-LSH) bucket machinery, shared by
  * [[Knn]] (knn_lsh) and [[graft.dedup.Dedup]] (dedup_embedding_lsh).
  *
  * The plane bank is generated from a fixed seed at plan-compile time and
  * embedded as literals, so signatures are deterministic across runs,
  * executors, and engines — no fitting step, no driver collect, nothing
  * shipped but the plan itself.
  */
object Hyperplanes {

  /** Plane bank [table][bit][dim] of unit-free gaussians. */
  def bank(tables: Int, bits: Int, dim: Int,
      seed: Long): Array[Array[Array[Double]]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(tables, bits)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Raw `array<int>` signature (bucket id per table) via the single
    * codegen'd [[graft.functions.HyperplaneBuckets]] kernel. The bank
    * rides as one reference object instead of tables·bits·dim literals —
    * the literal form made Catalyst analysis + Janino compilation the
    * dominant cost of every LSH query.
    */
  def rawSignature(planes: Array[Array[Array[Double]]], v: Column): Column =
    org.apache.spark.sql.graft.Shim.column(
      graft.functions.HyperplaneBuckets(
        org.apache.spark.sql.graft.Shim.expression(v),
        planes.flatten.flatten, planes.length, planes(0).length,
        planes(0)(0).length))

  /** array<struct<tbl:int,bucket:int>> signature for a vector column. */
  def buckets(planes: Array[Array[Array[Double]]], v: Column): Column =
    transform(rawSignature(planes, v),
      (b, t) => struct(t.cast("int").as("tbl"), b.as("bucket")))

  /** Multiprobe signature: the exact bucket plus every 1-bit-flip
    * neighbor (bits near the hyperplane are the likeliest to disagree for
    * true neighbors). Probing 1+bits buckets per table lifts recall
    * without growing the corpus index — the standard query-side/state-side
    * trade at scale. Flips are int XORs on the computed signature, not
    * re-evaluated dot products.
    */
  def probeBuckets(planes: Array[Array[Array[Double]]], v: Column): Column = {
    val bits = planes(0).length
    val masks = lit(0) +: (0 until bits).map(f => lit(1 << f))
    flatten(transform(rawSignature(planes, v),
      (b, t) => array(masks.map(m =>
        struct(t.cast("int").as("tbl"),
          b.bitwiseXOR(m).as("bucket"))): _*)))
  }
}
