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

  private def dot(v: Column, plane: Array[Double]): Column =
    graft.functions.CosineSim.dotProduct(v, typedLit(plane.toSeq))

  /** Sign-bit bucket of `v` in table `t` (one bit per hyperplane). */
  def bucketFor(planes: Array[Array[Array[Double]]], v: Column,
      t: Int): Column =
    planes(t).indices.map { b =>
      when(dot(v, planes(t)(b)) > 0, lit(1 << b)).otherwise(lit(0))
    }.reduce(_ + _)

  /** array<struct<tbl:int,bucket:int>> signature for a vector column. */
  def buckets(planes: Array[Array[Array[Double]]], v: Column): Column =
    array(planes.indices.map { t =>
      struct(lit(t).as("tbl"), bucketFor(planes, v, t).as("bucket"))
    }: _*)

  /** Multiprobe signature: the exact bucket plus every 1-bit-flip
    * neighbor (bits near the hyperplane are the likeliest to disagree for
    * true neighbors). Probing 1+bits buckets per table lifts recall
    * without growing the corpus index — the standard query-side/state-side
    * trade at scale.
    */
  def probeBuckets(planes: Array[Array[Array[Double]]], v: Column): Column =
    array(planes.indices.flatMap { t =>
      val bits = planes(t).length
      val bucket = bucketFor(planes, v, t)
      struct(lit(t).as("tbl"), bucket.as("bucket")) +:
        (0 until bits).map { flip =>
          struct(lit(t).as("tbl"),
            bucket.bitwiseXOR(lit(1 << flip)).as("bucket"))
        }
    }: _*)
}
