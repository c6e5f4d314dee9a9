package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic bounded probe set for eval/honesty cards whose protocol
  * is an exact grid (recall cards): the card evaluates every pair
  * INCIDENT to the [[CAP]] lowest-hash-rank ids — the whole corpus when
  * it is smaller (every gate sf: ≤ 500 ids, so gated values are
  * untouched), a FIXED-SIZE probe set above (bench-only sfs), which
  * turns the card's grid from O(n²) into O(CAP·n). A fixed-COUNT cap,
  * never a fixed fraction or an id bound: a fraction keeps the grid
  * quadratic in disguise (the r16 decontam lesson) and an id bound
  * silently empties on strided/regenerated ids (ids here reach 2⁴³).
  *
  * The hash is pure modular integer arithmetic both engines state
  * identically — `(id % P) · A % P` with P prime and (id % P)·A < 2⁶²,
  * so Spark cannot wrap where DuckDB would raise (the r14 packed-key
  * rule) — and selection is ORDER BY (h, id) LIMIT CAP: a distributed
  * top-k (TakeOrderedAndProject) in Spark, never a single-task global
  * window, so the probe build itself scales.
  */
object EvalProbe {
  /** Probe-set size. Must stay ≥ every gate-sf corpus (sf0.01: 500
    * docs/vectors) so the oracle gate always runs the FULL grid —
    * sampling only ever engages at bench-only scale.
    */
  val CAP = 2048

  private val P = 1000003L
  private val A = 8191L

  /** `(id % P) * A % P` — the rank key, nonneg ids only. */
  def hashRank(id: Column): Column = id % P * A % P

  /** The ≤ [[CAP]] probe ids of `df`'s `idCol`, as a 1-column frame
    * (same column name). Broadcast-sized by construction.
    */
  def probeIds(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol))
      .orderBy(hashRank(col(idCol)), col(idCol))
      .limit(CAP)

  /** DuckDB mirror of [[probeIds]]: a CTE body selecting `idCol` from
    * `srcCte` — interpolate as `pr AS MATERIALIZED (${sqlProbeIds(...)})`.
    */
  def sqlProbeIds(srcCte: String, idCol: String): String =
    s"""SELECT $idCol FROM $srcCte
      ORDER BY ($idCol % $P) * $A % $P, $idCol LIMIT $CAP"""
}
