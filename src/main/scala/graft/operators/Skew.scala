package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation — SURVEY.md §6. AQE's skew-join splitting handles
  * sort-merge joins adaptively; explicit salting is the deterministic tool
  * for the cases AQE can't fix (aggregations on a hot key, or when one
  * replicated side must stay a broadcast/hash join).
  */
object Skew {

  /** Salted inner equi-join for a skewed left side: left rows get a random
    * salt in [0, parts); every right row is replicated `parts` times; the
    * join key becomes (key, salt), spreading a hot key over `parts`
    * reducers. Right replication costs |R|·parts — use for small-ish right
    * sides (dimension tables with hot foreign keys).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      parts: Int): DataFrame = {
    val l = left.withColumn("_salt",
      (rand(42) * parts).cast("int"))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(parts - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase (partial → final) aggregation with explicit salting: phase 1
    * aggregates on (key, salt) — spreading a hot key across reducers —
    * phase 2 merges the `parts` partials per key. `aggs` must be
    * decomposable (sum/count/min/max); pass the SAME column names for both
    * phases.
    *
    * Spark's hash aggregate already partial-aggregates map-side, which
    * handles most skew; explicit salting matters when per-key state is
    * too big for one reducer even AFTER map-side combine (e.g. huge
    * collect-style or high-cardinality-distinct state).
    */
  def saltedAgg(df: DataFrame, key: String, parts: Int,
      phase1: Seq[Column], phase2: Seq[Column]): DataFrame =
    df.withColumn("_salt", (rand(42) * parts).cast("int"))
      .groupBy(col(key), col("_salt"))
      .agg(phase1.head, phase1.tail: _*)
      .groupBy(col(key))
      .agg(phase2.head, phase2.tail: _*)
}
