package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, TimestampNTZType, TimestampType}

import graft.{Q, Tables}

/** TABLE PROFILING — the ANALYZE/stats-collection pass every warehouse
  * runs before planning and every data pipeline runs on intake QA: one
  * row per column with exact row/null/NDV counts and stringified
  * min/max.
  *
  * Scale shape — the important call is what NOT to plan: a single
  * aggregate with one `COUNT(DISTINCT c)` per column makes Spark plan
  * an Expand that multiplies every row by the column count before the
  * exchange (a 16-column table shuffles 16× its rows). Instead each
  * column gets its OWN tiny aggregate and the 1-row results union: on
  * a columnar store every branch's scan prunes to exactly its own
  * column, so the union reads the table's bytes ONCE in total, each
  * branch is a map-side-combined partial agg (hash-distinct for NDV),
  * and nothing expands. Branches are independent → the scheduler runs
  * them concurrently.
  *
  * Exactness: counts are BIGINTs; min/max stringify via each engine's
  * shortest-round-trip double / plain int formatting (bit-identical),
  * EXCEPT timestamps, which go through epoch millis (integer) before
  * the cast — engines disagree on trailing-zero trimming in timestamp
  * text, integers can't.
  */
object Profile {

  /** Generic per-column profile of any DataFrame. */
  def profileTable(df: DataFrame): DataFrame =
    df.schema.fields.map { case StructField(name, dt, _, _) =>
      val c = col(name)
      val strOf = (x: org.apache.spark.sql.Column) => dt match {
        // NTZ → LTZ is instant-preserving in the UTC session
        case TimestampType | TimestampNTZType =>
          unix_millis(x.cast("timestamp")).cast("string")
        case _ => x.cast("string")
      }
      df.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(c)).as("n_nulls"),
        countDistinct(c).as("ndv"),
        strOf(min(c)).as("min_str"),
        strOf(max(c)).as("max_str"))
        .select(lit(name).as("column"), col("n_rows"), col("n_nulls"),
          col("ndv"), col("min_str"), col("max_str"))
    }.reduce(_ unionAll _).orderBy("column")

  private val profile = Q(
    "profile_table",
    (s, dir) => profileTable(Tables(s, dir, "lineitem")),
    Some {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate")
      cols.map { c =>
        val mn = if (c == "l_shipdate") s"epoch_ms(MIN($c))::VARCHAR"
                 else s"MIN($c)::VARCHAR"
        val mx = if (c == "l_shipdate") s"epoch_ms(MAX($c))::VARCHAR"
                 else s"MAX($c)::VARCHAR"
        s"""SELECT '$c' AS "column", COUNT(*)::BIGINT AS n_rows,
          (COUNT(*) - COUNT($c))::BIGINT AS n_nulls,
          COUNT(DISTINCT $c)::BIGINT AS ndv,
          $mn AS min_str, $mx AS max_str FROM lineitem"""
      }.mkString("", "\n      UNION ALL ", "\n      ORDER BY \"column\"")
    })

  val all: Seq[Q] = Seq(profile)
}
