package graft

import org.apache.spark.sql.functions._

/** Properties of the two-level prefix-sum packing (the oracle gate
  * proves equality with DuckDB's single global window; this proves the
  * decomposition is exact for ANY block width and the layout is gapless).
  */
class PackingSpec extends SparkSpec {

  private def counts = Tables(spark, sfDir, "documents")
    .select(col("doc_id"),
      size(text.TextOps.tokens(col("text"))).cast("long").as("n_tokens"))

  test("offsets are block-size invariant (two-level scan is exact)") {
    def rows(block: Int) = text.Packing.packed(counts, block = block)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val base = rows(100)
    assert(rows(7) == base && rows(1) == base && rows(100000) == base)
  }

  test("packed layout is gapless and ordered") {
    val rows = text.Packing.packed(counts)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var expect = 0L
    rows.foreach { case (_, n, start) =>
      assert(start == expect, "each doc starts where the previous ended")
      expect = start + n
    }
    val total = counts.agg(sum("n_tokens")).collect()(0).getLong(0)
    assert(expect == total, "offsets cover the full token stream")
  }
}
