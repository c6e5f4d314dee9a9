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

  test("firstFitPacked == a driver-side sequential FFD per shard; " +
      "docs whole, capacity respected, FFD occupancy bound holds") {
    val ctx = text.Packing.BF_CTX
    val got = text.Packing.firstFitPacked(counts)
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))))
      .toMap
    val raw = counts.collect().map(r => (r.getLong(0), r.getLong(1)))
    // every doc exactly once, whole
    assert(got.size == raw.length)
    raw.foreach { case (id, n) => assert(got(id)._1 == n, s"doc $id") }
    // driver-side sequential FFD reference, shard by shard
    raw.groupBy(_._1 / text.Packing.BF_SHARD).foreach { case (shard, docs) =>
      val items = docs.map { case (id, n) => (n, id) }
        .sortBy { case (n, id) => (-n, id) }
      val rem = scala.collection.mutable.ArrayBuffer.empty[Long]
      val fill = scala.collection.mutable.ArrayBuffer.empty[Long]
      items.foreach { case (n, id) =>
        var j = 0
        while (j < rem.length && rem(j) < n) j += 1
        // max(ctx, n) = the oracle's greatest(ctx, n) virtual bin: an
        // oversized item's dedicated bin ends at remaining 0, not
        // negative, so a zero-token doc can still land in it
        if (j == rem.length) { rem += math.max(ctx.toLong, n); fill += 0L }
        assert(got(id) == ((n, shard, (j + 1).toLong, fill(j))),
          s"doc $id in shard $shard")
        fill(j) += n
        rem(j) -= n
      }
      // capacity and the FFD guarantee (bins <= 11/9 * OPT + 1)
      assert(fill.forall(_ <= ctx), s"shard $shard overfills a bin")
      val lower = (docs.map(_._2).sum + ctx - 1) / ctx
      assert(rem.length <= lower * 11 / 9 + 1,
        s"shard $shard: ${rem.length} bins vs lower bound $lower")
    }
  }

  test("firstFitPacked gives an oversized doc a dedicated whole bin") {
    import spark.implicits._
    val ctx = text.Packing.BF_CTX
    val d = Seq((0L, (ctx + 50).toLong), (1L, 60L), (2L, 60L), (3L, 8L))
      .toDF("doc_id", "n_tokens")
    val rows = text.Packing.firstFitPacked(d)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows(0L) == ((1L, 0L)), "oversized doc opens bin 1, kept whole")
    assert(rows(1L) == ((2L, 0L)) && rows(2L) == ((2L, 60L)),
      "nothing shares the oversized bin; 60+60 pack together")
    assert(rows(3L) == ((2L, 120L)), "8 fits the 128-bin after 60+60")
  }

  test("a zero-token doc behind an oversized doc lands in its " +
      "remaining-0 dedicated bin — the oracle's greatest(ctx, n) rule") {
    import spark.implicits._
    val ctx = text.Packing.BF_CTX
    // FFD order: the oversized doc first, then the zero-token doc; the
    // oversized bin's remaining is exactly 0 (max(ctx, n) − n), which
    // admits n = 0 in BOTH engines — a ctx-sized bin gone negative
    // would reject it in the kernel only and break the hash gate
    val d = Seq((0L, (ctx + 72).toLong), (1L, 0L))
      .toDF("doc_id", "n_tokens")
    val rows = text.Packing.firstFitPacked(d)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(3), r.getLong(4))))
      .toMap
    assert(rows(0L) == ((1L, 0L)), "oversized doc opens bin 1")
    assert(rows(1L) == ((1L, (ctx + 72).toLong)),
      "zero-token doc joins the saturated bin at its fill offset")
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
