package graft.text

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Sequence packing — the concat-and-split stage that turns a cleaned
  * corpus into fixed-length training sequences: documents are laid out
  * in a canonical global order (doc_id), their tokens concatenated, and
  * the token stream cut into CTX-token sequences. Each document reports
  * the token offset it starts at and the first/last sequence it lands
  * in (a doc spanning a cut contributes to two+ sequences — the
  * standard packing trade the attention mask handles downstream).
  *
  * The global token offset is an EXCLUSIVE PREFIX SUM, computed the
  * distributed way — NOT a single global window (which would funnel
  * 100 TB through one partition): docs group into doc_id-blocks, (1)
  * one thin map-side-combined aggregate gets per-block token sums, (2)
  * a window over the tiny block-sum table (|blocks| rows, one
  * exchange) gets exclusive block prefixes, (3) the prefixes broadcast
  * back and a window PARTITIONED BY block (bounded partitions, ~BLOCK
  * docs each) adds the within-block exclusive sum. Recurse step 2 if
  * even |blocks| outgrows one task — the textbook two-level scan.
  *
  * Integer arithmetic end-to-end; the DuckDB oracle states the same
  * prefix sum as one global window (its single-node privilege), so the
  * gate proves the two-level decomposition exact.
  */
object Packing {

  /** Tokens per packed training sequence. */
  val CTX = 64
  /** Docs per prefix-sum block. */
  val BLOCK = 100

  /** The two-level distributed prefix sum + sequence mapping over a
    * `(doc_id, n_tokens)` frame — `block` is the decomposition width
    * (PackingSpec proves offsets are block-size invariant).
    */
  def packed(d: org.apache.spark.sql.DataFrame, ctx: Int = CTX,
      block: Int = BLOCK): org.apache.spark.sql.DataFrame = {
    val b = d.withColumn("blk", expr(s"doc_id DIV $block"))
    val blockSums = b.groupBy("blk")
      .agg(sum("n_tokens").as("blk_sum"))
    // |blocks| rows — a window over ONE tiny exchange, not the corpus
    val wBlk = Window.orderBy("blk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val blockPrefix = blockSums
      .withColumn("blk_before", coalesce(sum("blk_sum").over(wBlk),
        lit(0L)))
      .select("blk", "blk_before")
    val wIn = Window.partitionBy("blk").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    b.join(broadcast(blockPrefix), "blk")
      .withColumn("in_before", coalesce(sum("n_tokens").over(wIn),
        lit(0L)))
      .withColumn("start_offset", col("blk_before") + col("in_before"))
      .select(col("doc_id"), col("n_tokens"), col("start_offset"),
        when(col("n_tokens") > 0, expr(s"start_offset DIV $ctx"))
          .as("seq_first"),
        when(col("n_tokens") > 0,
          expr(s"(start_offset + n_tokens - 1) DIV $ctx"))
          .as("seq_last"))
  }

  private val pack = Q(
    "pack_sequences",
    (s, dir) =>
      packed(Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens")))
        .orderBy("doc_id"),
    Some(s"""WITH d AS (
      SELECT doc_id,
        len(list_filter(string_split(text,' '), t -> t <> ''))::BIGINT
          AS n_tokens
      FROM documents),
    o AS (SELECT doc_id, n_tokens,
        (COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT
          AS start_offset
      FROM d)
    SELECT doc_id, n_tokens, start_offset,
      (CASE WHEN n_tokens > 0
        THEN start_offset // $CTX END)::BIGINT AS seq_first,
      (CASE WHEN n_tokens > 0
        THEN (start_offset + n_tokens - 1) // $CTX END)::BIGINT AS seq_last
    FROM o ORDER BY doc_id"""))

  // ------------------------------------------------ pack_sequences_bestfit
  /** Bins per deterministic doc_id shard. */
  val BF_SHARD = 100
  /** Bin capacity for the doc-preserving packer — above the corpus max
    * doc length, so every document lands WHOLE in one bin (the
    * fewer-truncations regime; real pipelines pick ctx ≥ 2048 for the
    * same reason).
    */
  val BF_CTX = 128

  /** First-fit-DECREASING doc-preserving packing over a
    * `(doc_id, n_tokens)` frame — the bin-packing alternative to
    * [[packed]]'s concat-and-split: documents are never cut at sequence
    * boundaries; each goes whole into the first bin (capacity `ctx`)
    * that still fits it, processed in (n_tokens desc, doc_id) order.
    * FFD guarantees ≤ 11/9·OPT + 1 bins — near-optimal occupancy with
    * zero cross-document attention contamination.
    *
    * Distribution contract: packing runs INDEPENDENTLY per
    * deterministic doc_id shard (`doc_id DIV shard` — bounded, dense),
    * the per-shard best-fit shape production packers use (Ding et al.
    * 2024): one groupBy(shard) exchange collects each shard's
    * ≤shard-row item list, `array_sort` fixes the (n desc, doc_id)
    * walk order, and the [[graft.functions.FirstFitBins]] kernel runs
    * the sequential greedy per shard — thousands of shards pack in
    * parallel, no global sequential state, and a 100× corpus is 100×
    * shards at the same per-shard cost. The DuckDB oracle states the
    * IDENTICAL greedy as a recursive CTE over per-shard bin-state
    * lists (one iteration per item; CASE on list values is avoided —
    * DuckDB 1.0 re-materializes both CASE branches per iteration,
    * doubling the list — by always appending a virtual fresh bin
    * before the first-fit scan), so assignments, bin ids AND offsets
    * hash-gate.
    */
  def firstFitPacked(d: org.apache.spark.sql.DataFrame, ctx: Int = BF_CTX,
      shard: Int = BF_SHARD): org.apache.spark.sql.DataFrame = {
    val items = d
      .withColumn("shard", expr(s"doc_id DIV $shard"))
      .groupBy("shard")
      .agg(array_sort(collect_list(struct(
        (-col("n_tokens")).as("negn"), col("doc_id").as("doc_id"))))
        .as("items"))
    items
      .select(col("shard"), explode(org.apache.spark.sql.graft.Shim.column(
        graft.functions.FirstFitBins(
          org.apache.spark.sql.graft.Shim.expression(col("items")), ctx)))
        .as("p"))
      .select(col("p.doc_id").as("doc_id"), col("p.n").as("n_tokens"),
        col("shard"), col("p.bin").as("bin"), col("p.off").as("bin_off"))
  }

  private val packBestfit = Q(
    "pack_sequences_bestfit",
    (s, dir) =>
      firstFitPacked(Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(TextOps.tokens(col("text"))).cast("long").as("n_tokens")))
        .orderBy("doc_id"),
    Some(s"""WITH RECURSIVE d AS (
      SELECT doc_id,
        len(list_filter(string_split(text,' '), t -> t <> ''))::BIGINT AS n,
        doc_id // $BF_SHARD AS shard
      FROM documents),
    its AS (
      SELECT shard,
        list(struct_pack(doc_id := doc_id, n := n)
          ORDER BY n DESC, doc_id) AS its
      FROM d GROUP BY shard),
    rec AS (
      SELECT shard, its, 1 AS i, []::BIGINT[] AS rems,
        []::BIGINT[] AS fills,
        []::STRUCT(doc_id BIGINT, n BIGINT, bin BIGINT, off BIGINT)[]
          AS placed
      FROM its
      UNION ALL
      SELECT shard, its, i + 1,
        r2[1:j-1] || [r2[j] - n] || r2[j+1:nb],
        f2[1:j-1] || [f2[j] + n] || f2[j+1:nb],
        placed || [struct_pack(doc_id := doc_id, n := n,
          bin := j::BIGINT, off := f2[j])]
      FROM (
        SELECT shard, its, i, rems, fills, placed, doc_id, n, r2, f2, nb,
          list_position(list_transform(r2, x -> x >= n), true) AS j
        FROM (
          SELECT shard, its, i, rems, fills, placed,
            its[i].doc_id AS doc_id, its[i].n AS n,
            rems || [greatest($BF_CTX, its[i].n)] AS r2,
            fills || [0::BIGINT] AS f2,
            len(rems) AS nb
          FROM rec WHERE i <= len(its)) a) b)
    SELECT p.doc_id AS doc_id, p.n AS n_tokens, shard, p.bin AS bin,
      p.off AS bin_off
    FROM (SELECT shard, unnest(placed) AS p
      FROM rec WHERE i = len(its) + 1)
    ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(pack, packBestfit)
}
