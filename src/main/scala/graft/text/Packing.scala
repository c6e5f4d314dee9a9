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

  val all: Seq[Q] = Seq(pack)
}
