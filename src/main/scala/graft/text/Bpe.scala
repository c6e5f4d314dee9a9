package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Trained-tokenizer export — byte/char-level BPE merge learning
  * (Sennrich, Haddow, Birch, "Neural Machine Translation of Rare Words
  * with Subword Units", ACL 2016): learn the top-R most frequent
  * adjacent-symbol merges from the corpus and export the merge table
  * (rank, x, y, merged, pair count) — the trained artifact a tokenizer
  * applies, the BPE twin of text_ngram_lm's bigram-LM export.
  *
  * Distributed shape (the Sennrich insight that makes BPE cheap): train
  * on the WORD-FREQUENCY DICTIONARY, not the running text. The corpus
  * is touched exactly once (map-side tokenize + one vocab-bounded word
  * count); all R rounds then operate on the thin (word, n, seq) frame —
  * per round ONE pair-count aggregate (vocab-bounded exchange) and one
  * 1-row broadcast of the winning pair, the kmeans_train loop shape. At
  * 100 TB the dictionary is millions of rows against billions of docs —
  * the rounds cost nothing relative to the one corpus pass.
  *
  * Cross-engine exactness (the kmeans_train argument — a fixed-round
  * iterative algorithm CAN be gated): symbol sequences are SPACE-JOINED
  * sentinel-wrapped strings (" c a t "), so
  *  - pair extraction is adjacent elements of `split(trim(seq), ' ')`
  *    (overlapping pairs counted naively — "a a a" yields (a,a)×2 —
  *    Sennrich's counting convention);
  *  - the winning pair is an exact integer argmax with (count DESC,
  *    x ASC, y ASC) byte-lexicographic tie-break, identical in both
  *    engines;
  *  - the merge is `replace(seq, " x y ", " xy ")` applied TWICE:
  *    left-to-right non-overlapping `replace` consumes the shared
  *    boundary space, blocking every second match in a run ("x y x y"
  *    merges only pair 1 in pass one) — but blocked matches are never
  *    adjacent (pass one always takes the first of two adjacent
  *    candidates) and a replacement cannot create a new (x, y) symbol
  *    adjacency (it only fuses x y into xy), so pass two catches
  *    exactly the blocked matches and the double-replace reproduces the
  *    sequential left-to-right merge. Both engines' `replace` are
  *    left-to-right non-overlapping, so the sequences stay identical.
  *
  * BpeSpec pins the export against an independent driver-side BPE
  * (priority queue over pair counts) and the max-count monotonicity
  * invariant (merging can only create pairs no more frequent than the
  * round's winner).
  */
object Bpe {

  /** Fixed merge-round count (the export is ranks 1..R). */
  private[graft] val ROUNDS = 8

  /** " c a t " — sentinel-wrapped space-joined character symbols. */
  private def charSeq(word: Column): Column =
    concat(lit(" "), regexp_replace(word, "(.)", "$1 "))

  /** Adjacent symbol pairs of a sequence string, as structs (x, y). */
  private def adjacentPairs(seq: Column): Column = {
    val syms = split(trim(seq), " ")
    when(size(syms) >= 2,
      transform(sequence(lit(0), size(syms) - 2), i =>
        struct(element_at(syms, i + 1).as("x"),
          element_at(syms, i + 2).as("y"))))
      .otherwise(array().cast("array<struct<x:string,y:string>>"))
  }

  /** One BPE round over the (word, n, seq) dictionary: count pairs,
    * pick the winner, double-replace it in every sequence. Returns
    * (winner row with rank, merged dictionary).
    */
  private def round(w: DataFrame, rank: Int): (DataFrame, DataFrame) = {
    val best = w
      .select(col("n"), explode(adjacentPairs(col("seq"))).as("p"))
      .groupBy(col("p.x").as("x"), col("p.y").as("y"))
      .agg(sum("n").as("c"))
      .orderBy(col("c").desc, col("x"), col("y"))
      .limit(1)
      .transform(graft.Checkpoint.of)
    val pat = concat(lit(" "), col("x"), lit(" "), col("y"), lit(" "))
    val rep = concat(lit(" "), col("x"), col("y"), lit(" "))
    val merged = w.crossJoin(broadcast(best.select("x", "y")))
      .withColumn("seq", replace(replace(col("seq"), pat, rep), pat, rep))
      .select("word", "n", "seq")
      .transform(graft.Checkpoint.of)
    (best.withColumn("rank", lit(rank).cast("long")), merged)
  }

  /** Train and ALSO return the final merged dictionary state — applying
    * the learned table in rank order to the training dictionary IS the
    * trainer's final state, so `apply` reads it directly.
    */
  private def trainFull(docs: DataFrame,
      rounds: Int): (DataFrame, DataFrame) = {
    val dict = docs
      .select(explode(TextOps.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(col("word"), col("n"), charSeq(col("word")).as("seq"))
      .transform(graft.Checkpoint.of)
    val (winners, fin) = (1 to rounds).foldLeft(
        (Seq.empty[DataFrame], dict)) { case ((acc, w), r) =>
      val (best, merged) = round(w, r)
      (acc :+ best, merged)
    }
    (winners.reduce(_ unionAll _)
      .select(col("rank"), col("x"), col("y"),
        concat(col("x"), col("y")).as("merged"), col("c"))
      .orderBy("rank"), fin)
  }

  /** The merge table for `docs`' corpus: (rank, x, y, merged, c). */
  private[graft] def train(docs: DataFrame, rounds: Int): DataFrame =
    trainFull(docs, rounds)._1

  /** The final per-word segmentation under the trained tokenizer:
    * (word, n, n_sym = BPE tokens for one occurrence of the word).
    */
  private[graft] def segmentation(docs: DataFrame,
      rounds: Int): DataFrame =
    trainFull(docs, rounds)._2
      .select(col("word"), col("n"),
        size(split(trim(col("seq")), " ")).cast("long").as("n_sym"))

  private def sqlRounds(rounds: Int): String = {
    val cte = new StringBuilder
    cte ++= """w0 AS (
      SELECT word, n, ' ' || regexp_replace(word, '(.)', '\1 ', 'g') AS seq
      FROM dict)"""
    for (r <- 1 to rounds) {
      val p = r - 1
      cte ++= s""",
    p$r AS (
      SELECT u.p.x AS x, u.p.y AS y, SUM(t.n) AS c
      FROM (SELECT n, string_split(trim(seq), ' ') AS s FROM w$p) t,
        UNNEST([struct_pack(x := t.s[i], y := t.s[i + 1])
          for i in range(1, len(t.s))]) u(p)
      GROUP BY 1, 2),
    b$r AS (SELECT x, y, c FROM p$r ORDER BY c DESC, x, y LIMIT 1),
    w$r AS (
      SELECT word, n,
        replace(replace(seq, ' ' || x || ' ' || y || ' ',
                             ' ' || x || y || ' '),
                        ' ' || x || ' ' || y || ' ',
                             ' ' || x || y || ' ') AS seq
      FROM w$p CROSS JOIN b$r)"""
    }
    cte.toString
  }

  private val bpeTrain = Q(
    "text_bpe_train",
    (s, dir) =>
      train(Tables(s, dir, "documents").select("text"), ROUNDS),
    Some {
      val unioned = (1 to ROUNDS)
        .map(r => s"SELECT ${r}::BIGINT AS rank, x, y, c FROM b$r")
        .mkString("\n      UNION ALL ")
      s"""WITH dict AS (
      SELECT u.t AS word, COUNT(*) AS n
      FROM documents,
        UNNEST(list_filter(string_split(text, ' '), t -> t <> '')) u(t)
      GROUP BY 1),
    ${sqlRounds(ROUNDS)}
    SELECT rank, x, y, x || y AS merged, c::BIGINT AS c
    FROM ($unioned)
    ORDER BY rank"""})

  /** TOKENIZER APPLICATION — the twin that closes the train/apply loop
    * (text_ngram_lm → text_lm_score is the same pairing for the LM):
    * tokenize the corpus under the learned merge table and report, per
    * document, the whitespace word count, the BPE token count, and the
    * integer milli-FERTILITY (BPE tokens per 1000 words — the standard
    * tokenizer-quality metric packing budgets are sized from).
    *
    * Applying the merge table in rank order to the training dictionary
    * reproduces the trainer's final state exactly (each rank-r
    * double-replace sees precisely the post-rank-(r−1) sequences), so
    * the per-word segmentation comes straight from the final dictionary
    * — the corpus is re-touched only to EXPLODE doc words against the
    * broadcastable (word, n_sym) table: one map-side-combined per-doc
    * aggregate, everything integer (`n_bpe·1000 DIV n_ws`), so the row
    * hash-gates. At 100 TB: dictionary rounds are vocab-bounded; the
    * corpus pass is one tokenize-explode-join-agg with the segmentation
    * table broadcast — no corpus self-join anywhere.
    */
  private val bpeApply = Q(
    "text_bpe_apply",
    (s, dir) => {
      val docs = Tables(s, dir, "documents")
      val seg = segmentation(docs.select("text"), ROUNDS)
        .select("word", "n_sym")
        .transform(graft.Checkpoint.of)
      docs.select(col("doc_id"),
          explode(TextOps.tokens(col("text"))).as("word"))
        .join(broadcast(seg), "word")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_ws"), sum("n_sym").as("n_bpe"))
        .select(col("doc_id"), col("n_ws"), col("n_bpe"),
          expr("n_bpe * 1000 DIV n_ws").as("fertility_milli"))
        .orderBy("doc_id")
    },
    Some {
      s"""WITH dict AS (
      SELECT u.t AS word, COUNT(*) AS n
      FROM documents,
        UNNEST(list_filter(string_split(text, ' '), t -> t <> '')) u(t)
      GROUP BY 1),
    ${sqlRounds(ROUNDS)},
    seg AS (
      SELECT word, len(string_split(trim(seq), ' '))::BIGINT AS n_sym
      FROM w$ROUNDS),
    words AS (
      SELECT doc_id, u.t AS word
      FROM documents,
        UNNEST(list_filter(string_split(text, ' '), t -> t <> '')) u(t))
    SELECT w.doc_id, COUNT(*)::BIGINT AS n_ws,
      SUM(s.n_sym)::BIGINT AS n_bpe,
      ((SUM(s.n_sym) * 1000) // COUNT(*))::BIGINT AS fertility_milli
    FROM words w JOIN seg s USING (word)
    GROUP BY w.doc_id ORDER BY w.doc_id"""})

  val all: Seq[Q] = Seq(bpeTrain, bpeApply)
}
