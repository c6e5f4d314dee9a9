package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Deterministic dataset splitting / sampling — the training-data-pipeline
  * staple. Assignment is content-hash based (md5 → first 4 hex chars →
  * [0, 65536) bucket), so it is stable across engines, runs, partitionings
  * and cluster sizes — a row's split never depends on which executor saw
  * it. No shuffle: the split column is computed in the scan stage.
  */
object Sampling {

  /** Bucket in [0, 65536) from the md5 of a string column. NULLs hash as
    * the empty string (deterministic in both engines) rather than falling
    * through every `when` into the last split.
    */
  def hashBucket(c: Column): Column =
    conv(substring(md5(coalesce(c, lit(""))), 1, 4), 16, 10).cast("long")

  /** train/val/test label with an 80/10/10 split (by content hash). */
  def splitLabel(c: Column): Column = {
    val b = hashBucket(c)
    when(b < 52429, "train")          // 0.80 * 65536
      .when(b < 58982, "val")         // 0.90 * 65536
      .otherwise("test")
  }

  private val split = Q(
    "sample_split",
    (s, dir) =>
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          splitLabel(col("text")).as("split"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("lang", "split"),
    Some("""WITH labeled AS (
      SELECT doc_id, lang,
        CASE
          WHEN ('0x' || substr(md5(coalesce(text, '')), 1, 4))::INT < 52429
            THEN 'train'
          WHEN ('0x' || substr(md5(coalesce(text, '')), 1, 4))::INT < 58982
            THEN 'val'
          ELSE 'test'
        END AS split
      FROM documents)
    SELECT lang, split, COUNT(*) AS n_docs
    FROM labeled GROUP BY lang, split ORDER BY lang, split"""))

  /** Stratified (domain-balanced) sampling — the domain-mixing staple:
    * every `source` is downsampled to the SMALLEST source's row count, a
    * doc surviving iff its content-hash bucket clears the per-source
    * rate. The accept test is pure integer arithmetic
    * (`hb·n_source < n_min·65536` — no float rate, no rounding-mode
    * edge), so membership is exact and identical across engines, runs
    * and partitionings; scaling a source's rate never flips the fate of
    * a doc that an equal-or-lower rate admitted (nested samples, the
    * property that makes hash sampling the right tool for re-mixing).
    *
    * Scale: per-source counts are one thin map-side-combined aggregate;
    * the (tiny) rate table broadcasts back onto the corpus scan — the
    * 100 TB side is never shuffled, and the output agg is map-side
    * combined on ~|sources| keys.
    */
  private val stratified = Q(
    "sample_stratified",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), hashBucket(col("text")).as("hb"))
      val counts = d.groupBy("source").agg(count(lit(1)).as("n"))
      val mn = counts.agg(min("n").as("mn"))
      d.join(broadcast(counts), "source")
        .crossJoin(broadcast(mn))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("hb") * col("n") < col("mn") * 65536L, 1))
            .as("n_sampled"))
        .orderBy("source")
    },
    Some("""WITH c AS (
      SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    m AS (SELECT MIN(n) AS mn FROM c),
    k AS (SELECT d.source,
        ('0x' || substr(md5(coalesce(d.text, '')), 1, 4))::BIGINT AS hb,
        c.n, m.mn
      FROM documents d JOIN c USING (source) CROSS JOIN m)
    SELECT source, COUNT(*) AS n_docs,
      COUNT(*) FILTER (WHERE hb * n < mn * 65536) AS n_sampled
    FROM k GROUP BY source ORDER BY source"""))

  // ------------------------------------------------------------ corpus_mix
  /** Target-weighted corpus MIXING — the data-mixing stage of an LLM
    * pipeline (The Pile / Dolma recipe): given integer mixture weights
    * per lang, find the largest total token budget the corpus can
    * serve at those proportions (binding lang = the one that exhausts
    * first, i.e. the exact-integer argmin of avail/weight) and
    * downsample every other lang by content hash to hit its share.
    * Rates are exact rationals — a doc in lang ℓ survives iff
    * `hb·w_m·a_ℓ < w_ℓ·a_m·65536` (m = binding lang), evaluated in
    * DECIMAL(38,0) so the three-way product can't overflow at
    * 100 TB-scale token counts — so membership is deterministic across
    * engines, runs and partitionings, and samples nest as weights
    * scale (the sample_stratified property, generalized from
    * equal-share to arbitrary target weights).
    *
    * Scale: per-lang token totals are one thin map-side-combined
    * aggregate; the |langs|-row rate table (and its 1-row binding
    * entry — integer-scaled-floor argmin, deterministic tie-break by
    * lang) broadcasts back onto the corpus scan. The corpus is never
    * shuffled; the output agg combines map-side on |langs| keys.
    */
  private[text] val WEIGHTS: Seq[(String, Long)] = Seq(
    "de" -> 15L, "en" -> 40L, "es" -> 15L, "fr" -> 15L, "zh" -> 15L)
  private[text] val DEFAULT_W = 15L

  private def weightOf(lang: Column): Column =
    WEIGHTS.foldLeft(lit(DEFAULT_W)) { case (acc, (l, w)) =>
      when(lang === l, lit(w)).otherwise(acc)
    }

  private val weightSql: String =
    "CASE lang " + WEIGHTS.map { case (l, w) =>
      s"WHEN '$l' THEN $w" }.mkString(" ") + s" ELSE $DEFAULT_W END::BIGINT"

  private val mix = Q(
    "corpus_mix",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      val dec = DecimalType(38, 0)
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          size(graft.text.TextOps.tokens(col("text"))).cast("long")
            .as("ntok"),
          hashBucket(col("text")).as("hb"))
      val langs = d.groupBy("lang").agg(sum("ntok").as("a"))
        .withColumn("w", weightOf(col("lang")))
      // binding lang: exact-integer scaled-floor argmin of a/w (1e6
      // resolution keeps the sort key in long range up to ~9e12 tokens;
      // ties break by lang, so both engines pick the same row even on a
      // resolution tie — consistency is what correctness needs, and a
      // tied non-true-argmin only turns its rate into accept-all)
      val m = langs
        .withColumn("k", expr("a * 1000000 DIV w"))
        .orderBy("k", "lang").limit(1)
        .select(col("a").as("am"), col("w").as("wm"))
      d.join(broadcast(langs), "lang").crossJoin(broadcast(m))
        .withColumn("keep",
          col("hb").cast(dec) * col("wm").cast(dec) * col("a").cast(dec) <
            col("w").cast(dec) * col("am").cast(dec) *
              lit(65536L).cast(dec))
        .groupBy("lang")
        .agg(max("w").as("weight"),
          count(lit(1)).as("n_docs"),
          max("a").as("avail_tokens"),
          count(when(col("keep"), 1)).as("n_sampled"),
          coalesce(sum(when(col("keep"), col("ntok"))), lit(0L))
            .as("sampled_tokens"))
        .orderBy("lang")
    },
    Some(s"""WITH d AS (
      SELECT doc_id, lang,
        len(list_filter(string_split(text,' '), t -> t <> ''))::BIGINT
          AS ntok,
        ('0x' || substr(md5(coalesce(text, '')), 1, 4))::BIGINT AS hb
      FROM documents),
    langs AS (
      SELECT lang, SUM(ntok)::BIGINT AS a, $weightSql AS w
      FROM d GROUP BY lang),
    m AS (SELECT a AS am, w AS wm FROM langs
      ORDER BY (a * 1000000) // w, lang LIMIT 1)
    SELECT lang, MAX(w)::BIGINT AS weight, COUNT(*) AS n_docs,
      MAX(a)::BIGINT AS avail_tokens,
      COUNT(*) FILTER (WHERE keep) AS n_sampled,
      COALESCE(SUM(ntok) FILTER (WHERE keep), 0)::BIGINT AS sampled_tokens
    FROM (
      SELECT d.*, langs.a, langs.w, m.am, m.wm,
        hb::HUGEINT * wm::HUGEINT * a::HUGEINT
          < w::HUGEINT * am::HUGEINT * 65536::HUGEINT AS keep
      FROM d JOIN langs USING (lang) CROSS JOIN m)
    GROUP BY lang ORDER BY lang"""))

  // ---------------------------------------------------------- corpus_shard
  /** Deterministic corpus SHUFFLE + SHARD — the trainer-facing output
    * stage after packing: training wants documents in content-hash
    * order (decorrelated from crawl/source order — the "shuffle the
    * dataset" step) and split into a fixed shard count for parallel
    * loaders. Shard = hash bucket (so membership is engine-, run- and
    * partitioning-stable like every sampler here); within-shard
    * position = rank of the salted hash (doc_id tie-break for the
    * pathological equal-hash case). One exchange on the shard key; the
    * per-shard row_number window parallelizes across shards — never a
    * single global ordering.
    */
  private val SHARDS = 8

  private val shard = Q(
    "corpus_shard",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val h = hashBucket(concat(col("doc_id").cast("string"),
        lit("_shuffle")))
      val w = Window.partitionBy(col("shard"))
        .orderBy(col("h"), col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), h.as("h"),
          (h % SHARDS).as("shard"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .select("shard", "pos", "doc_id", "h")
        .orderBy("shard", "pos")
    },
    Some(s"""WITH d AS (
      SELECT doc_id,
        ('0x' || substr(md5(doc_id::VARCHAR || '_shuffle'), 1, 4))::BIGINT
          AS h
      FROM documents)
    SELECT h % $SHARDS AS shard,
      row_number() OVER (PARTITION BY h % $SHARDS ORDER BY h, doc_id)
        AS pos,
      doc_id, h
    FROM d ORDER BY shard, pos"""))

  // --------------------------------------------- sample_quality_weighted
  /** QUALITY-WEIGHTED resampling (the DCLM/RefinedWeb reweighting move:
    * don't hard-drop sub-threshold docs, keep them with probability
    * proportional to quality): a doc passing q of the 5 Gopher rules
    * ([[TextOps.qualityRules]] — shared expressions, so the score can't
    * drift from text_quality's) survives iff `hb·5 < q·65536` — the
    * pure-integer accept of the house samplers, so keep probability is
    * exactly q/5, membership is engine/run/partitioning-stable, and
    * samples NEST as a doc's quality rises (a doc kept at q is kept at
    * every q' > q — raising a doc's quality can never evict it).
    * Zero-token docs have q = 0 and are never kept.
    *
    * Scale: rules + hash compute in the scan stage (codegen kernels, no
    * shuffle); the output is one map-side-combined agg on ≤ 6 keys.
    * Output (score, n_docs, n_kept) makes the proportionality AUDITABLE:
    * n_kept/n_docs ≈ score/5 per row (spec-asserted within binomial
    * noise).
    */
  private val qualityWeighted = Q(
    "sample_quality_weighted",
    (s, dir) => {
      // guard nTok = 0 explicitly: Spark's NaN orders ABOVE any double,
      // so an unguarded ratio rule would pass vacuously on empty docs
      // where the mirror's len(w) > 0 CTE scores them 0
      val q = when(size(TextOps.tokens(col("text"))) > 0,
        TextOps.qualityRules
          .map(r => coalesce(r.cast("int"), lit(0)))
          .reduce(_ + _)).otherwise(lit(0)).cast("long")
      Tables(s, dir, "documents")
        .select(col("doc_id"), q.as("score"),
          hashBucket(col("text")).as("hb"))
        .groupBy("score")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("hb") * 5L < col("score") * 65536L, 1))
            .as("n_kept"))
        .orderBy("score")
    },
    Some(s"""WITH ${TextOps.qualityRulesSql},
    scored AS (
      SELECT d.doc_id,
        COALESCE(qr.r_len::INT + qr.r_wordlen::INT + qr.r_stop::INT
          + qr.r_uniq::INT + qr.r_rep2::INT, 0)::BIGINT AS score,
        ('0x' || substr(md5(coalesce(d.text, '')), 1, 4))::BIGINT AS hb
      FROM documents d LEFT JOIN qr ON d.doc_id = qr.doc_id)
    SELECT score, COUNT(*)::BIGINT AS n_docs,
      COUNT(*) FILTER (WHERE hb * 5 < score * 65536)::BIGINT AS n_kept
    FROM scored GROUP BY score ORDER BY score"""))

  // ----------------------------------------------------- sample_temperature
  /** Temperature-scaled LANGUAGE mixing weights (the multilingual
    * upsampling rule of XLM-R / mC4: q_ℓ ∝ p_ℓ^α, α = 1/T) at the
    * published α = 0.5 — low-resource languages are upsampled toward,
    * but not onto, the uniform point. α = 0.5 is the one exponent with
    * a DETERMINISTIC cross-engine spelling: `sqrt` is IEEE
    * correctly-rounded in both engines while `pow` is not, so the whole
    * chain — p in exact millionths, one double division, one sqrt, one
    * multiply, one floor — produces the identical BIGINT everywhere
    * (the corpus_mix fixed-point recipe, extended by the one blessed
    * float op). The final normalization is back in pure integers
    * (w·10⁶ DIV Σw).
    *
    * corpus_mix consumes weights like these as its WEIGHTS input; this
    * operator computes them FROM the corpus, closing the mixing loop
    * (measure → weight → sample). Scale: one map-side-combined lang
    * aggregate; everything after runs on |langs| rows with two 1-row
    * broadcast scalars — the corpus is scanned once and never shuffled.
    */
  private val temperature = Q(
    "sample_temperature",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("lang"),
          size(graft.text.TextOps.tokens(col("text"))).cast("long")
            .as("ntok"))
      val langs = d.groupBy("lang").agg(sum("ntok").as("tokens"))
      val tot = langs.agg(sum("tokens").as("total"))
      val withP = langs.crossJoin(broadcast(tot))
        .withColumn("p_micro", expr("tokens * 1000000 DIV total"))
        .withColumn("w_micro",
          floor(sqrt(col("p_micro").cast("double") / lit(1000000.0d))
            * lit(1000000.0d)).cast("long"))
      val sw = withP.agg(sum("w_micro").as("sumw"))
      withP.crossJoin(broadcast(sw))
        .withColumn("q_micro", expr("w_micro * 1000000 DIV sumw"))
        .select(col("lang"), col("tokens"), col("p_micro"),
          col("w_micro"), col("q_micro"))
        .orderBy("lang")
    },
    Some("""WITH d AS (
      SELECT lang,
        len(list_filter(string_split(text,' '), t -> t <> ''))::BIGINT
          AS ntok
      FROM documents),
    l AS (SELECT lang, SUM(ntok)::BIGINT AS tokens FROM d GROUP BY lang),
    t AS (SELECT SUM(tokens)::BIGINT AS total FROM l),
    p AS (SELECT lang, tokens,
        (tokens * 1000000 // total)::BIGINT AS p_micro
      FROM l CROSS JOIN t),
    w AS (SELECT *, floor(sqrt(p_micro / 1000000.0) * 1000000.0)::BIGINT
        AS w_micro FROM p),
    s AS (SELECT SUM(w_micro)::BIGINT AS sumw FROM w)
    SELECT lang, tokens, p_micro, w_micro,
      (w_micro * 1000000 // sumw)::BIGINT AS q_micro
    FROM w CROSS JOIN s ORDER BY lang"""))

  // -------------------------------------------------------- sample_budget
  /** Token-BUDGET allocation — the table a training run is actually
    * configured from (the mC4/Pile "mixing proportions" appendix):
    * given the temperature-scaled weights ([[temperature]]'s α = 0.5
    * chain, same sqrt-exact arithmetic) and a fixed training budget of
    * [[BUDGET]] tokens, each language gets `alloc = budget·q DIV 10⁶`
    * tokens, and `epochs_milli = alloc·1000 DIV available` says how
    * many passes over that language's data the allocation implies —
    * >1000 milli-epochs is upsampling (low-resource repetition), <1000
    * is subsampling. Every step after the one blessed sqrt is integer
    * floor arithmetic on non-negative values (truncate == floor).
    *
    * Scale: identical to sample_temperature — one map-side-combined
    * lang aggregate, then |langs|-row arithmetic with two 1-row
    * broadcast scalars.
    */
  private val BUDGET = 10000000L

  private val budget = Q(
    "sample_budget",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("lang"),
          size(graft.text.TextOps.tokens(col("text"))).cast("long")
            .as("ntok"))
      val langs = d.groupBy("lang").agg(sum("ntok").as("tokens"))
      val tot = langs.agg(sum("tokens").as("total"))
      val withP = langs.crossJoin(broadcast(tot))
        .withColumn("p_micro", expr("tokens * 1000000 DIV total"))
        .withColumn("w_micro",
          floor(sqrt(col("p_micro").cast("double") / lit(1000000.0d))
            * lit(1000000.0d)).cast("long"))
      val sw = withP.agg(sum("w_micro").as("sumw"))
      withP.crossJoin(broadcast(sw))
        .withColumn("q_micro", expr("w_micro * 1000000 DIV sumw"))
        .withColumn("alloc_tokens", expr(s"$BUDGET * q_micro DIV 1000000"))
        .withColumn("epochs_milli", expr("alloc_tokens * 1000 DIV tokens"))
        .select(col("lang"), col("tokens"), col("q_micro"),
          col("alloc_tokens"), col("epochs_milli"))
        .orderBy("lang")
    },
    Some(s"""WITH d AS (
      SELECT lang,
        len(list_filter(string_split(text,' '), t -> t <> ''))::BIGINT
          AS ntok
      FROM documents),
    l AS (SELECT lang, SUM(ntok)::BIGINT AS tokens FROM d GROUP BY lang),
    t AS (SELECT SUM(tokens)::BIGINT AS total FROM l),
    p AS (SELECT lang, tokens,
        (tokens * 1000000 // total)::BIGINT AS p_micro
      FROM l CROSS JOIN t),
    w AS (SELECT *, floor(sqrt(p_micro / 1000000.0) * 1000000.0)::BIGINT
        AS w_micro FROM p),
    s AS (SELECT SUM(w_micro)::BIGINT AS sumw FROM w),
    q AS (SELECT lang, tokens,
        (w_micro * 1000000 // sumw)::BIGINT AS q_micro
      FROM w CROSS JOIN s),
    a AS (SELECT *, ($BUDGET * q_micro // 1000000)::BIGINT AS alloc_tokens
      FROM q)
    SELECT lang, tokens, q_micro, alloc_tokens,
      (alloc_tokens * 1000 // tokens)::BIGINT AS epochs_milli
    FROM a ORDER BY lang"""))

  // ------------------------------------------------------------ sample_dsir
  /** DSIR — Data Selection via Importance Resampling (Xie et al., NeurIPS
    * 2023): select raw-corpus documents whose hashed-n-gram feature
    * distribution looks like a TARGET domain. Target here = `source =
    * 'src0'`; candidates = every other source. Features are unigrams +
    * bigrams hashed into [[DSIR_B]] buckets (60-bit md5 prefix mod B — the
    * repo-standard cross-engine hash); the per-bucket importance weight is
    * the add-one-smoothed log-likelihood ratio `log2 p_target(b) −
    * log2 p_raw(b)`, and a candidate's score is the sum of its gram
    * occurrences' bucket weights — the paper's
    * `log w(x) = Σ_b c_b(x)·(log p_b − log q_b)` with hashed features.
    * Top-[[DSIR_K]] by score are the selected training docs.
    *
    * Cross-engine exactness WITHOUT transcendental logs (ln() ulp drift —
    * the text_lm_score lesson): log2 runs as the deterministic
    * piecewise-linear fixed-point `ilog2_m20(x) = e·2²⁰ +
    * (x·2²⁰ DIV 2^e) − 2²⁰` with `e = ⌊log2 x⌋ = length(bin(x)) − 1` —
    * exact at powers of two, linear interpolation between (max error
    * 0.086 bits, a rank-irrelevant smooth bias), identical integer
    * arithmetic in both engines. Scores stay BIGINT end-to-end.
    *
    * Scale shape: ONE pass over the checkpointed thin gram stream
    * (doc_id, is_target, bucket) into a ≤B-row model (map-side-combined
    * conditional counts), model broadcast back onto the candidate grams,
    * one per-doc aggregate, TakeOrdered top-K. No windows, no self-joins;
    * at 100 TB the trained model is still 512 rows — it ships as a
    * broadcast exactly like the paper's hashed-bigram generative model.
    */
  private val DSIR_B = 512
  private val DSIR_K = 100

  /** Fixed-point piecewise-linear log2 in 2⁻²⁰ units — exact integer
    * arithmetic, mirrored verbatim in the DuckDB oracle. The mantissa is
    * a shift-split (`x DIV 2^(e−20)` above 2²⁰, `x · 2^(20−e)` below)
    * rather than the naive `x·2²⁰ DIV 2^e`, which overflows BIGINT at
    * x ≥ 2⁴³ — a count a 100 TB corpus actually reaches (~2×10¹³ grams).
    * Both branches equal the naive form exactly where it's defined
    * (right-shift after a left-shift is the same floor), so outputs are
    * unchanged below the old overflow line; PropertySpec sweeps the full
    * positive-long range. */
  private[graft] def ilog2m20(x: String): String = {
    // ($x) everywhere: a compound argument like "a - b" must not
    // re-associate through * / DIV precedence
    val e = s"(length(bin(($x))) - 1)"
    s"($e * 1048576 + (CASE WHEN $e > 20" +
      s" THEN ($x) DIV shiftleft(CAST(1 AS BIGINT), $e - 20)" +
      s" ELSE ($x) * shiftleft(CAST(1 AS BIGINT), 20 - $e) END)" +
      s" - 1048576)"
  }
  private[graft] def dIlog2m20(x: String): String = {
    val e = s"(length(bin(($x))) - 1)"
    s"($e * 1048576 + (CASE WHEN $e > 20" +
      s" THEN ($x) // (1::BIGINT << ($e - 20))" +
      s" ELSE ($x) * (1::BIGINT << (20 - $e)) END)" +
      s" - 1048576)"
  }

  private val dsir = Q(
    "sample_dsir",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
      val bigramArr = org.apache.spark.sql.graft.Shim.column(
        graft.functions.WordShingles(
          org.apache.spark.sql.graft.Shim.expression(col("text")), 2,
          distinct = false))
      val grams = d
        .select(col("doc_id"), (col("source") === "src0").as("is_t"),
          explode(concat(graft.text.TextOps.tokens(col("text")), bigramArr))
            .as("g"))
        .select(col("doc_id"), col("is_t"),
          (conv(substring(md5(col("g")), 1, 15), 16, 10).cast("long")
            % DSIR_B).as("b"))
        .transform(graft.Checkpoint.of)   // model agg + scoring both read it
      val model = grams.groupBy("b").agg(
        (sum(when(col("is_t"), 1L).otherwise(0L)) + 1L).as("p"),
        (sum(when(!col("is_t"), 1L).otherwise(0L)) + 1L).as("q"))
      val tot = model.agg(sum("p").as("np"), sum("q").as("nq"))
      val weights = model.crossJoin(broadcast(tot))
        .withColumn("llr_m20",
          expr(s"${ilog2m20("p")} - ${ilog2m20("q")}" +
            s" - (${ilog2m20("np")} - ${ilog2m20("nq")})"))
        .select("b", "llr_m20")
      grams.filter(!col("is_t"))
        .join(broadcast(weights), "b")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"), sum("llr_m20").as("score_m20"))
        .orderBy(col("score_m20").desc, col("doc_id"))
        .limit(DSIR_K)
        .orderBy(col("score_m20").desc, col("doc_id"))
    },
    Some(s"""WITH toks AS (
      SELECT doc_id, source,
        list_filter(string_split(text,' '), t -> t <> '') w
      FROM documents),
    grams AS (
      SELECT doc_id, source = 'src0' AS is_t,
        (('0x' || substr(md5(u.g), 1, 15))::BIGINT % $DSIR_B) AS b
      FROM toks, UNNEST(list_concat(w,
        [w[i] || ' ' || w[i+1] for i in range(1, greatest(len(w), 1))]))
        u(g)),
    model AS (
      SELECT b,
        (SUM(CASE WHEN is_t THEN 1 ELSE 0 END) + 1)::BIGINT AS p,
        (SUM(CASE WHEN is_t THEN 0 ELSE 1 END) + 1)::BIGINT AS q
      FROM grams GROUP BY b),
    tot AS (SELECT SUM(p)::BIGINT AS np, SUM(q)::BIGINT AS nq FROM model),
    wt AS (
      SELECT b, ${dIlog2m20("p")} - ${dIlog2m20("q")}
          - (${dIlog2m20("np")} - ${dIlog2m20("nq")}) AS llr_m20
      FROM model CROSS JOIN tot)
    SELECT g.doc_id, COUNT(*) AS n_grams,
      SUM(wt.llr_m20)::BIGINT AS score_m20
    FROM grams g JOIN wt USING (b)
    WHERE NOT g.is_t
    GROUP BY g.doc_id
    ORDER BY score_m20 DESC, doc_id LIMIT $DSIR_K"""))

  // ------------------------------------------------------ sample_reservoir
  /** Exact-k per-source RESERVOIR sample — the fixed-size uniform
    * "give me 20 docs from every source" primitive behind eval subsets,
    * eyeball samples and per-domain probes. Distributed reservoir
    * sampling is classically stateful; the order-statistics restatement
    * (keep the k smallest of a uniform key — Vitter's method A by
    * hash) is stateless, deterministic, and exactly uniform when the
    * key is a content hash: rank docs per source by
    * ([[hashBucket]], doc_id) and keep rank ≤ k. Same-sample-every-run
    * (and every partitioning / cluster size) beats `rand()` reservoirs
    * for reproducible pipelines, and the nested-sample property holds:
    * k′ < k is always a subset of the k-sample.
    *
    * Scale: one hash exchange on source + per-partition sort; the k
    * limit pushes into the sort as WindowGroupLimit, so each partition
    * retains k rows, never the corpus.
    */
  /** Shared with [[graft.streaming.Streaming.reservoirSink]] — ONE
    * definition, the driftSink constant-sharing rule. */
  private[graft] val RESERVOIR_K = 20

  private val reservoir = Q(
    "sample_reservoir",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("source"))
        .orderBy(col("hb"), col("doc_id"))
      Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"), hashBucket(col("text")).as("hb"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= RESERVOIR_K)
        .select(col("source"), col("rk"), col("doc_id"), col("hb"))
        .orderBy("source", "rk")
    },
    Some(s"""WITH h AS (
      SELECT doc_id, source,
        ('0x' || substr(md5(coalesce(text, '')), 1, 4))::BIGINT AS hb
      FROM documents),
    ranked AS (
      SELECT source, doc_id, hb,
        row_number() OVER (PARTITION BY source ORDER BY hb, doc_id) AS rk
      FROM h)
    SELECT source, rk, doc_id, hb FROM ranked
    WHERE rk <= $RESERVOIR_K ORDER BY source, rk"""))

  // --------------------------------------------------------- sample_kcenter
  /** Greedy k-CENTER (farthest-point) diversity selection over the
    * embedding space — the coreset/data-pruning pick (Sener & Savarese
    * 2018's active-learning coreset; the diversity half of modern
    * selection pipelines next to [[dsir]]'s distribution matching):
    * seed with the min vec_id, then k−1 rounds of "add the point
    * farthest from the chosen set" (max-min squared L2, vec_id
    * tie-break). The selected rows ARE the 2-approximation of the
    * k-center cover — the k maximally-spread exemplars.
    *
    * Exactness: vectors become micro-int `array<long>` once
    * (checkpointed — the interpreted transform never re-evaluates per
    * round), every distance is the exact integer
    * Σ(mᵢ−mᶜᵢ)² via the codegen [[graft.functions.SqDistLong]] kernel
    * (order-independent integer sums — no float anywhere), so argmax
    * rows and their `d2` match DuckDB's list-comprehension restatement
    * bit-for-bit through all rounds of the unrolled-CTE oracle.
    *
    * Scale: each round is ONE corpus pass against the broadcast ≤k-row
    * chosen frame (min-over-chosen + anti-join + TakeOrdered argmax —
    * nothing corpus²), and only the thin chosen frame checkpoints per
    * round; k corpus passes total, exactly the sequential structure
    * the greedy demands.
    */
  private val KC_K = 8

  private val kcenter = Q(
    "sample_kcenter",
    (s, dir) => {
      import org.apache.spark.sql.types.DecimalType
      def sqDist(a: Column, b: Column): Column =
        org.apache.spark.sql.graft.Shim.column(graft.functions.SqDistLong(
          org.apache.spark.sql.graft.Shim.expression(a),
          org.apache.spark.sql.graft.Shim.expression(b)))
      val mv = Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          transform(col("embedding").cast("array<double>"),
            x => (round(x, 6).cast(DecimalType(38, 6)) * lit(1000000))
              .cast(DecimalType(38, 0)).cast("long")).as("m"))
        .transform(graft.Checkpoint.of)
      var chosen = mv.orderBy("vec_id").limit(1)
        .select(lit(0L).as("sel"), col("vec_id"), col("m"),
          lit(0L).as("d2"))
        .transform(graft.Checkpoint.of)
      for (k <- 1 until KC_K) {
        val next = mv
          .join(chosen.select(col("vec_id").as("cid")), col("vec_id") ===
            col("cid"), "left_anti")
          .crossJoin(broadcast(chosen.select(col("m").as("cm"))))
          .groupBy(col("vec_id"), col("m"))
          .agg(min(sqDist(col("m"), col("cm"))).as("d2"))
          .orderBy(col("d2").desc, col("vec_id"))
          .limit(1)
          .select(lit(k.toLong).as("sel"), col("vec_id"), col("m"),
            col("d2"))
        chosen = chosen.unionByName(next).transform(graft.Checkpoint.of)
      }
      chosen.select(col("sel"), col("vec_id"), col("d2")).orderBy("sel")
    },
    Some {
      val rounds = (1 until KC_K).map { k =>
        val prev = s"kc${k - 1}"
        s"""kd$k AS (SELECT mv.vec_id,
          MIN(list_sum([(mv.m[i] - c.m[i]) * (mv.m[i] - c.m[i])
            for i in range(1, len(mv.m) + 1)]))::BIGINT AS d2
        FROM mv, $prev c
        WHERE mv.vec_id NOT IN (SELECT vec_id FROM $prev)
        GROUP BY mv.vec_id),
      kp$k AS (SELECT $k::BIGINT AS sel, kd$k.vec_id, mv.m, d2
        FROM kd$k JOIN mv ON kd$k.vec_id = mv.vec_id
        ORDER BY d2 DESC, kd$k.vec_id LIMIT 1),
      kc$k AS MATERIALIZED (SELECT * FROM $prev UNION ALL
        SELECT * FROM kp$k)"""
      }.mkString(",\n      ")
      s"""WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) v FROM embeddings),
      mv AS MATERIALIZED (
        SELECT vec_id, [(round(v[i], 6)::DECIMAL(38,6) * 1000000)::BIGINT
          for i in range(1, len(v) + 1)] AS m
        FROM e),
      kc0 AS MATERIALIZED (
        SELECT 0::BIGINT AS sel, vec_id, m, 0::BIGINT AS d2 FROM mv
        WHERE vec_id = (SELECT MIN(vec_id) FROM mv)),
      $rounds
      SELECT sel, vec_id, d2 FROM kc${KC_K - 1} ORDER BY sel"""
    })

  // ----------------------------------------------------- sample_interleave
  /** Deterministic weighted source INTERLEAVE — the dataloader-facing
    * end of the mixing chain ([[temperature]]/[[budget]] decide HOW
    * MUCH of each source; this decides the ORDER the mixed stream is
    * read in): source s's k-th document (doc_id order) gets the virtual
    * deadline `k·2²⁰ DIV w_s` (w = doc count), and the global stream is
    * the merge-sort of all sources by (deadline, source, k) — the
    * classic weighted-fair-queueing / low-discrepancy schedule: a
    * source with 2× the weight appears 2× as often, evenly spread, no
    * RNG, reproducible across runs and cluster sizes. Emits the first
    * [[INTERLEAVE_POS]] positions (the epoch prefix a dataloader
    * actually materializes eagerly).
    *
    * Scale: position p can only contain a source's k ≤ p-th document,
    * so per-source ranks are pre-filtered to k ≤ POS — WindowGroupLimit
    * bounds every source partition at POS rows (the knn_bruteforce
    * precedent); the global position window then runs on ≤ POS·|sources|
    * rows, never the corpus. Deadline arithmetic is integer floor both
    * engines; ties are (source, k)-total.
    */
  private val INTERLEAVE_POS = 200

  private val interleave = Q(
    "sample_interleave",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val d = Tables(s, dir, "documents").select("source", "doc_id")
      val wdf = d.groupBy("source").agg(count(lit(1)).as("w"))
      val rk = Window.partitionBy("source").orderBy("doc_id")
      val wo = Window.orderBy(col("ikey"), col("source"), col("k"))
      d.withColumn("k", row_number().over(rk).cast("long"))
        .filter(col("k") <= INTERLEAVE_POS)
        .join(broadcast(wdf), "source")
        .withColumn("ikey", expr("k * 1048576 DIV w"))
        .withColumn("position", row_number().over(wo).cast("long"))
        .filter(col("position") <= INTERLEAVE_POS)
        .select("position", "source", "doc_id", "ikey")
        .orderBy("position")
    },
    Some(s"""WITH d AS (SELECT source, doc_id FROM documents),
    w AS (SELECT source, COUNT(*)::BIGINT AS w FROM d GROUP BY source),
    r AS (SELECT source, doc_id,
        row_number() OVER (PARTITION BY source ORDER BY doc_id)::BIGINT
          AS k
      FROM d),
    f AS (SELECT r.source, doc_id, k, (k * 1048576 // w)::BIGINT AS ikey
      FROM r JOIN w USING (source) WHERE k <= $INTERLEAVE_POS),
    g AS (SELECT *, row_number()
        OVER (ORDER BY ikey, source, k)::BIGINT AS position FROM f)
    SELECT position, source, doc_id, ikey FROM g
    WHERE position <= $INTERLEAVE_POS ORDER BY position"""))

  // -------------------------------------------------------- sample_epochs
  /** EPOCH MATERIALIZATION — the repetition-factor half of corpus
    * mixing (the LLaMA/Dolma recipe: high-value sources are UPSAMPLED
    * by repeating them an integer number of epochs, where [[budget]]
    * downsamples): sources are ranked by a deterministic value signal
    * (mean document length in chars, `sum(n_chars) DIV n_src` — exact
    * integer both engines, source tie-break) and the rank QUARTILE
    * sets the factor, top quartile 4 epochs … bottom 1:
    * `ep = 4 − (rank−1)·4 DIV n_sources`. Rank-based factors exercise
    * the full 1..4 range on ANY distribution (a count- or
    * share-threshold rule degenerates to all-1s on a uniform corpus —
    * this driver's documents table is exactly uniform).
    *
    * Scale: the per-source signal is one map-side-combined aggregate;
    * the rank window runs on the ≤|sources|-row frame; the factor
    * broadcasts; the explode is map-side on the scan — the row
    * multiplication IS the operator's contract (the materialized
    * mixture feeds the sequence packer), bounded by the epoch cap.
    */
  private val epochs = Q(
    "sample_epochs",
    (s, dir) => {
      val d = Tables(s, dir, "documents")
        .select("doc_id", "source", "n_chars")
      val perSrc = d.groupBy("source")
        .agg(count(lit(1)).as("n_src"), sum("n_chars").as("chars"))
        .withColumn("mean_len", expr("chars DIV n_src"))
      val wRank = org.apache.spark.sql.expressions.Window
        .orderBy(col("mean_len").desc, col("source"))
      val ep = perSrc
        .withColumn("rk", row_number().over(wRank).cast("long"))
        .withColumn("n_sources",
          count(lit(1)).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(lit(1))))
        .select(col("source"),
          expr("4 - (rk - 1) * 4 DIV n_sources").as("ep"))
      d.join(broadcast(ep), "source")
        .select(col("doc_id"), col("source"), col("ep"),
          explode(sequence(lit(1L), col("ep"))).as("epoch"))
        .orderBy("doc_id", "epoch")
    },
    Some("""WITH per_src AS (
      SELECT source, COUNT(*)::BIGINT AS n_src,
        SUM(n_chars)::BIGINT AS chars
      FROM documents GROUP BY source),
    ranked AS (
      SELECT source,
        ROW_NUMBER() OVER (ORDER BY chars // n_src DESC, source)::BIGINT
          AS rk,
        COUNT(*) OVER ()::BIGINT AS n_sources
      FROM per_src),
    ep AS (
      SELECT source, (4 - (rk - 1) * 4 // n_sources)::BIGINT AS ep
      FROM ranked)
    SELECT doc_id, source, ep, u.epoch::BIGINT AS epoch
    FROM documents
    JOIN ep USING (source),
    UNNEST(generate_series(1, ep)) u(epoch)
    ORDER BY doc_id, epoch"""))

  val all: Seq[Q] = Seq(split, stratified, mix, shard, qualityWeighted,
    temperature, budget, dsir, reservoir, kcenter, interleave, epochs)
}
