package graft.text

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Trained TEXT CLASSIFICATION — the supervised twin of the text_langid
  * marker heuristic: a nearest-class-centroid (Rocchio) classifier
  * (Rocchio 1971; Manning, Raghavan & Schütze, IIR §14.2) trained on the
  * corpus's own `lang` labels and evaluated in-plan as a confusion
  * matrix. This is the label-propagation / quality-classifier shape real
  * pipelines run (CCNet's fastText langid, quality classifiers trained
  * on reference corpora): TRAIN = per-class token-frequency centroids,
  * PREDICT = nearest centroid by squared Euclidean distance on
  * term-frequency vectors.
  *
  * Exactness — the whole train+predict loop closes over the integers,
  * so the oracle hash-gates both stages end-to-end:
  *   - doc vector: `f_t = (cnt_t·10³) DIV n_doc` (milli term frequency);
  *   - centroid:  `c_lt = (T_lt·10³) DIV T_l` over the class's token
  *     totals (all operands positive, so DIV ↔ `//` agree);
  *   - `dist²(d,l) = Σf² − 2·Σ f·c + Σc²` — the cross term is the only
  *     per-(doc,class) aggregate; the three sums are exact BIGINTs
  *     (components ≤ 10³, vocab-bounded sums), argmin ties break to the
  *     alphabetically first class, mirroring text_langid.
  *
  * Scale shape: token counting is the usual map-side-combined gram agg;
  * training collapses to (lang, tok) rows — vocab·L, tiny; the cross
  * term joins the per-doc gram stream against the centroid table on
  * `tok` (broadcastable — it IS the model) and aggregates map-side; the
  * scoring grid is L rows per doc from a 5-row broadcast, and the
  * argmin window partitions by doc over those L rows. Corpus-sized
  * exchanges: the gram agg and the per-doc aggs — nothing quadratic,
  * no driver-side model state.
  */
object Classify {

  /** The centroid classifier's (lang, pred_lang, n_docs) confusion
    * frame — shared by text_classify_centroid (exports it) and
    * text_classify_prf (summarizes it).
    */
  private def centroidConfusion(s: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables(s, dir, "documents")
      val d = docs.select(col("doc_id"), col("lang"))
      val tok = docs
        .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("cnt"))
        .transform(graft.Checkpoint.of) // feeds doc vectors AND training
      val nd = tok.groupBy("doc_id").agg(sum("cnt").as("n_d"))
      val f = tok.join(nd, "doc_id")
        .select(col("doc_id"), col("tok"),
          expr("cnt * 1000 DIV n_d").as("fm"))
        .transform(graft.Checkpoint.of) // consumed by sf2 and cross
      val lt = tok.join(d, "doc_id")
        .groupBy("lang", "tok").agg(sum("cnt").as("tlt"))
      val tl = lt.groupBy("lang").agg(sum("tlt").as("tl"))
      val c = lt.join(tl, "lang")
        .select(col("lang").as("pred_lang"), col("tok"),
          expr("tlt * 1000 DIV tl").as("cm"))
        .transform(graft.Checkpoint.of) // consumed by sc2 and cross
      val sf2 = f.groupBy("doc_id").agg(sum(col("fm") * col("fm")).as("sf2"))
      val sc2 = c.groupBy("pred_lang")
        .agg(sum(col("cm") * col("cm")).as("sc2"))
      val cross = f.join(c, "tok")
        .groupBy("doc_id", "pred_lang")
        .agg(sum(col("fm") * col("cm")).as("cx"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("dist2"), col("pred_lang"))
      d.join(sf2, Seq("doc_id"), "left")
        .crossJoin(broadcast(sc2))
        .join(cross, Seq("doc_id", "pred_lang"), "left")
        .select(col("doc_id"), col("lang"), col("pred_lang"),
          (coalesce(col("sf2"), lit(0L)) - lit(2) * coalesce(col("cx"),
            lit(0L)) + col("sc2")).as("dist2"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("lang", "pred_lang").agg(count(lit(1)).as("n_docs"))
  }

  /** The identical confusion table as DuckDB CTEs ending at
    * `conf(lang, pred_lang, n_docs)`.
    */
  private val confusionCte = """WITH tok AS (
      SELECT doc_id, u.t AS tok, COUNT(*)::BIGINT AS cnt
      FROM documents,
        UNNEST(list_filter(string_split(text,' '), t -> t <> '')) u(t)
      GROUP BY doc_id, u.t),
    nd AS (SELECT doc_id, SUM(cnt) AS n_d FROM tok GROUP BY doc_id),
    f AS (
      SELECT t.doc_id, t.tok, (t.cnt * 1000) // n.n_d AS fm
      FROM tok t JOIN nd n USING (doc_id)),
    lt AS (
      SELECT d.lang, t.tok, SUM(t.cnt) AS tlt
      FROM tok t JOIN documents d USING (doc_id)
      GROUP BY d.lang, t.tok),
    tl AS (SELECT lang, SUM(tlt) AS tl FROM lt GROUP BY lang),
    c AS (
      SELECT lt.lang AS pred_lang, lt.tok, (lt.tlt * 1000) // tl.tl AS cm
      FROM lt JOIN tl USING (lang)),
    sf2 AS (SELECT doc_id, SUM(fm * fm) AS sf2 FROM f GROUP BY doc_id),
    sc2 AS (SELECT pred_lang, SUM(cm * cm) AS sc2 FROM c GROUP BY pred_lang),
    crs AS (
      SELECT f.doc_id, c.pred_lang, SUM(f.fm * c.cm) AS cx
      FROM f JOIN c USING (tok) GROUP BY f.doc_id, c.pred_lang),
    scored AS (
      SELECT d.doc_id, d.lang, s2.pred_lang,
        COALESCE(sf2.sf2, 0) - 2 * COALESCE(crs.cx, 0) + s2.sc2 AS dist2
      FROM documents d
      LEFT JOIN sf2 USING (doc_id)
      CROSS JOIN sc2 s2
      LEFT JOIN crs ON crs.doc_id = d.doc_id
        AND crs.pred_lang = s2.pred_lang),
    pred AS (
      SELECT doc_id, lang, pred_lang,
        row_number() OVER (PARTITION BY doc_id
          ORDER BY dist2, pred_lang) AS rn
      FROM scored),
    conf AS MATERIALIZED (
      SELECT lang, pred_lang, COUNT(*)::BIGINT AS n_docs
      FROM pred WHERE rn = 1
      GROUP BY lang, pred_lang)"""

  private val classify = Q(
    "text_classify_centroid",
    (s, dir) => centroidConfusion(s, dir).orderBy("lang", "pred_lang"),
    Some(s"""$confusionCte
    SELECT lang, pred_lang, n_docs FROM conf
    ORDER BY lang, pred_lang"""))

  // ---------------------------------------------------- text_classify_prf
  /** Per-class PRECISION / RECALL / F1 from the centroid classifier's
    * confusion table — the evaluation card every deployed filter ships
    * with (dedup_recall's twin for classification). All three metrics
    * are exact integer MILLIONTHS: `p = tp·10⁶ DIV n_pred`,
    * `r = tp·10⁶ DIV n_true`, `f1 = 2·p·r DIV (p + r)` (the harmonic
    * mean stays integral in micro units; never-predicted classes score
    * 0, zero-guarded) — no float division anywhere, so both engines
    * hold identical integers. The confusion frame (≤|langs|² rows,
    * whole-classifier lineage) is CHECKPOINTED — three consumers.
    */
  private val prf = Q(
    "text_classify_prf",
    (s, dir) => {
      val conf = centroidConfusion(s, dir).transform(graft.Checkpoint.of)
      val actual = conf.groupBy("lang").agg(sum("n_docs").as("n_true"))
      val predicted = conf.groupBy(col("pred_lang").as("lang"))
        .agg(sum("n_docs").as("n_pred"))
      val tp = conf.filter(col("lang") === col("pred_lang"))
        .select(col("lang"), col("n_docs").as("n_tp"))
      actual
        .join(predicted, Seq("lang"), "left")
        .join(tp, Seq("lang"), "left")
        .select(col("lang"), col("n_true"),
          coalesce(col("n_pred"), lit(0L)).as("n_pred"),
          coalesce(col("n_tp"), lit(0L)).as("n_tp"))
        .withColumn("p_micro", when(col("n_pred") > 0,
          expr("n_tp * 1000000 DIV n_pred")).otherwise(0L))
        .withColumn("r_micro", expr("n_tp * 1000000 DIV n_true"))
        .withColumn("f1_micro", when(col("p_micro") + col("r_micro") > 0,
          expr("2 * p_micro * r_micro DIV (p_micro + r_micro)"))
          .otherwise(0L))
        .orderBy("lang")
    },
    Some(s"""$confusionCte,
    actual AS (SELECT lang, SUM(n_docs)::BIGINT AS n_true
      FROM conf GROUP BY lang),
    predicted AS (SELECT pred_lang AS lang, SUM(n_docs)::BIGINT AS n_pred
      FROM conf GROUP BY pred_lang),
    tp AS (SELECT lang, n_docs AS n_tp FROM conf WHERE lang = pred_lang),
    m AS (
      SELECT a.lang, a.n_true,
        COALESCE(p.n_pred, 0)::BIGINT AS n_pred,
        COALESCE(t.n_tp, 0)::BIGINT AS n_tp
      FROM actual a
      LEFT JOIN predicted p USING (lang)
      LEFT JOIN tp t USING (lang)),
    pr AS (
      SELECT lang, n_true, n_pred, n_tp,
        (CASE WHEN n_pred > 0 THEN n_tp * 1000000 // n_pred
          ELSE 0 END)::BIGINT AS p_micro,
        (n_tp * 1000000 // n_true)::BIGINT AS r_micro
      FROM m)
    SELECT lang, n_true, n_pred, n_tp, p_micro, r_micro,
      (CASE WHEN p_micro + r_micro > 0
        THEN 2 * p_micro * r_micro // (p_micro + r_micro)
        ELSE 0 END)::BIGINT AS f1_micro
    FROM pr ORDER BY lang"""))

  // ------------------------------------------------------ text_classify_nb
  /** Trained MULTINOMIAL NAIVE BAYES over hashed token features, with a
    * real train/held-out protocol — the fastText-style corpus classifier
    * shape (CCNet / LLaMA quality filters train a linear classifier on
    * reference text and score the crawl with it), restated as exact
    * integer arithmetic so the oracle hash-gates train AND predict:
    *
    *   - split: the repo's 80/10/10 content-hash split
    *     ([[Sampling.splitLabel]]) — TRAIN on the 80%, evaluate on the
    *     held-out `test` 10% (the centroid classifier above
    *     train==predict corpus; this one is the honest protocol);
    *   - features: tokens hashed into [[NB_B]] buckets (60-bit md5
    *     prefix mod B — the DSIR recipe), so the model is a DENSE
    *     L×B grid that broadcasts at any corpus size;
    *   - model: add-one smoothing, `w_lb = log2(c_lb+1) − log2(T_l+B)`
    *     and prior `log2 n_l − log2 n_total`, all in the fixed-point
    *     2⁻²⁰ log2 ([[Sampling.ilog2m20]] — deterministic integers, no
    *     transcendental ln); `score(d,l) = prior_l + Σ_b c_b(d)·w_lb`,
    *     argmax ties to the alphabetically first label.
    *
    * Scale shape: ONE pass over the checkpointed thin gram stream feeds
    * the model agg (≤ L·B rows, map-side combined) and the test-doc
    * bucket counts; the trained model broadcasts back onto the test
    * stream (it IS the model — L·B ≤ a few KB at any corpus scale); the
    * per-doc argmax is a window over L rows per doc. Corpus-sized
    * exchanges: the gram agg and the per-doc agg — no self-joins, no
    * driver-side state.
    */
  private val NB_B = 256

  private val nb = Q(
    "text_classify_nb",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      import Sampling.ilog2m20
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          Sampling.splitLabel(col("text")).as("split"), col("text"))
      val grams = docs
        .select(col("doc_id"), col("source"), col("split"),
          explode(TextOps.tokens(col("text"))).as("tok"))
        .select(col("doc_id"), col("source"), col("split"),
          (conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
            % NB_B).as("b"))
        .transform(graft.Checkpoint.of) // model agg + test counts read it
      val clb = grams.filter(col("split") === "train")
        .groupBy(col("source").as("label"), col("b"))
        .agg(count(lit(1)).as("cnt"))
      val labels = clb.select("label").distinct()
      val grid = labels.crossJoin(s.range(NB_B).select(col("id").as("b")))
      val dense = grid.join(clb, Seq("label", "b"), "left")
        .select(col("label"), col("b"),
          (coalesce(col("cnt"), lit(0L)) + 1L).as("c1"))
      val tl = dense.groupBy("label").agg(sum("c1").as("tb"))
      val nl = docs.filter(col("split") === "train")
        .groupBy(col("source").as("label"))
        .agg(count(lit(1)).as("n_l"))
      val nTot = nl.agg(sum("n_l").as("n_tot"))
      val model = dense.join(tl, "label")
        .withColumn("w_m20", expr(s"${ilog2m20("c1")} - ${ilog2m20("tb")}"))
        .select("label", "b", "w_m20")
      val prior = nl.crossJoin(broadcast(nTot))
        .withColumn("prior_m20",
          expr(s"${ilog2m20("n_l")} - ${ilog2m20("n_tot")}"))
        .select("label", "prior_m20")
      val db = grams.filter(col("split") === "test")
        .groupBy("doc_id", "source", "b")
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("score_m20").desc, col("label"))
      db.join(broadcast(model), "b")
        .groupBy("doc_id", "source", "label")
        .agg(sum(col("c") * col("w_m20")).as("lik_m20"))
        .join(broadcast(prior), "label")
        .withColumn("score_m20", col("prior_m20") + col("lik_m20"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy(col("source"), col("label").as("pred_source"))
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("source", "pred_source")
    },
    Some({
      import Sampling.dIlog2m20
      s"""WITH docs AS (
      SELECT doc_id, source, text,
        CASE
          WHEN ('0x' || substr(md5(coalesce(text, '')), 1, 4))::INT < 52429
            THEN 'train'
          WHEN ('0x' || substr(md5(coalesce(text, '')), 1, 4))::INT < 58982
            THEN 'val'
          ELSE 'test'
        END AS split
      FROM documents),
    grams AS (
      SELECT doc_id, source, split,
        (('0x' || substr(md5(u.t), 1, 15))::BIGINT % $NB_B) AS b
      FROM docs,
        UNNEST(list_filter(string_split(text,' '), t -> t <> '')) u(t)),
    clb AS (
      SELECT source AS label, b, COUNT(*)::BIGINT AS cnt
      FROM grams WHERE split = 'train' GROUP BY source, b),
    grid AS (
      SELECT l.label, r.range::BIGINT AS b
      FROM (SELECT DISTINCT label FROM clb) l CROSS JOIN range($NB_B) r),
    dense AS (
      SELECT g.label, g.b, COALESCE(c.cnt, 0) + 1 AS c1
      FROM grid g LEFT JOIN clb c ON c.label = g.label AND c.b = g.b),
    tl AS (SELECT label, SUM(c1)::BIGINT AS tb FROM dense GROUP BY label),
    model AS (
      SELECT d.label, d.b,
        ${dIlog2m20("c1")} - ${dIlog2m20("tb")} AS w_m20
      FROM dense d JOIN tl USING (label)),
    nl AS (
      SELECT source AS label, COUNT(*)::BIGINT AS n_l
      FROM docs WHERE split = 'train' GROUP BY source),
    prior AS (
      SELECT label,
        ${dIlog2m20("n_l")} - ${dIlog2m20("(SELECT SUM(n_l)::BIGINT FROM nl)")}
          AS prior_m20
      FROM nl),
    db AS (
      SELECT doc_id, source, b, COUNT(*)::BIGINT AS c
      FROM grams WHERE split = 'test' GROUP BY doc_id, source, b),
    scored AS (
      SELECT db.doc_id, db.source, m.label,
        p.prior_m20 + SUM(db.c * m.w_m20) AS score_m20
      FROM db JOIN model m USING (b) JOIN prior p ON p.label = m.label
      GROUP BY db.doc_id, db.source, m.label, p.prior_m20),
    pred AS (
      SELECT doc_id, source, label,
        row_number() OVER (PARTITION BY doc_id
          ORDER BY score_m20 DESC, label) AS rn
      FROM scored)
    SELECT source, label AS pred_source, COUNT(*)::BIGINT AS n_docs
    FROM pred WHERE rn = 1
    GROUP BY source, label ORDER BY source, pred_source"""
    }))

  val all: Seq[Q] = Seq(classify, prf, nb)
}
