package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The dedup STATE as a PERSISTED artifact — verified near-dup pairs +
  * connected-component cluster labels, built ONCE per corpus snapshot
  * and read by every keep/weight/split consumer; APPENDED per incoming
  * slice (the production ingest loop).
  *
  * This is the production shape of the whole cluster-consumer family:
  * at 100 TB the expensive work — shingling the corpus, the banded
  * MinHash bucket self-join, exact-jaccard verification, and the
  * O(log d) component loop — happens once per ingest, and what survives
  * is three THIN tables (~1/1000th of the corpus bytes):
  *
  *   - `path/pairs`   = (a_id, b_id, jaccard) — the verified ≥τ pair
  *     list ([[Dedup.minhashPairs]]'s rows, raw doubles).
  *   - `path/labels`  = (doc_id, cluster_id, cluster_size) — full
  *     corpus coverage (singletons cluster to themselves, size 1),
  *     cluster id = component-min doc_id.
  *   - `path/buckets` = (doc_id, band, bh) MinHash band buckets — the
  *     append-side candidate state (the [[MinhashIndex]] layout), so
  *     an incoming slice pairs against ALL history without re-reading
  *     base text except for the few candidate docs the verify touches.
  *
  * Every downstream policy — hard keep-min ([[Dedup]] `dedup_clusters`),
  * keep-longest (`dedup_keep_best`), soft weights (`dedup_weights`),
  * leakage-safe splits (`sample_split_dedup`), semantic gating
  * (`dedup_lexsem`) — is a cheap join/window over the thin tables; the
  * `*_persisted` query twins in [[Dedup]] read them instead of
  * re-deriving pairs from raw text per invocation. Results are identical
  * to the derive-in-query twins by construction (same pipeline, and
  * doubles round-trip parquet bit-exactly), so each twin is gated by the
  * SAME DuckDB oracle verbatim — the
  * [[graft.sim.Knn.buildKnnGraphIndex]] precedent.
  *
  * Build is session-cached per corpus dir (the `builtIndexes` pattern,
  * rooted at `spark.graft.indexDir` / checkpointDir / tmpdir): Verify
  * and every Bench rep reuse one build, and a changed pair pipeline
  * needs a fresh JVM to show up here — the knn_ivf_persisted contract.
  */
object DedupState {

  /** Build/append counts this JVM — specs assert builds-once. */
  private[graft] var buildCount = 0
  private[graft] var appendCount = 0

  private val built =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Verified-pair candidates from a banded bucket self-join — the
    * [[Dedup.minhashPairs]] candidate stage over any bucket frame.
    */
  private def selfCandidates(buckets: DataFrame): DataFrame =
    buckets.as("x").join(buckets.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh")
          && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a_id"), col("y.doc_id").as("b_id"))
      .distinct()

  /** Recompute `path/labels` from the stored pairs over `docIds`
    * (full coverage — singletons label themselves, size 1).
    */
  private def writeLabels(s: SparkSession, docIds: DataFrame,
      path: String): Unit = {
    val pairs = s.read.parquet(s"$path/pairs")
    val labels = Dedup.connectedComponents(
      pairs.select(col("a_id").as("u"), col("b_id").as("v")))
    val assigned = docIds.select(col("doc_id"))
      .join(labels.select(col("id").as("doc_id"), col("label")),
        Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("label"), col("doc_id")).as("cluster_id"))
    val sizes = assigned.groupBy("cluster_id")
      .agg(count(lit(1)).as("cluster_size"))
    assigned.join(sizes, "cluster_id")
      .select("doc_id", "cluster_id", "cluster_size")
      .write.mode("overwrite").parquet(s"$path/labels")
  }

  /** Build the artifact at `path` from (doc_id, text) rows, overwriting
    * any prior state there. The label pass runs
    * [[Dedup.connectedComponents]] over the pairs READ BACK from
    * storage — CC's iterative joins consume plain parquet attributes,
    * never the live shingle/bucket lineage.
    */
  def buildDedupStateFrom(docs: DataFrame, path: String): Unit = {
    buildCount += 1
    val s = docs.sparkSession
    val ds = Dedup.shingleTable(docs)
    val buckets = graft.Checkpoint.of(Dedup.bandBucketsFromShingles(ds))
    buckets.write.mode("overwrite").parquet(s"$path/buckets")
    Dedup.verifyJaccard(selfCandidates(buckets), ds, Dedup.TAU)
      .write.mode("overwrite").parquet(s"$path/pairs")
    writeLabels(s, docs.select("doc_id"), path)
  }

  /** Dir-based build over the driver's `documents` table. */
  def buildDedupState(s: SparkSession, dir: String, path: String): Unit =
    buildDedupStateFrom(
      Tables(s, dir, "documents").select("doc_id", "text"), path)

  /** Append an incoming SLICE to an existing artifact — the production
    * ingest loop (doc_ids must be globally unique and the slice must
    * not have been appended before; the [[MinhashIndex.append]] /
    * textIndexSink contract):
    *
    *   1. the slice's band buckets join the STORED bucket history
    *      (slice×base) and themselves (slice×slice) — candidate volume
    *      is collision-mass-proportional, never slice×corpus;
    *   2. exact-jaccard verify re-shingles ONLY the candidate base
    *      docs (a thin id semi-join against `baseDocs` — candidates
    *      are a vanishing corpus fraction, so base text is touched
    *      per-candidate, never per-slice);
    *   3. the verified pairs and the slice's buckets APPEND (thin
    *      rows); labels are recomputed from the stored pair table —
    *      thin (id, label) CC rounds, the only non-incremental stage,
    *      over pair-mass not corpus-mass.
    *
    * The result is IDENTICAL to a from-scratch build over base∪slice
    * (same candidate union, same verify arithmetic, same CC fixpoint —
    * DedupStateSpec proves bit-equality), so every `*_persisted`
    * consumer keeps its oracle after every append.
    */
  def appendDedupState(s: SparkSession, path: String, baseDocs: DataFrame,
      newDocs: DataFrame): Unit = {
    appendCount += 1
    val dsNew = Dedup.shingleTable(newDocs)
    val bNew = graft.Checkpoint.of(Dedup.bandBucketsFromShingles(dsNew))
    val bBase = s.read.parquet(s"$path/buckets")
    val cross = bNew.as("x").join(bBase.as("y"),
        col("x.band") === col("y.band") && col("x.bh") === col("y.bh"))
      .select(least(col("x.doc_id"), col("y.doc_id")).as("a_id"),
        greatest(col("x.doc_id"), col("y.doc_id")).as("b_id"))
      .filter(col("a_id") =!= col("b_id"))
      .distinct()
    val cand = graft.Checkpoint.of(
      cross.unionByName(selfCandidates(bNew)).distinct())
    val candIds = cand.select(col("a_id").as("doc_id"))
      .unionByName(cand.select(col("b_id").as("doc_id"))).distinct()
    val dsBase = Dedup.shingleTable(
      baseDocs.select("doc_id", "text").join(candIds, "doc_id"))
    val dsAll = dsNew.unionByName(dsBase)
    Dedup.verifyJaccard(cand, dsAll, Dedup.TAU)
      .write.mode("append").parquet(s"$path/pairs")
    bNew.write.mode("append").parquet(s"$path/buckets")
    writeLabels(s,
      baseDocs.select("doc_id").unionByName(newDocs.select("doc_id")),
      path)
  }

  private val builtIncr =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Labels produced by the INCREMENTAL path over the driver corpus:
    * build on the base sources, then [[appendDedupState]] the
    * [[Dedup.NEW_SOURCES]] slice — the production ingest split
    * `dedup_cross` uses. By the append-equals-rebuild contract
    * (DedupStateSpec proves it bit-exactly) the result is the full
    * build's label table, so the derive-in-query `dedup_clusters`
    * oracle gates the WHOLE incremental path end-to-end at the driver.
    * Session-cached per corpus dir (builtIndexes contract).
    */
  def readLabelsIncremental(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(builtIncr.getOrElseUpdate(dir, {
      val name =
        "graft-dedupstate-incr-" + dir.replaceAll("[^A-Za-z0-9.]+", "_")
      val path =
        new org.apache.hadoop.fs.Path(graft.Indexes.root(s), name).toString
      val docs = Tables(s, dir, "documents")
        .select(col("doc_id"), col("text"), col("source"))
      val isNew = col("source").isin(Dedup.NEW_SOURCES: _*)
      buildDedupStateFrom(
        docs.filter(!isNew).select("doc_id", "text"), path)
      appendDedupState(s, path,
        docs.filter(!isNew).select("doc_id", "text"),
        docs.filter(isNew).select("doc_id", "text"))
      path
    }) + "/labels")

  private def cached(s: SparkSession, dir: String): String =
    built.getOrElseUpdate(dir, {
      val name = "graft-dedupstate-" + dir.replaceAll("[^A-Za-z0-9.]+", "_")
      val path =
        new org.apache.hadoop.fs.Path(graft.Indexes.root(s), name).toString
      buildDedupState(s, dir, path)
      path
    })

  /** The stored verified pair list (a_id, b_id, jaccard). */
  def readPairs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(cached(s, dir) + "/pairs")

  /** The stored full-coverage label table
    * (doc_id, cluster_id, cluster_size).
    */
  def readLabels(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(cached(s, dir) + "/labels")
}
