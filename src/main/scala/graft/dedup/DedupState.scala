package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The dedup STATE as a PERSISTED artifact — verified near-dup pairs +
  * connected-component cluster labels, built ONCE per corpus snapshot
  * and read by every keep/weight/split consumer.
  *
  * This is the production shape of the whole cluster-consumer family:
  * at 100 TB the expensive work — shingling the corpus, the banded
  * MinHash bucket self-join, exact-jaccard verification, and the
  * O(log d) component loop — happens once per ingest, and what survives
  * is two THIN tables (~1/1000th of the corpus bytes):
  *
  *   - `path/pairs`  = (a_id, b_id, jaccard) — the verified ≥τ pair
  *     list ([[Dedup.minhashPairs]]'s rows, raw doubles).
  *   - `path/labels` = (doc_id, cluster_id, cluster_size) — full corpus
  *     coverage (singletons cluster to themselves, size 1), cluster id
  *     = component-min doc_id.
  *
  * Every downstream policy — hard keep-min ([[Dedup]] `dedup_clusters`),
  * keep-longest (`dedup_keep_best`), soft weights (`dedup_weights`),
  * leakage-safe splits (`sample_split_dedup`), semantic gating
  * (`dedup_lexsem`) — is a cheap join/window over these two tables; the
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

  /** Number of artifact builds this JVM ran — specs assert builds-once. */
  private[graft] var buildCount = 0

  private val built =
    scala.collection.concurrent.TrieMap.empty[String, String]

  /** Build the pair + label artifact at `path`, overwriting any prior
    * state there. The label pass runs [[Dedup.connectedComponents]] over
    * the pairs READ BACK from storage — CC's iterative joins consume
    * plain parquet attributes, never the live shingle/bucket lineage.
    */
  def buildDedupState(s: SparkSession, dir: String, path: String): Unit = {
    buildCount += 1
    Dedup.minhashPairs(s, dir)
      .write.mode("overwrite").parquet(s"$path/pairs")
    val pairs = s.read.parquet(s"$path/pairs")
    val labels = Dedup.connectedComponents(
      pairs.select(col("a_id").as("u"), col("b_id").as("v")))
    val assigned = Tables(s, dir, "documents").select(col("doc_id"))
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
