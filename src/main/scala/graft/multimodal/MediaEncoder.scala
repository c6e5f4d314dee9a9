package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Pluggable media-embedding encoder — the seam where a REAL model
  * (a CLIP image tower, a CLAP audio encoder, a frame-pooled video
  * model) plugs into the multimodal embedding tier. The reference
  * surface ships no model either (aics_dask_utils
  * distributed_handler.py:15-165 distributes arbitrary user fns); what
  * this trait pins down is the SPARK-SIDE contract a model must meet so
  * every downstream artifact (EmbedState's buckets/vecs/pairs layout,
  * the verify kernels, append/compact/takedown) works unchanged:
  *
  *   - **Batched**: one `encodeBatch` call per `batchSize` records so a
  *     real implementation amortizes session/model initialization
  *     (ONNX session, JNI context, GPU transfer) across the batch —
  *     the same vectorized-decode shape as
  *     [[Multimodal.extractFeatures]]. Records flow partition-local
  *     (`mapPartitions`, no shuffle, no driver involvement; scale =
  *     number of partitions, exactly the mapInPandas economics).
  *   - **Deterministic** per payload: replay-idempotent appends and
  *     the bit-equality contract between an appended state and a
  *     from-scratch rebuild depend on it. A real float32 model is
  *     deterministic given pinned weights + single-threaded kernels;
  *     vectors are stored widened to float64 (exact) so the stored
  *     feature table feeds the existing cosine verify unchanged.
  *   - **1:1**: exactly one vector per payload, every vector exactly
  *     `dim` long (enforced at the call site). Payloads the encoder
  *     cannot embed must come back all-zero — the caller drops
  *     zero-norm vectors (a zero vector has no direction; its NaN
  *     cosine would otherwise satisfy ≥ τ under NaN-is-greatest
  *     orderings), which generalizes [[Multimodal.gramVectors]]'s
  *     under-4-bytes rule.
  */
trait MediaEncoder extends Serializable {
  def name: String

  /** Output dimensionality; every vector `encodeBatch` returns must
    * have exactly this length.
    */
  def dim: Int

  /** Encode one batch of payloads, one vector per payload in order. */
  def encodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Double]]
}

/** The existing stub tier as a [[MediaEncoder]] instance: the
  * [[Multimodal.GRAM_D]]-bucket rolling 4-byte-gram histogram
  * ([[Multimodal.gramBins]]). Routing EmbedState through this encoder
  * is bit-identical to the legacy [[Multimodal.gramVectors]] path
  * (EncoderSpec pins it), which is what keeps every gated oracle
  * untouched while the encoder seam exists.
  */
object GramHistogramEncoder extends MediaEncoder {
  val name = "gram-histogram"
  val dim: Int = Multimodal.GRAM_D
  def encodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Double]] =
    payloads.map(p => Multimodal.gramBins(p, dim).map(_.toDouble))
}

/** Deterministic stand-in with a REAL model's embedding geometry —
  * the property the gram histogram lacks (its all-positive counts
  * concentrate on common grams, so unrelated natural-language payloads
  * sit at ~0.94 cosine vs the 0.97/0.98 thresholds; the r12 blocking
  * probes measured every LSH scheme pruning-free in that geometry).
  *
  * Signed feature hashing of the rolling 4-byte windows into `dim`
  * coordinates, then L2-normalized (CLIP embeddings are unit-norm):
  * each window hashes (murmur-mixed) to a bucket and a ±1 sign, so
  * cross terms between DIFFERENT windows carry independent random
  * signs and cancel in expectation, while shared windows contribute
  * positively — E[cosine] equals the cosine of the full (collision-
  * free) gram-count vectors. Near-identical payloads share ~every
  * window → cosine ≈ 1 (tight clusters); unrelated payloads → small
  * positive background (spread) — the tight-cluster/spread-background
  * geometry the LSH tiers are designed for. No model weights, no
  * codecs, still byte-deterministic — but NOT the gram histogram, and
  * not expressible as one.
  */
object FakeClipEncoder extends MediaEncoder {
  val name = "fake-clip"
  val dim = 64
  private val SEED = 0x5f3c1a2b

  def encodeBatch(payloads: Seq[Array[Byte]]): Seq[Array[Double]] =
    payloads.map { p =>
      val v = new Array[Double](dim)
      var i = 0
      while (i + 3 < p.length) {
        val w = ((p(i) & 0xFF) << 24) | ((p(i + 1) & 0xFF) << 16) |
          ((p(i + 2) & 0xFF) << 8) | (p(i + 3) & 0xFF)
        val h = scala.util.hashing.MurmurHash3.finalizeHash(
          scala.util.hashing.MurmurHash3.mix(SEED, w), 4)
        // top 6 bits -> bucket (dim = 64), low bit -> sign
        v(h >>> 26) += (if ((h & 1) == 1) 1.0 else -1.0)
        i += 1
      }
      var ss = 0.0
      var k = 0
      while (k < dim) { ss += v(k) * v(k); k += 1 }
      if (ss > 0) {
        val inv = 1.0 / math.sqrt(ss)
        k = 0
        while (k < dim) { v(k) *= inv; k += 1 }
      }
      v
    }
}

object MediaEncoder {

  /** (vec_id, v) embedding table for a media lake under any encoder —
    * the generalized [[Multimodal.gramVectors]]: batched partition-
    * local encode, zero-norm vectors dropped (see the trait contract).
    */
  def encoderVectors(ds: Dataset[MediaRecord], enc: MediaEncoder,
      batchSize: Int = 64): DataFrame = {
    import ds.sparkSession.implicits._
    ds.mapPartitions { it =>
      it.grouped(math.max(1, batchSize)).flatMap { batch =>
        val vs = enc.encodeBatch(batch.map(_.payload))
        require(vs.length == batch.length,
          s"encoder ${enc.name} returned ${vs.length} vectors for " +
            s"${batch.length} payloads — the contract is 1:1")
        batch.iterator.zip(vs.iterator).collect {
          case (r, v) if {
                require(v.length == enc.dim,
                  s"encoder ${enc.name} returned a ${v.length}-dim " +
                    s"vector (declared dim ${enc.dim})")
                v.exists(_ != 0.0)
              } =>
            (r.mediaId, v.toSeq)
        }
      }
    }.toDF("vec_id", "v")
  }
}
