package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig}

import graft.functions.{SignatureExprs, TextFunctions => TF}

/** Streaming MinHash-LSH near-duplicate detection — the continuous-crawl
  * twin of `q_dedup_minhash_lsh`: a document FEED (not a static corpus)
  * where each arriving doc must be checked against what the pipeline has
  * already admitted, without ever holding the corpus or running a batch
  * self-join.
  *
  * Shape (identical dataflow to the batch query, state replacing the
  * self-join side):
  *   1. map-side, codegen'd: words → 3-shingles → 32-slot MinHash
  *      signature → 8 LSH band keys (the same [[SignatureExprs]] /
  *      [[TF.minhashBands]] expressions the batch query uses — one
  *      detector definition, two execution modes);
  *   2. each doc fans out to its 8 (band, key) rows — the ONLY shuffle,
  *      keyed exactly like the batch equi-join;
  *   3. per (band, key) bucket, `transformWithState` keeps the signatures
  *      previously seen in that bucket and compares each arrival against
  *      them: estimated Jaccard = matching signature slots / 32 (the
  *      standard MinHash estimator), emitting a [[NearDupStream.Match]]
  *      when it clears `minSamePm`.
  *
  * Scale properties: state is sharded by band-bucket (uniform 60-bit
  * hash keys — no hot partitions), TTL-evicted (near-dup against the
  * RECENT stream; full-history dedup is the batch job's role, the same
  * division of labor as q_dedup_incremental), and each bucket holds at
  * most `maxBucket` signatures — LSH buckets are small by construction
  * (that is the whole point of banding), so the cap only disarms the
  * degenerate bucket a pathological key collision would grow. A capped
  * bucket goes INACTIVE for new arrivals — no admission and no
  * comparison (matching without admitting would make a re-delivered
  * rejected doc re-emit its matches, breaking the idempotence contract
  * below) — and the doc's other 7 bands still carry it, so a true
  * near-dup pair is only lost if ALL its bands landed in capped
  * buckets.
  *
  * A pair sharing several bands emits once per shared band; consumers
  * wanting pair-level output dedup on (docId, matchId) — kept out of the
  * operator so the per-band evidence (which bands agree) stays
  * observable.
  */
object NearDupStream {

  /** One doc in one LSH bucket: the fan-out row. */
  final case class BandRow(band: Int, key: Long, docId: Long,
      sig: Seq[Long])

  /** Emitted near-dup verdict: `samePm` = matching-slot rate per mille
    * (the MinHash Jaccard estimate ×1000, integer-exact). */
  final case class Match(docId: Long, matchId: Long, band: Int,
      samePm: Long)

  private final case class StoredSig(docId: Long, sig: Seq[Long])

  implicit val bandRowEnc: Encoder[BandRow] = Encoders.product[BandRow]
  implicit val matchEnc: Encoder[Match] = Encoders.product[Match]
  private implicit val storedEnc: Encoder[StoredSig] =
    Encoders.product[StoredSig]

  /** Matching-slot count ×1000 / slots — the integer MinHash estimate. */
  private def samePm(a: Seq[Long], b: Seq[Long]): Long = {
    var same = 0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) { if (a(i) == b(i)) same += 1; i += 1 }
    same.toLong * 1000 / math.max(n, 1)
  }

  /** Per-bucket state machine: compare each arrival against the bucket's
    * stored signatures (and earlier arrivals of the same batch), then
    * admit it as a future reference. The same doc re-delivered
    * (at-least-once upstream) is recognized by docId and neither
    * re-emitted as its own duplicate nor double-stored. */
  class BucketProcessor(ttl: java.time.Duration, minSamePm: Long,
      maxBucket: Int)
      extends StatefulProcessor[(Int, Long), BandRow, Match] {
    @transient private var seen: ListState[StoredSig] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getListState[StoredSig]("seen", storedEnc,
        TTLConfig(ttl))

    override def handleInputRows(key: (Int, Long),
        rows: Iterator[BandRow],
        timerValues: TimerValues): Iterator[Match] = {
      val prior = scala.collection.mutable.ArrayBuffer.empty[StoredSig]
      seen.get().foreach(prior += _)
      val out = Vector.newBuilder[Match]
      val admitted = scala.collection.mutable.ArrayBuffer.empty[StoredSig]
      rows.foreach { r =>
        val known = prior.exists(_.docId == r.docId) ||
          admitted.exists(_.docId == r.docId)
        // a full bucket is inactive for unknown arrivals: compare-only
        // would re-emit on every at-least-once re-delivery of a
        // rejected doc (nothing stored to recognize it by)
        if (!known && prior.size + admitted.size < maxBucket) {
          (prior.iterator ++ admitted.iterator).foreach { p =>
            val pm = samePm(r.sig, p.sig)
            if (pm >= minSamePm) out += Match(r.docId, p.docId, r.band, pm)
          }
          admitted += StoredSig(r.docId, r.sig)
        }
      }
      admitted.foreach(seen.appendValue)
      out.result().iterator
    }
  }

  /** Wire the detector over a streaming `docs` frame with (`docIdCol`
    * BIGINT, `textCol` STRING). Docs under 3 words carry no 3-shingle
    * and are passed through silently (they cannot near-dup by this
    * detector; exact streaming dedup — [[StreamOps.dedupWithinWatermark]]
    * on the content hash — is the right tool for them).
    * Requires the RocksDB state store provider (transformWithState). */
  def nearDups(docs: DataFrame, docIdCol: String, textCol: String,
      ttl: java.time.Duration, minSamePm: Long = 500L,
      maxBucket: Int = 64): Dataset[Match] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sig = docs
      .withColumn("ws", TF.words(col(textCol)))
      .filter(size(col("ws")) >= 3)
      .select(col(docIdCol).cast("long").as("docId"),
        SignatureExprs.minhashSig(
          SignatureExprs.wordShingles(col("ws"), 3), 32).as("sig"))
      .withColumn("bands", TF.minhashBands("sig", 8, 4))
    sig
      .select(col("docId"), col("sig"),
        posexplode(col("bands")).as(Seq("band", "key")))
      .select(col("band").cast("int").as("band"), col("key"),
        col("docId"), col("sig"))
      .as[BandRow]
      .groupByKey(r => (r.band, r.key))
      .transformWithState(new BucketProcessor(ttl, minSamePm, maxBucket),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }
}
