package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.dedup.Dedup

/** Streaming MinHash NEAR-duplicate detection (north-star dedup × ST):
  * the streaming twin of batch `Dedup.minhashPairs`, for the ingest
  * shape where near-dups must surface as documents arrive instead of
  * in a nightly batch pass.
  *
  * Design:
  *  - The signature is computed PER ROW (Dedup.rowShingles →
  *    rowMinhashes → rowBandKeys — the same md5 hash family as the
  *    batch path, shared by construction): a doc's MinHash depends
  *    only on its own text, so the stream needs no aggregation before
  *    the band explode — narrow projections all the way to the state
  *    lookup.
  *  - Candidate pairing is keyed state per (band_idx, band_key) via
  *    flatMapGroupsWithState: each band bucket retains the (doc_id,
  *    event-time) of docs seen within the watermark horizon; a new
  *    arrival emits one pair per retained member, exactly one row per
  *    shared band — so summing emissions per pair reproduces the batch
  *    path's n_shared_bands.
  *  - State is bounded by event time: a bucket's timeout is its newest
  *    member's event time + the TTL, so state size tracks
  *    docs-per-band-per-horizon, not stream length — same bounding
  *    rule as StreamDedup. A pair whose members arrive further apart
  *    than the horizon is NOT emitted (the documented semantics:
  *    unbounded-horizon near-dup needs unbounded state; compact with
  *    the batch pass downstream).
  *
  * Scale: the only shuffle is the groupByKey on (band_idx, band_key) —
  * id-and-key rows, never text. A pathologically hot band key
  * concentrates its bucket on one task; more bands / more rows per
  * band keep buckets selective, the same dial as the batch join.
  *
  * Parity note (round 13): batch `minhashPairs` now collapses
  * signature-identical groups to keeper STARS before banding, while
  * the stream emits arrival-order member pairs (it cannot know the
  * group's eventual min id). The two are transitive-closure
  * equivalent; exact pair-for-pair parity holds on corpora without
  * signature-identical groups of size ≥ 3 (StreamNearDupSpec's
  * fixtures) — within-window member blowup is separately bounded by
  * the round-12 churn gates.
  */
object StreamNearDup {

  // keeps the watermarked `ts` column itself (projecting it into a
  // plain long would strip the event-time marker the EventTimeTimeout
  // requires)
  case class BandArrival(bandIdx: Int, bandKey: String, docId: Long, ts: java.sql.Timestamp)
  case class BandMember(docId: Long, tsMs: Long)
  case class BandState(docs: List[BandMember])
  case class CandidatePair(doc_a: Long, doc_b: Long, band_idx: Int)

  /** docs: streaming (doc_id, ts, text). Emits (doc_a, doc_b,
    * band_idx) — one row per band both docs hashed into, doc_a <
    * doc_b; aggregate counts per pair to recover n_shared_bands. */
  def minhashPairsStream(docs: DataFrame, watermarkDelay: String = "1 hour",
                         stateTtlMs: Long = 3600000L,
                         numHashes: Int = 16, bands: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val arrivals: Dataset[BandArrival] = docs
      .withColumn("shingles", Dedup.rowShingles(col("text")))
      .withColumn("mhs", Dedup.rowMinhashes(col("shingles"), numHashes))
      .withColumn("bk", explode(Dedup.rowBandKeys(col("mhs"), numHashes, bands)))
      .withWatermark("ts", watermarkDelay)
      .select(col("bk.band_idx").as("bandIdx"), col("bk.band_key").as("bandKey"),
        col("doc_id").as("docId"), col("ts"))
      .as[BandArrival]

    def update(key: (Int, String), it: Iterator[BandArrival],
               state: GroupState[BandState]): Iterator[CandidatePair] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        // Members older than the horizon are pruned EVERY invocation,
        // not only at whole-bucket timeout: a hot band key (template
        // text under continuous duplicate churn) refreshes its timeout
        // forever, so without in-bucket pruning its member list — and
        // the pairs each new arrival emits — grows with stream length
        // instead of the horizon (the round-12 soak measured exactly
        // that: per-batch emissions climbing linearly). Watermark-gated
        // prune keeps re-runs deterministic (the watermark is part of
        // the checkpoint), and the Δts<ttl emission gate below makes
        // the documented "further apart than the horizon ⇒ not
        // emitted" contract hold even within one micro-batch.
        val wm = state.getCurrentWatermarkMs()
        var members = state.getOption.map(_.docs).getOrElse(Nil)
          .filter(_.tsMs + stateTtlMs > wm)
        // deterministic within-batch order so re-runs emit identical pairs
        val sorted = it.toArray.sortBy(a => (a.ts.getTime, a.docId))
        val out = Seq.newBuilder[CandidatePair]
        sorted.foreach { a =>
          if (!members.exists(_.docId == a.docId)) {
            members.foreach(m => if (math.abs(a.ts.getTime - m.tsMs) < stateTtlMs)
              out += CandidatePair(
                math.min(m.docId, a.docId), math.max(m.docId, a.docId), key._1))
            members = BandMember(a.docId, a.ts.getTime) :: members
          }
        }
        state.update(BandState(members))
        state.setTimeoutTimestamp(members.map(_.tsMs).max + stateTtlMs)
        out.result().iterator
      }
    }

    arrivals
      .groupByKey(a => (a.bandIdx, a.bandKey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
      .toDF()
  }

  // ---- SimHash twin (batch Dedup.simhashPairs) ----

  /** SimHash band state carries each member's full 60-bit signature so
    * the exact popcount filter runs inside the state function — unlike
    * MinHash, where the pair itself is the output, a SimHash candidate
    * must clear Hamming ≤ maxHamming before it surfaces. */
  case class SimBandArrival(bandIdx: Int, bandKey: Long, docId: Long, sig: Long,
                            ts: java.sql.Timestamp)
  case class SimMember(docId: Long, sig: Long, tsMs: Long)
  case class SimBandState(docs: List[SimMember])
  case class SimPair(doc_a: Long, doc_b: Long, hamming: Int, band_idx: Int)

  /** Streaming twin of batch `Dedup.simhashPairs`: per-row signatures
    * (Dedup.rowSimhash* — bit-identical to the batch aggregate by
    * construction) banded with the SAME multi-block keys
    * (Dedup.simhashBandKeys), band-key state with event-time TTL. Emits
    * one row per shared band that clears the Hamming filter; distinct
    * (doc_a, doc_b) downstream reproduces the batch pair set — the
    * batch path's `.distinct()` across bands cannot run inside
    * per-band state, so the dedup is the consumer's (documented, same
    * horizon caveat as minhashPairsStream). */
  def simhashPairsStream(docs: DataFrame, watermarkDelay: String = "1 hour",
                         stateTtlMs: Long = 3600000L, maxHamming: Int = 8,
                         blocks: Int = 4): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val arrivals: Dataset[SimBandArrival] = docs
      .withColumn("bitsums", Dedup.rowSimhashBitSums(col("text")))
      .withColumn("sig", Dedup.rowSimhashFrom(col("bitsums")))
      .withColumn("bk", explode(Dedup.simhashBandKeys(col("sig"), blocks)))
      .withWatermark("ts", watermarkDelay)
      .select(col("bk.band_idx").as("bandIdx"), col("bk.band_key").as("bandKey"),
        col("doc_id").as("docId"), col("sig"), col("ts"))
      .as[SimBandArrival]

    def update(key: (Int, Long), it: Iterator[SimBandArrival],
               state: GroupState[SimBandState]): Iterator[SimPair] = {
      if (state.hasTimedOut) { state.remove(); Iterator.empty }
      else {
        // same in-bucket horizon pruning + Δts emission gate as the
        // MinHash twin (hot-band member accretion, round-12 soak)
        val wm = state.getCurrentWatermarkMs()
        var members = state.getOption.map(_.docs).getOrElse(Nil)
          .filter(_.tsMs + stateTtlMs > wm)
        val sorted = it.toArray.sortBy(a => (a.ts.getTime, a.docId))
        val out = Seq.newBuilder[SimPair]
        sorted.foreach { a =>
          if (!members.exists(_.docId == a.docId)) {
            members.foreach { m =>
              val h = java.lang.Long.bitCount(m.sig ^ a.sig)
              if (h <= maxHamming && math.abs(a.ts.getTime - m.tsMs) < stateTtlMs)
                out += SimPair(
                  math.min(m.docId, a.docId), math.max(m.docId, a.docId), h, key._1)
            }
            members = SimMember(a.docId, a.sig, a.ts.getTime) :: members
          }
        }
        state.update(SimBandState(members))
        state.setTimeoutTimestamp(members.map(_.tsMs).max + stateTtlMs)
        out.result().iterator
      }
    }

    arrivals
      .groupByKey(a => (a.bandIdx, a.bandKey))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
      .toDF()
  }
}
