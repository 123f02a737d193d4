package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming distribution-drift monitor — PSI (population stability
  * index, the standard model-monitoring drift score) of each
  * event-time window's value histogram against a FROZEN reference
  * histogram, per event type. Complements the batch KS detector
  * (`Events.ksDrift`): KS answers "did the corpus drift between two
  * halves of one batch"; this answers "is live traffic drifting away
  * from the reference snapshot, window by window, as it arrives".
  *
  * The frozen reference is the StreamKmeans/StreamDecontaminate
  * pattern: a config-sized model (per type: bin origin, bin width,
  * `nbins` smoothed expected fractions) folded into the plan as
  * literals — no side join, no state beyond the windowed aggregation.
  * Batch and stream share the SAME expression builder ([[psiOver]]),
  * so window-closed streaming rows are bit-identical to the batch
  * relation over the same data (StreamDriftSpec pins parity across
  * micro-batch slicings).
  *
  * PSI = Σ_b (po_b − pe_b)·ln(po_b/pe_b), with add-eps smoothing on
  * BOTH sides so empty bins stay finite; drift flags at the industry
  * 0.2 threshold. The 64-term sum is one deterministic expression
  * fold per row — no float-aggregation-order hazard.
  *
  * Scale: per (window, type) state is `nbins` longs — bounded, merge
  * = vector add (the histogram sketch's contract under a watermark);
  * arrivals shuffle once on (window, type). Values outside the
  * reference range clamp into the edge bins, which is exactly where
  * out-of-support drift should score. */
object StreamDrift {

  case class RefHist(lo: Double, w: Double, fracs: Seq[Double])

  /** Freeze the reference model from a BATCH snapshot: per type, the
    * [min,max] bin grid and the eps-smoothed bin fractions. The bin
    * counts aggregate DISTRIBUTED (the histogram sketch's shape); only
    * the bounded types × nbins relation is collected — a parameter
    * table, like every frozen model in this package. */
  def freezeReference(events: DataFrame, nbins: Int = 64,
                      eps: Double = 0.5): Map[String, RefHist] = {
    val stats = events.groupBy("event_type")
      .agg(min("value").as("lo"), max("value").as("hi"),
        count(lit(1)).as("n"))
      .withColumn("w", (col("hi") - col("lo")) / lit(nbins.toDouble))
    val cnts = events
      .join(broadcast(stats.select("event_type", "lo", "w")), "event_type")
      .withColumn("bin",
        when(col("w") === 0, lit(0L))
          .otherwise(greatest(lit(0L),
            least(floor((col("value") - col("lo")) / col("w")),
              lit(nbins - 1L)))).cast("int"))
      .groupBy("event_type", "bin").agg(count(lit(1)).as("cnt"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    stats.select("event_type", "lo", "w", "n").collect().map { r =>
      val (t, lo, w, n) = (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3))
      t -> RefHist(lo, w, (0 until nbins).map(b =>
        (cnts.getOrElse((t, b), 0L) + eps) / (n + nbins * eps)))
    }.toMap
  }

  private def caseOver(ref: Map[String, RefHist], f: RefHist => Double): Column = {
    val ts = ref.keys.toSeq.sorted
    ts.tail.foldLeft(when(col("event_type") === ts.head, lit(f(ref(ts.head))))) {
      (acc, t) => acc.when(col("event_type") === t, lit(f(ref(t))))
    }
  }

  /** Per-row bin under the FROZEN grid: clamped into [0, nbins) so
    * out-of-reference-support values land in the edge bins. */
  def binCol(ref: Map[String, RefHist], nbins: Int): Column = {
    val lo = caseOver(ref, _.lo)
    val w = caseOver(ref, _.w)
    when(w === 0, lit(0L))
      .otherwise(greatest(lit(0L),
        least(floor((col("value") - lo) / w), lit(nbins - 1L))))
      .cast("int")
  }

  /** The shared aggregate: group `df` (already filtered to reference
    * types, with a `bin` column) by `groupCols`, count per bin, and
    * score PSI against the frozen fractions. Works identically on a
    * static or streaming relation — parity by construction. */
  def psiOver(df: DataFrame, ref: Map[String, RefHist],
              groupCols: Seq[Column], nbins: Int = 64,
              eps: Double = 0.5, threshold: Double = 0.2): DataFrame = {
    val binned = df
      .filter(col("event_type").isin(ref.keys.toSeq.sorted: _*))
      .withColumn("bin", binCol(ref, nbins))
    val cntCols = (0 until nbins).map(b =>
      sum(when(col("bin") === b, 1L).otherwise(0L)).as(s"c$b"))
    val agged = binned.groupBy(groupCols: _*)
      .agg(cntCols.head, cntCols.tail: _*)
      .withColumn("n", (0 until nbins).map(b => col(s"c$b")).reduce(_ + _))
    val psi = (0 until nbins).map { b =>
      val po = (col(s"c$b") + lit(eps)) / (col("n") + lit(nbins * eps))
      val pe = caseOver(ref, _.fracs(b))
      (po - pe) * log(po / pe)
    }.reduce(_ + _)
    agged.select(
      unix_micros(col("w.start")).as("window_start_us"),
      col("event_type"), col("n"),
      round(psi, 6).as("psi"),
      (psi > threshold).cast("int").as("drift"))
  }

  /** Batch relation over a static snapshot — the parity anchor. */
  def psiBatch(events: DataFrame, ref: Map[String, RefHist],
               width: String = "1 hour", nbins: Int = 64): DataFrame =
    psiOver(events, ref,
      Seq(window(col("ts"), width).as("w"), col("event_type")), nbins)
      .orderBy("window_start_us", "event_type")

  /** events: streaming (ts, event_type, value). Windows close in
    * append mode when the watermark passes; each closed row is final
    * and equals the batch relation's row for the same data. */
  def psiStream(events: DataFrame, ref: Map[String, RefHist],
                width: String = "1 hour", watermarkDelay: String = "1 minute",
                nbins: Int = 64): DataFrame =
    psiOver(events.withWatermark("ts", watermarkDelay), ref,
      Seq(window(col("ts"), width).as("w"), col("event_type")), nbins)
}
