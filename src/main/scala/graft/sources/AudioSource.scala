package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Audio as an opaque binary column (builder north star: multimodal
  * columns with typed metadata). Scope: 16-bit mono PCM WAV — the RIFF
  * container parses in ~30 lines of pure JVM, so unlike heavier codecs
  * this leg is REAL end-to-end: synthesize → bytes → parse → windowed
  * features, all spec-covered. Compressed formats would slot behind the
  * same decode UDF (deliberately the single swap point, like
  * ImageSource/Dicom).
  *
  * Features follow the standard cheap front-end: per-window RMS energy
  * and zero-crossing count — pure relational aggregation once samples
  * are long-format (sample_idx div windowSize is the tumbling window
  * key, the batch twin of the streaming window(ts) aggregations). */
object AudioSource {

  case class Wav(sampleRate: Int, samples: Array[Int])

  /** Parse a 16-bit mono PCM WAV (RIFF → fmt → data chunk walk). */
  def parseWav(bytes: Array[Byte]): Wav = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    require(bytes.length > 44 && new String(bytes, 0, 4) == "RIFF" &&
      new String(bytes, 8, 4) == "WAVE", "not a RIFF/WAVE file")
    buf.position(12)
    var sampleRate = 0
    var samples: Array[Int] = null
    while (buf.remaining() > 8) {
      val id = new String(Array(buf.get(), buf.get(), buf.get(), buf.get()).map(_.toChar))
      val len = buf.getInt()
      val start = buf.position()
      id match {
        case "fmt " =>
          val fmt = buf.getShort(); val channels = buf.getShort()
          require(fmt == 1 && channels == 1, "only mono PCM supported")
          sampleRate = buf.getInt(start + 4)
          require(buf.getShort(start + 14) == 16, "only 16-bit supported")
        case "data" =>
          samples = Array.tabulate(len / 2)(i => buf.getShort(start + i * 2).toInt)
        case _ => ()
      }
      buf.position(start + len + (len & 1)) // chunks are word-aligned
    }
    require(sampleRate > 0 && samples != null, "missing fmt/data chunk")
    Wav(sampleRate, samples)
  }

  val parseUdf = udf { bytes: Array[Byte] => parseWav(bytes) }

  /** Decode a binary column to long-format samples
    * (clip_id, sample_rate, sample_idx, amp). */
  def samples(df: DataFrame, idCol: String = "clip_id", binaryCol: String = "content"): DataFrame =
    df.withColumn("w", parseUdf(col(binaryCol)))
      .select(col(idCol), col("w.sampleRate").as("sample_rate"),
        posexplode(col("w.samples")).as(Seq("sample_idx", "amp")))

  /** Per-tumbling-window features: RMS energy + zero-crossing count. */
  def windowFeatures(samples: DataFrame, windowSize: Int = 256): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("clip_id").orderBy("sample_idx")
    samples
      .withColumn("prev_amp", lag("amp", 1).over(w))
      .withColumn("win", expr(s"sample_idx div $windowSize"))
      .groupBy("clip_id", "win")
      .agg(
        count(lit(1)).as("n_samples"),
        round(sqrt(avg(col("amp") * col("amp"))), 4).as("rms"),
        sum(when(col("prev_amp").isNotNull &&
          ((col("amp") >= 0 && col("prev_amp") < 0) || (col("amp") < 0 && col("prev_amp") >= 0)),
          1L).otherwise(0L)).as("zero_crossings"))
  }

  /** Dominant-frequency detection per clip (Goertzel/DFT-bin energy
    * over a candidate set — the tone-detection "feature extract" step
    * of an audio pipeline): for each candidate f, the bin power is
    * (Σ s_i·cos θ_i)² + (Σ s_i·sin θ_i)² with θ = 2πf·i/rate; the
    * clip's dominant frequency is the argmax bin, ties to the lowest
    * frequency. Per-term products are rounded to integer MICROS before
    * the sums (the BM25 discipline), so the reductions are associative
    * and order-free — the emitted powers are deterministic under any
    * partitioning, which is what lets the oracle value-pin them.
    *
    * Scale: candidates explode map-side (|cands| rows per sample),
    * then ONE partial+final hash agg per (clip, f) — linear in
    * samples, and the argmax window runs over |cands| rows per clip. */
  def dominantFreq(samples: DataFrame,
                   candidates: Seq[Double] = Seq(220.0, 330.0, 440.0, 550.0)): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val binPowers = samples
      .withColumn("f", explode(array(candidates.map(lit): _*)))
      .withColumn("theta",
        lit(2 * math.Pi) * col("f") * col("sample_idx") / col("sample_rate"))
      .withColumn("cs_micro", round(col("amp") * cos(col("theta")) * lit(1e6)).cast("long"))
      .withColumn("sn_micro", round(col("amp") * sin(col("theta")) * lit(1e6)).cast("long"))
      .groupBy("clip_id", "f")
      .agg(sum("cs_micro").as("cs"), sum("sn_micro").as("sn"))
      .withColumn("power",
        (col("cs") / lit(1e6)) * (col("cs") / lit(1e6)) +
          (col("sn") / lit(1e6)) * (col("sn") / lit(1e6)))
    val byPower = Window.partitionBy("clip_id").orderBy(col("power").desc, col("f"))
    val ranked = binPowers.withColumn("rk", row_number().over(byPower))
    val best = ranked.filter(col("rk") === 1)
      .select(col("clip_id"), col("f").as("dominant_hz"), col("power").as("p1"))
    val second = ranked.filter(col("rk") === 2)
      .select(col("clip_id"), col("power").as("p2"))
    best.join(second, "clip_id")
      .select(col("clip_id"), col("dominant_hz").cast("int").as("dominant_hz"),
        round(log10(col("p1") / col("p2")) * lit(10.0), 2).as("margin_db"))
      .orderBy("clip_id")
  }

  /** Synthesize a mono 16-bit WAV: clip k is a sine at (220 + 110·k) Hz,
    * amplitude 8000, 16 kHz — zero-crossing counts recover ~2·f/windows. */
  def synthesize(freqHz: Double, nSamples: Int, sampleRate: Int = 16000,
                 amplitude: Int = 8000): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen).put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1).putInt(sampleRate)
      .putInt(sampleRate * 2).putShort(2).putShort(16)
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    (0 until nSamples).foreach { i =>
      buf.putShort((amplitude * math.sin(2 * math.Pi * freqHz * i / sampleRate)).toShort)
    }
    buf.array()
  }

  private val synthUdf = udf { (k: Int, n: Int) => synthesize(220.0 + 110.0 * k, n) }

  def syntheticClips(spark: SparkSession, nClips: Int = 4, nSamples: Int = 4096): DataFrame =
    spark.range(nClips).select(col("id").cast("int").as("clip_id"))
      .withColumn("content", synthUdf(col("clip_id"), lit(nSamples)))
}
