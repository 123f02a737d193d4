package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Vision
import graft.sources.AudioSource

/** Audio modality (WAV round-trip + windowed features) and image
  * resize coverage. */
class AudioSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("WAV synthesize/parse round-trip preserves samples and rate") {
    val bytes = AudioSource.synthesize(440.0, 1000)
    val wav = AudioSource.parseWav(bytes)
    assert(wav.sampleRate === 16000)
    assert(wav.samples.length === 1000)
    // peak amplitude near the configured 8000
    assert(wav.samples.max > 7500 && wav.samples.max <= 8000)
  }

  test("zero-crossing rate recovers the synthesized frequency") {
    val clips = AudioSource.syntheticClips(spark, nClips = 3, nSamples = 4096)
    val feats = AudioSource.windowFeatures(AudioSource.samples(clips), windowSize = 4096)
      .collect().map(r => r.getAs[Int]("clip_id") -> r.getAs[Long]("zero_crossings")).toMap
    // a sine at f Hz crosses zero 2f times/second; 4096 samples @16kHz = 0.256 s
    for (k <- 0 until 3) {
      val f = 220.0 + 110.0 * k
      val expect = 2 * f * 4096 / 16000.0
      assert(math.abs(feats(k) - expect) <= 2, s"clip $k: ${feats(k)} vs $expect")
    }
  }

  test("Goertzel bin argmax recovers each clip's synthesis frequency with clear margin") {
    val clips = AudioSource.syntheticClips(spark)
    val out = AudioSource.dominantFreq(AudioSource.samples(clips)).collect()
      .map(r => r.getAs[Int]("clip_id") ->
        ((r.getAs[Int]("dominant_hz"), r.getAs[Double]("margin_db")))).toMap
    for (k <- 0 until 4) {
      assert(out(k)._1 === 220 + 110 * k, s"clip $k detected ${out(k)._1}")
      assert(out(k)._2 > 20.0, s"clip $k margin ${out(k)._2} dB too thin to trust")
    }
  }

  test("area downsample averages blocks; stride sample picks every Nth pixel") {
    import spark.implicits._
    val px = (for (y <- 0 until 4; x <- 0 until 4) yield (0, y, x, y * 4 + x))
      .toDF("img_id", "y", "x", "v")
    val area = Vision.downsampleArea(px, 2).collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(area((0, 0)) === (0 + 1 + 4 + 5) / 4.0)
    assert(area((1, 1)) === (10 + 11 + 14 + 15) / 4.0)
    val stride = Vision.strideSample(px, 2).collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r.getInt(3)).toMap
    assert(stride === Map((0, 0) -> 0, (0, 1) -> 2, (1, 0) -> 8, (1, 1) -> 10))
  }
}
