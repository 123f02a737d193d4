package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Motion
import graft.sources.Avi

/** S11 container leg: RIFF/AVI walk, raw-DIB bit-exact round-trip,
  * MJPEG decode, and the pixel relation feeding Motion.frameStats. */
class AviSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val h = 24; private val w = 32
  // moving bright square on a gradient background — deterministic
  private def frame(i: Int): Array[Int] = Array.tabulate(h * w) { pos =>
    val y = pos / w; val x = pos % w
    val inSquare = y >= 4 + i && y < 12 + i && x >= 6 + 2 * i && x < 14 + 2 * i
    if (inSquare) 220 else (x * 3 + y * 2) % 64 + 20
  }
  private val frames = (0 until 5).map(frame)

  test("raw-DIB AVI round-trips bit-exactly through parse") {
    val clip = Avi.parse(Avi.synthesize(frames, h, w))
    assert(clip.width === w && clip.height === h && clip.nFrames === 5)
    clip.frames.zipWithIndex.foreach { case (f, i) =>
      assert(f.frameIdx === i)
      assert(f.pixels.toSeq === frames(i).toSeq, s"frame $i differs")
    }
  }

  test("stride padding: widths not divisible by 4 round-trip") {
    val (h2, w2) = (5, 7)
    val odd = Seq(Array.tabulate(h2 * w2)(p => p * 7 % 256))
    val clip = Avi.parse(Avi.synthesize(odd, h2, w2))
    assert(clip.frames.head.pixels.toSeq === odd.head.toSeq)
  }

  test("MJPEG AVI decodes with the right shape and near-faithful content") {
    val clip = Avi.parse(Avi.synthesize(frames, h, w, mjpeg = true))
    assert(clip.width === w && clip.height === h && clip.nFrames === 5)
    // JPEG is lossy: bound mean abs error instead of exact equality
    clip.frames.zipWithIndex.foreach { case (f, i) =>
      val mae = f.pixels.zip(frames(i)).map { case (a, b) => math.abs(a - b) }.sum.toDouble / (h * w)
      assert(mae < 6.0, s"frame $i MAE=$mae")
    }
  }

  test("readPixels feeds Motion.frameStats identically to the direct frame relation") {
    val dir = Files.createTempDirectory("graft_avi_").toFile
    dir.deleteOnExit()
    Files.write(new java.io.File(dir, "clip0.avi").toPath, Avi.synthesize(frames, h, w))
    val px = Avi.readPixels(spark, dir.getAbsolutePath).localCheckpoint()
    assert(px.count() === 5L * h * w)
    // direct relation from the same arrays
    val rows = for (i <- frames.indices; y <- 0 until h; x <- 0 until w)
      yield (i, y, x, frames(i)(y * w + x))
    import spark.implicits._
    val direct = rows.toDF("frame_idx", "y", "x", "v")
    val viaAvi = Motion.frameStats(px.select("frame_idx", "y", "x", "v"))
      .orderBy("frame_idx").collect()
    val viaDirect = Motion.frameStats(direct).orderBy("frame_idx").collect()
    assert(viaAvi.toSeq === viaDirect.toSeq)
  }

  test("audio-first AVI: frames collect from the vids stream's index") {
    // video is stream 1 ('01db'), the auds strl comes first — both the
    // bitCount latch AND the frame collector must key on the vids
    // stream index, or this parses headers fine and returns zero frames
    val clip = Avi.parse(Avi.synthesize(frames, h, w, audioFirst = true))
    assert(clip.width === w && clip.height === h && clip.nFrames === 5)
    clip.frames.zipWithIndex.foreach { case (f, i) =>
      assert(f.pixels.toSeq === frames(i).toSeq, s"frame $i differs")
    }
  }

  test("two clips in one directory keep distinct video ids") {
    val dir = Files.createTempDirectory("graft_avi2_").toFile
    dir.deleteOnExit()
    Files.write(new java.io.File(dir, "a.avi").toPath, Avi.synthesize(frames.take(2), h, w))
    Files.write(new java.io.File(dir, "b.avi").toPath, Avi.synthesize(frames.take(3), h, w))
    val counts = Avi.readPixels(spark, dir.getAbsolutePath)
      .groupBy("video_id").agg(countDistinct("frame_idx").as("n"))
      .collect().map(r => r.getString(0).split("/").last -> r.getLong(1)).toMap
    assert(counts === Map("a.avi" -> 2L, "b.avi" -> 3L))
  }
}
