package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-20 tripwire (VERDICT r19 item 6): the bench artifact now
  * carries `requery_confirmed` — queries whose OUTLIER requery (the
  * isolated post-suite re-measure) still landed >2x away from the
  * anchor, i.e. regressions the requery CONFIRMED rather than
  * explained as ambient burst. A committed anchor run must have none:
  * this turns the judge-side "requery confirmed it" forensics of
  * rounds 18-19 into a test failure at commit time. The spread field
  * ([min,max] per query) is deliberately NOT bounded here — quiet runs
  * measure ambient max/min bursts up to 6x with clean medians
  * (bench_r19_base: ellipse_best_candidate 6.02x), so a spread bound
  * would only make anchors flaky; the requery protocol is the
  * established separator of burst vs regression.
  *
  * The anchor constant must point at the round's committed
  * full-surface artifact (regenerate + update when committing a new
  * anchor). */
class BenchAnchorSpec extends AnyFunSuite {

  /** The round's committed full-suite anchor artifact. */
  private val AnchorPath = "bench_r20_final.json"

  /** Confirmed regressions allowed with a named cause (the
    * ProbeRegistrySpec exceptions contract); empty is the goal. */
  private val exceptions: Map[String, String] = Map.empty

  test("committed anchor has no requery-confirmed regressions") {
    val f = new java.io.File(AnchorPath)
    assert(f.exists(),
      s"$AnchorPath missing — commit the round's full-surface bench artifact")
    val txt = scala.io.Source.fromFile(f).mkString
    val field = """"requery_confirmed"\s*:\s*\[([^\]]*)\]""".r
      .findFirstMatchIn(txt)
    assert(field.isDefined,
      s"$AnchorPath lacks requery_confirmed — regenerate with the round-20 Bench")
    val confirmed = """"([A-Za-z0-9_]+)"""".r
      .findAllMatchIn(field.get.group(1)).map(_.group(1)).toSeq.sorted
    val unexplained = confirmed.filterNot(exceptions.contains)
    assert(unexplained.isEmpty,
      s"requery-CONFIRMED regressions in the committed anchor: $unexplained — " +
        "fix the plan or add a named exception with the measured cause")
  }

  test("anchor spread field is present and well-formed for every timed query") {
    val f = new java.io.File(AnchorPath)
    assert(f.exists(), s"$AnchorPath missing")
    val txt = scala.io.Source.fromFile(f).mkString
    val spread = """"spread"\s*:\s*\{(.*?)\}""".r.findFirstMatchIn(txt)
    assert(spread.isDefined, s"$AnchorPath lacks the spread field")
    val entries = """"([A-Za-z0-9_]+)"\s*:\s*\[(-?[0-9.]+),(-?[0-9.]+)\]""".r
      .findAllMatchIn(spread.get.group(1)).toSeq
    assert(entries.nonEmpty, "spread field parsed empty")
    entries.foreach { m =>
      val (q, lo, hi) = (m.group(1), m.group(2).toDouble, m.group(3).toDouble)
      assert(lo == -1.0 || lo <= hi, s"$q spread inverted: [$lo,$hi]")
    }
  }
}
