package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** README↔registry sync gate (round-10, VERDICT item 8): the README's
  * generated query map must be EXACTLY the current render of
  * `SparkEntry.queries` — registering a query without rerunning
  * `sbt "Test/runMain graft.ReadmeGen"` goes red here, so the API map
  * can never silently rot. */
class ReadmeSyncSpec extends AnyFunSuite {

  test("README query map is the current render of SparkEntry.queries") {
    val readme = Files.readString(Paths.get("README.md"))
    val want = ReadmeGen.section()
    assert(readme.contains(ReadmeGen.begin), "README missing the query-map markers")
    assert(readme.contains(want),
      "README query map is stale — run: sbt \"Test/runMain graft.ReadmeGen\"")
  }

  test("every query family links an existing module file") {
    SparkEntry.queries.keys.foreach { q =>
      val (_, file) = ReadmeGen.familyOf(q)
      assert(new java.io.File(file).exists(), s"$q -> $file does not exist")
    }
  }
}
