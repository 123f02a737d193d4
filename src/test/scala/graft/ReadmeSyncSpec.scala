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

  test("registry tags name only registered queries and keep their contracts") {
    val names = SparkEntry.queries.keySet
    (SparkEntry.auditQueries ++ SparkEntry.buildQueries).foreach { q =>
      assert(names.contains(q), s"tagged query $q is not in the registry")
    }
    assert((SparkEntry.auditQueries & SparkEntry.buildQueries).isEmpty,
      "a query cannot be both audit and build")
    // every audit rung keeps its oracle (that's what it is FOR): the
    // exact rung exists to make approximate siblings' recall a
    // measurable quantity, so it must itself sit on the hash gate
    SparkEntry.auditQueries.foreach { q =>
      assert(SparkEntry.oracleSql.contains(q), s"audit rung $q lost its oracle")
    }
    // the production profile is the overwhelming majority of the surface
    val prod = names.count(SparkEntry.queryTag(_) == "production")
    assert(prod >= names.size - 10, s"only $prod/${names.size} production-tagged")
  }

  test("every query family links an existing module file") {
    SparkEntry.queries.keys.foreach { q =>
      val (_, file) = ReadmeGen.familyOf(q)
      assert(new java.io.File(file).exists(), s"$q -> $file does not exist")
    }
  }
}
