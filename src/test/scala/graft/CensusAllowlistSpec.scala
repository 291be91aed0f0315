package graft

import org.scalatest.funsuite.AnyFunSuite

/** Automated census health check (r15 verdict #6). The committed rule —
  * "a NEW name in bench_full.json's ≥0.45 s census without an explanation is
  * the regression signal" — was executed by a judge reading SCALE.md until
  * now. This spec mechanizes it against the COMMITTED artifacts: every name
  * in bench_full.json's census block must appear in docs/census_allowlist.txt
  * (whose entries each point at their SCALE.md floor/pricing/shape
  * explanation), and every allowlisted name must still be a registered query
  * (a typo or a renamed query would silently stop matching — the allowlist
  * would rot into always-green). Bench itself also emits the newcomer diff
  * live as `census_new`, so a fresh window flags regressions before the
  * commit ever happens. No Spark session needed: the query registry is
  * static and the artifacts are plain files. */
class CensusAllowlistSpec extends AnyFunSuite {

  private def repoFile(parts: String*): java.nio.file.Path =
    java.nio.file.Paths.get(sys.props("user.dir"), parts: _*)

  private def allowlist(): Set[String] = {
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.readAllLines(repoFile("docs", "census_allowlist.txt"))
      .asScala.map(_.takeWhile(_ != '#').trim).filter(_.nonEmpty).toSet
  }

  test("committed census names are all allowlisted (explained in SCALE.md)") {
    val bench = repoFile("bench_full.json")
    assume(java.nio.file.Files.isRegularFile(bench),
      "no committed bench_full.json — nothing to gate")
    val txt = java.nio.file.Files.readString(bench)
    // census entries are the only place this key-shape occurs in the artifact
    val censusNames =
      """"(q_[a-z0-9_]+)":\{"jobs"""".r.findAllMatchIn(txt).map(_.group(1)).toSet
    val newcomers = censusNames -- allowlist()
    assert(newcomers.isEmpty,
      s"census names without a committed explanation: ${newcomers.toSeq.sorted
        .mkString(", ")} — write the floor/pricing/shape explanation into " +
        "docs/SCALE.md first, then add the name to docs/census_allowlist.txt")
  }

  test("allowlist names are all registered queries (no typos, no rot)") {
    val stale = allowlist() -- SparkEntry.queries.keySet
    assert(stale.isEmpty,
      s"allowlisted names not in the query registry: ${stale.toSeq.sorted
        .mkString(", ")} — remove or fix them, or the health check silently " +
        "stops covering those queries")
  }
}
