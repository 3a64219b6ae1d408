package graft

import graft.sources.PackageJsonSource

class PackageJsonSourceSpec extends SparkSpec {

  private lazy val manifests =
    PackageJsonSource.read(spark, "src/test/resources/manifests.jsonl")

  test("manifest read applies the explicit schema (no inference)") {
    assert(manifests.schema == PackageJsonSource.manifestSchema)
    assert(manifests.count() == 4) // raw, includes the duplicate line
  }

  test("entities are deduplicated on natural keys (idempotent upsert)") {
    val e = PackageJsonSource.entities(manifests)
    assert(e.users.collect().map(_.getString(0)).sorted.toSeq == Seq("ada", "bob"))
    assert(e.repos.count() == 3)
    // alpha→beta, alpha→gamma, beta→gamma (DEP), alpha→testlib,
    // gamma→testlib (DEV), beta→alpha (PEER)
    assert(e.edges.count() == 6)
    val types = e.edges.groupBy("edge_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(types == Map("DEPENDS_ON" -> 3L, "DEV_DEPENDS_ON" -> 2L,
      "PEER_DEPENDS_ON" -> 1L))
    // module universe includes dep-only targets (testlib, no version)
    val mods = e.modules.collect().map(r => r.getString(0)).toSet
    assert(mods == Set("alpha", "beta", "gamma", "testlib"))
  }

  test("re-ingest of the same manifests changes nothing (idempotency)") {
    val once = PackageJsonSource.entities(manifests)
    val twice = PackageJsonSource.entities(manifests.union(manifests))
    assert(once.edges.count() == twice.edges.count())
    assert(once.modules.count() == twice.modules.count())
    assert(once.users.count() == twice.users.count())
  }

  test("OWNS edges link users to their repos") {
    val owns = PackageJsonSource.ownsEdges(manifests).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(owns == Set(("ada", "alpha"), ("ada", "gamma"), ("bob", "beta")))
  }
}
