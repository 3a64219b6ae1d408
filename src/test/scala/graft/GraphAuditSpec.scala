package graft

import graft.graph.GraphAudit

class GraphAuditSpec extends SparkSpec {

  test("q230 emits one audit row per constructed relation, all key-deduplicated") {
    val rows = GraphAudit.q230GraphConstructionAudit(spark, sfDir())
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq(
      "module_edges", "module_nodes", "trade_edges",
      "trade_nodes", "trade_typed", "trade_undirected"))
    rows.foreach { r =>
      val (rel, n, k, fp) =
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(n > 0L, s"$rel empty")
      // every constructed relation is deduplicated on its natural key
      // (and for module_nodes this doubles as the xxhash64-id
      // uniqueness check): n_keys == n_rows
      assert(k == n, s"$rel has $n rows but $k distinct keys")
      // division form: FpMod * n wraps Long at n ≳ 9.2e9, so the
      // multiplied bound would spuriously fail in a scale harness
      // (ADVICE r10); fp/FpMod < n is the same bound without overflow
      assert(fp >= 0L && fp / GraphAudit.FpMod < n,
        s"$rel fingerprint $fp outside [0, mod·n)")
    }
  }
}
