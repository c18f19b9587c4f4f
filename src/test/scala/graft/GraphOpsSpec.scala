package graft

import org.apache.spark.sql.functions._
import graft.operators.GraphOps

/** PageRank: agreement with a local power-iteration replay on a known
  * graph, dangling-mass redistribution, rank-mass conservation, and
  * edge hygiene (duplicates/self-loops dropped).
  */
class GraphOpsSpec extends SparkSpec {

  private def edgesDf(rows: Seq[(Long, Long)]) =
    spark.createDataFrame(rows).toDF("src", "dst")

  /** Local PageRank replay with the operator's exact semantics. */
  private def localPr(edges: Seq[(Long, Long)], iters: Int,
      d: Double): Map[Long, Double] = {
    val e = edges.filter(t => t._1 != t._2).distinct
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct.sorted
    val n = nodes.size.toDouble
    val odeg = e.groupBy(_._1).view.mapValues(_.size.toDouble).toMap
    var pr = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dang = nodes.filterNot(odeg.contains).map(pr).sum
      val contrib = e.groupBy(_._2).view.mapValues(
        _.map(t => pr(t._1) / odeg(t._1)).sum).toMap
      pr = nodes.map(v => v ->
        ((1.0 - d) / n + d * (contrib.getOrElse(v, 0.0) + dang / n))).toMap
    }
    pr
  }

  test("pageRank matches a local power-iteration replay on BOTH paths") {
    // 4 nodes; node 3 is dangling (no out-edges). maxDriverNodes = 0
    // forces the distributed fallback; default takes the driver path.
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (1L, 3L))
    val want = localPr(edges, 5, 0.85)
    for (gate <- Seq(1 << 20, 0)) {
      val got = GraphOps.pageRank(edgesDf(edges), "src", "dst",
          iters = 5, damping = 0.85, maxDriverNodes = gate)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(got.keySet == want.keySet, s"gate=$gate")
      got.foreach { case (v, p) =>
        assert(math.abs(p - want(v)) < 1e-12, s"gate=$gate node $v: $p vs ${want(v)}") }
    }
  }

  test("pageRank conserves total rank mass with dangling nodes") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)) // 3 is dangling
    val prs = GraphOps.pageRank(edgesDf(edges), "src", "dst", iters = 8)
      .collect().map(_.getDouble(1))
    assert(math.abs(prs.sum - 1.0) < 1e-9, s"sum=${prs.sum}")
    assert(prs.forall(_ > 0.0))
  }

  test("pageRank drops duplicate edges and self-loops") {
    val dirty = Seq((0L, 1L), (0L, 1L), (0L, 0L), (1L, 0L))
    val clean = Seq((0L, 1L), (1L, 0L))
    val a = GraphOps.pageRank(edgesDf(dirty), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = GraphOps.pageRank(edgesDf(clean), "src", "dst", iters = 3)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a == b)
    // symmetric 2-cycle → uniform ranks
    assert(math.abs(a(0L) - 0.5) < 1e-12 && math.abs(a(1L) - 0.5) < 1e-12)
  }

  test("pageRank is invariant to input partitioning") {
    val edges = (0L until 60L).map(i => (i % 12, (i * 7 + 3) % 12))
    def run(parts: Int) =
      GraphOps.pageRank(edgesDf(edges).repartition(parts), "src", "dst",
          iters = 4, maxDriverNodes = 0) // distributed path
        .collect().map(r => r.getLong(0) -> math.round(r.getDouble(1) * 1e9))
        .toMap
    assert(run(1) == run(13))
  }

  test("pageRank with iters=0 returns the uniform start vector") {
    val out = GraphOps.pageRank(edgesDf(Seq((0L, 1L), (1L, 2L))), "src",
        "dst", iters = 0)
      .collect().map(_.getDouble(1))
    assert(out.length == 3 && out.forall(p => math.abs(p - 1.0 / 3) < 1e-15))
  }
}
