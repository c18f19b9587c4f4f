package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics for crawl corpora. PageRank complements the
  * connected-components machinery in [[TextDedup]]: components answer
  * "which pages are the same" (dedup clusters), PageRank answers
  * "which hosts matter" — the standard crawl-frontier prioritization
  * and per-domain quality prior for training-data selection
  * (page-level quality ∝ host rank is a common CommonCrawl heuristic).
  */
object GraphOps {

  /** PageRank (Page/Brin/Motwani/Winograd 1999) with `iters` fixed
    * power iterations and damping `d`:
    * `pr'(v) = (1−d)/n + d·(Σ_{u→v} pr(u)/odeg(u) + dangling/n)`,
    * where `dangling` is the rank mass sitting on nodes with no
    * out-edges (redistributed uniformly — the standard correction that
    * keeps Σpr = 1). Ranks start uniform at 1/n; nodes = src ∪ dst.
    * Duplicate and self-loop edges are dropped.
    *
    * Scale shape: this is the classic iterative-join PageRank — each
    * iteration is ONE edges⋈ranks equi-join on src plus ONE keyed sum
    * per dst, so per-iteration cost is ∝ |E| with both shuffles on the
    * node key (co-partitioned across iterations; AQE reuses the
    * exchange layout). The per-iteration dangling mass and node count
    * are single-row aggregates broadcast into the projection — no
    * driver loop over nodes, nothing collected. `iters` is unrolled
    * into the plan: keep it small-ish (5–20); at 100 TB production
    * scale you would checkpoint `ranks` every few iterations to
    * truncate lineage — the loop body is already structured per
    * iteration, so that is one `persist()` away and changes no
    * numbers.
    *
    * Output: (node, pr) with Σpr = 1 up to float association.
    */
  def pageRank(
      edges: DataFrame,     // (srcCol, dstCol, ...)
      srcCol: String,
      dstCol: String,
      iters: Int = 5,
      damping: Double = 0.85): DataFrame = {
    require(iters >= 0, "pageRank needs iters >= 0")
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .distinct()
      .cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val nRow = nodes.agg(count(lit(1)).cast("double").as("__n"))
    // odeg is null exactly on dangling nodes (no out-edges)
    val deg = nodes
      .join(e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).cast("double").as("__odeg")), Seq("node"), "left")
      .cache()
    var ranks = deg.crossJoin(broadcast(nRow))
      .select(col("node"), col("__odeg"), (lit(1.0) / col("__n")).as("pr"))
    for (_ <- 1 to iters) {
      val dang = ranks.filter(col("__odeg").isNull)
        .agg(coalesce(sum("pr"), lit(0.0)).as("__dang"))
      val contrib = e
        .join(ranks.select(col("node").as("src"),
          (col("pr") / col("__odeg")).as("__c")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum("__c").as("__contrib"))
      ranks = deg
        .join(contrib, Seq("node"), "left")
        .crossJoin(broadcast(nRow)).crossJoin(broadcast(dang))
        .select(col("node"), col("__odeg"),
          ((lit(1.0) - lit(damping)) / col("__n") + lit(damping) *
            (coalesce(col("__contrib"), lit(0.0)) + col("__dang") / col("__n")))
            .as("pr"))
    }
    ranks.select(col("node"), col("pr"))
  }
}
