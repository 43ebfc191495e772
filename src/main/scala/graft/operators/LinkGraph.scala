package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics — PageRank as the crawl-quality prior (the
  * Common-Crawl-style host ranking every web-corpus curation uses to
  * pick what to keep): iterative sparse matrix-vector products
  * expressed as join + aggregate, the canonical "iterative algorithm on
  * a DataFrame engine" shape.
  *
  * INTEGER-SCALED arithmetic throughout (rank is a long, `scale` = one
  * unit of mass; floor division at both division points): float
  * PageRank would be bit-unstable across engines and partitionings,
  * this formulation is exactly replayable — the DuckDB oracle chains k
  * generated CTE rounds and must land on the identical longs (the
  * q105/q135 generated-chain pattern). The floor losses are bounded
  * (< outdeg per node per round, ~1e-4 of scale) and deterministic.
  *
  * Update rule per round, d = 0.85 in thousandths:
  *   r'(v) = (15·scale)/100  +  (850 · Σ_{u→v} r(u) div outdeg(u)) div 1000
  *
  * Scale (100 TB): the edge relation joins on `src` each round — ONE
  * hash partitioning that AQE reuses round over round; ranks are
  * |V|-sized (tiny next to |E|); contributions combine map-side before
  * the shuffle. Lineage is cut every 3 rounds (localCheckpoint — the
  * iterative-loop discipline, same as connectedComponents); the edge
  * relation with degrees is checkpointed ONCE and re-read each round
  * instead of re-deriving the degree aggregation k times.
  *
  * Dangling nodes (no out-edges) are NOT redistributed — callers whose
  * graphs have them should add self-loops first; [[pageRank]] only
  * guarantees rank conservation up to floor loss when every node has
  * an out-edge (the synthetic q165 graph does by construction).
  */
object LinkGraph {

  /** @param edges (src: long, dst: long) — parallel edges count twice
    * @return (v, r): every endpoint with its integer-scaled rank */
  def pageRank(edges: DataFrame, iters: Int,
               scale: Long = 1000000L): DataFrame = {
    require(iters >= 1, s"iters must be >= 1, got $iters")
    require(scale >= 1000L, s"scale must be >= 1000, got $scale")
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val e = edges.join(deg, "src").localCheckpoint()
    val nodes = edges.select(col("src").as("v"))
      .union(edges.select(col("dst").as("v")))
      .distinct().localCheckpoint()
    val base = scale * 15L / 100L
    var ranks = nodes.select(col("v"), lit(scale).as("r"))
    for (i <- 1 to iters) {
      val contribs = e.join(ranks, e("src") === ranks("v"))
        .select(col("dst").as("v"), expr("r div outdeg").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(contribs, Seq("v"), "left")
        .select(col("v"), (lit(base) +
          expr("(850 * coalesce(s, CAST(0 AS BIGINT))) div 1000")).as("r"))
      if (i % 3 == 0 || i == iters) ranks = ranks.localCheckpoint()
    }
    ranks
  }
}
