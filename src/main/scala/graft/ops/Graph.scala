package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge DataFrames.
  *
  * The reference app has no graph surface; this extends the engine the
  * way a training-data/feature pipeline needs it (co-occurrence
  * projections, triangle-based clustering-coefficient features,
  * dedup-cluster quality checks). Everything is declarative joins —
  * no driver-side adjacency, no cartesian products.
  *
  * Scale design: triangle counting uses the classic degree-ordered
  * orientation (Suri & Vassilvitskii, "Counting Triangles and the
  * Curse of the Last Reducer", WWW'11): each undirected edge is
  * directed from its lower-(degree, id) endpoint to the higher one,
  * so every wedge is generated at its lowest-degree vertex. Wedge
  * count drops from Σ deg² to O(m^1.5) on skewed graphs — the hub
  * that would explode a naive self-join generates nothing.
  */
object Graph {

  /** Canonical undirected edge set: (a<b), deduped, self-loops dropped.
    * Input columns `a`, `b` (long). */
  def canonicalEdges(pairs: DataFrame): DataFrame =
    pairs.filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()

  /** Bipartite projection: rows (item, member) → edges between items
    * sharing a member. Per-member fan-out is C(k,2); callers bound k
    * upstream (cap or filter hot members) the same way the LSH path
    * caps hot buckets — this does NOT cap, it trusts its input. */
  def projectByMember(df: DataFrame, itemCol: String, memberCol: String): DataFrame = {
    val l = df.select(col(memberCol).as("m"), col(itemCol).as("a")).distinct()
    val r = df.select(col(memberCol).as("m"), col(itemCol).as("b")).distinct()
    canonicalEdges(l.join(r, "m").filter(col("a") < col("b")).select("a", "b"))
  }

  /** Per-vertex triangle count over canonical edges (cols a<b).
    *
    * 1. degree per vertex;
    * 2. orient each edge low→high by (degree, id) — total order, so
    *    each triangle has exactly one "pivot" (its lowest vertex)
    *    generating exactly one wedge that closes;
    * 3. wedges = oriented ⋈ oriented on src;
    * 4. close wedges against the oriented edge set;
    * 5. explode each triangle to its three corners and count.
    *
    * Every join is an equi-join on vertex ids (shuffle-partitioned by
    * key); the degree table joins are fine broadcast at dim scale and
    * shuffle at web scale — left to Catalyst/AQE.
    */
  def triangleCounts(edges: DataFrame): DataFrame =
    // r20: the edge relation is consumed three times (both degree-count
    // arms + the orientation join) and the ORIENTED relation three more
    // (both wedge arms + the closing set); a caller passing a derived
    // edge list (e.g. the co-purchase projection's self-join+distinct)
    // re-executed that whole subtree per consumer — the before-plan hit
    // 156 Exchanges. Cache both once for the single materializing run
    // (the scoped Materialize lifecycle, nothing left pinned after).
    graft.core.Materialize.withCached2(edges) { e =>
      val deg = e.select(col("a").as("v")).unionAll(e.select(col("b").as("v")))
        .groupBy("v").agg(count(lit(1)).as("deg"))
      // orient by (deg, id): src = the smaller endpoint in that order
      val withDeg = e
        .join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
      withDeg.select(
        when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst"))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
    } { (_, oriented) =>
      // wedges at the pivot: two out-edges of one src; order endpoints
      // to generate each unordered wedge once
      val o2 = oriented.select(col("src").as("src2"), col("dst").as("dst2"))
      val wedges = oriented.join(o2, col("src") === col("src2"))
        .filter(col("dst") < col("dst2"))
        .select(col("src").as("pivot"), col("dst").as("u"), col("dst2").as("w"))
      // close: the (u,w) leg must exist as an oriented edge in EITHER
      // direction (orientation of the closing edge is independent)
      val closing = oriented.select(
          least(col("src"), col("dst")).as("cu"), greatest(col("src"), col("dst")).as("cw"))
        .distinct()
      // wedges already carry u < w (dst < dst2 filter), so the probe is
      // a plain two-key equi-join
      val tris = wedges.join(closing, col("u") === col("cu") && col("w") === col("cw"))
        .select("pivot", "u", "w")
      tris.select(explode(array(col("pivot"), col("u"), col("w"))).as("v"))
        .groupBy("v").agg(count(lit(1)).as("n_triangles"))
    }

  /** Bounded-depth BFS levels from a seed set over canonical edges
    * (cols a<b): level(v) = min #hops from any seed, capped at
    * `depth`. Each round expands ONLY the current frontier (nodes
    * whose settled level is the previous round's) through one
    * equi-join on the vertex key, then min-folds — so round d
    * shuffles O(|frontier_d| · avg-degree) rows, never the whole
    * reach set, and a bounded depth means a bounded plan (no
    * iterate-to-fixpoint driver loop; for unbounded closure the
    * pointer-doubling in Hierarchy/dupClusters is the right tool).
    * `seeds` needs a `v` column; seeds not in the edge set keep
    * level 0. Output: (v, lvl). */
  def bfsLevels(edges: DataFrame, seeds: DataFrame, depth: Int): DataFrame = {
    require(depth >= 1, s"bfsLevels: depth must be >= 1, got $depth")
    // Deliberately lazy with a re-derived adjacency per round: an r20
    // experiment that cached the adjacency (persist + drained) read
    // 1.6x SLOWER at bench scale — the persist/checkpoint barriers
    // cost more than the lazy pyramid's redundant subtrees, which run
    // in parallel branches of one job. At true scale a caller looping
    // deeper than a few rounds should hand in a MATERIALIZED edge
    // list; the operator's own contract is bounded depth (unbounded
    // closure belongs to the pointer-doubling in Hierarchy/dupClusters).
    val und = edges.select(col("a").as("x"), col("b").as("y"))
      .unionAll(edges.select(col("b").as("x"), col("a").as("y")))
    var levels = seeds.select(col("v"), lit(0L).as("lvl"))
    for (d <- 1 to depth) {
      val next = levels.filter(col("lvl") === (d - 1).toLong)
        .join(und, col("v") === col("x"))
        .select(col("y").as("v"), lit(d.toLong).as("lvl"))
      levels = levels.unionByName(next)
        .groupBy("v").agg(min(col("lvl")).as("lvl"))
    }
    levels
  }
}
