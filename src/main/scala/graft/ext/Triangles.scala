package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact triangle counting via degree-oriented wedge enumeration — the
  * graph-analytics primitive behind clustering coefficients, community
  * detection, and spam/bot detection over interaction graphs.
  *
  * Algorithm (the standard distributed "node-iterator++"):
  *  1. canonicalize the undirected edge set (drop self-loops, order
  *     endpoints, dedupe);
  *  2. orient every edge from its (degree, id)-smaller endpoint to the
  *     larger — a total order, so the oriented graph is acyclic;
  *  3. self-join oriented out-edges on their source to enumerate wedges:
  *     each triangle {a,b,c} produces EXACTLY ONE wedge, at its unique
  *     (degree, id)-minimum vertex, because only that vertex has oriented
  *     out-edges to both others;
  *  4. probe the wedge's closing pair against the canonical edge set.
  *
  * Why this survives 100 TB graphs: the wedge join is the cost driver,
  * and degree orientation bounds it — every vertex's ORIENTED out-degree
  * is O(sqrt(m)) on any graph (a vertex with oriented out-degree d has d
  * neighbors of degree ≥ d, so d² ≤ 2m), so a celebrity node with 10⁸
  * followers contributes sqrt-of-that wedges instead of 10¹⁶. The naive
  * adjacency self-join without orientation is quadratic in the max
  * degree and dies on exactly the graphs where triangle counts matter.
  * Three shuffles total (degree agg, wedge join, closing probe), each on
  * node/pair keys, all spillable sort-merge joins.
  */
object Triangles {

  /** Canonical undirected edge set: endpoints ordered u < v, self-loops
    * dropped, parallel edges deduplicated. Input columns: u, v.
    */
  def canonical(edges: DataFrame): DataFrame =
    edges
      .select(
        least(col("u"), col("v")).as("u"),
        greatest(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()

  /** Triangles as rows (x, u, v): x is the (degree, id)-minimum vertex,
    * (u, v) the closing edge in canonical order. Each triangle appears
    * exactly once.
    */
  def triangles(rawEdges: DataFrame): DataFrame = {
    val e = canonical(rawEdges).persist(StorageLevel.MEMORY_AND_DISK)
    val deg = e.select(col("u").as("node"))
      .unionByName(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select(col("node").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("node").as("v"), col("deg").as("dv")), Seq("v"))
    val uFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    val oriented = withDeg
      .select(
        when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val o1 = oriented.select(col("src"), col("dst").as("d1"))
    val o2 = oriented.select(col("src"), col("dst").as("d2"))
    // d1 < d2 keeps one of the two orderings of each out-neighbor pair
    // AND leaves (d1, d2) in the canonical u < v form the probe needs.
    val wedges = o1.join(o2, Seq("src"))
      .filter(col("d1") < col("d2"))
      .select(col("src").as("x"), col("d1").as("u"), col("d2").as("v"))
    // materialize the closing join, then release the cached inputs — the
    // PageRank discipline: a persist with no matching unpersist holds
    // CacheManager entries for the whole session (specs and bench rerun
    // this in one JVM)
    val out = wedges.join(e, Seq("u", "v"))
      .select(col("x"), col("u"), col("v"))
      .localCheckpoint(true)
    e.unpersist(false)
    oriented.unpersist(false)
    out
  }

  /** Per-node triangle participation counts (nodes in ≥1 triangle). */
  def perNodeCounts(rawEdges: DataFrame): DataFrame =
    triangles(rawEdges)
      .select(explode(array(col("x"), col("u"), col("v"))).as("node"))
      .groupBy("node")
      .agg(count(lit(1)).cast("long").as("n_triangles"))
}
