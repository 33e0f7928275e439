package graft

import org.apache.spark.sql.functions._

/** O-family graph analytics: every operator is replayed on the driver
  * from the raw edge list at sf0.001 — the specs re-derive PageRank's
  * integer recurrence, the naive triangle enumeration, and BFS levels
  * with plain Scala collections and demand exact equality, so the
  * distributed degree-oriented / Pregel-style implementations can't
  * drift from the textbook definitions. */
class GraphSpec extends SparkSpecBase {

  /** Undirected adjacency (both directions) of the minSupport=1
    * co-purchase graph, pulled once for driver replays. */
  private lazy val adj: Map[Long, Seq[Long]] = {
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val pairs = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.toSeq.distinct
    (pairs ++ pairs.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
  }

  test("O1 pagerank equals the integer recurrence replayed on the driver") {
    val scale = 1000000000L
    var rank: Map[Long, Long] = adj.map { case (n, _) => n -> scale }
    for (_ <- 1 to 5) {
      val contrib = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((u, ns) <- adj; v <- ns) contrib(v) += rank(u) / ns.length
      rank = adj.map { case (n, _) =>
        n -> (15L * scale / 100 + 85L * contrib(n) / 100)
      }
    }
    val expected = rank.toSeq.sortBy { case (n, r) => (-r, n) }.take(100)
    val got = run("graph_pagerank").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("O2 oriented triangle counts equal the naive per-node enumeration") {
    val nbrs = adj.view.mapValues(_.toSet).toMap
    val naive = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((a, ns) <- adj; b <- ns if a < b; c <- nbrs(b) if b < c
         if nbrs(a).contains(c)) {
      naive(a) += 1; naive(b) += 1; naive(c) += 1
    }
    val expected = naive.toSeq.sortBy { case (n, t) => (-t, n) }.take(100)
    val got = run("graph_triangles").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
  }

  test("O2 plan: no cartesian product — closure is an equi join") {
    val nodes = flattenPlan(executedPlan(run("graph_triangles")))
    assert(!nodes.exists(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec]))
  }

  test("O3 bfs levels equal a driver-side frontier walk (min-hop law)") {
    val seeds = Tables.part(spark, sf)
      .filter(col("p_brand") === "Brand#1")
      .select(col("p_partkey")).collect().map(_.getLong(0))
      .filter(adj.contains).toSet
    var visited = seeds.map(_ -> 0).toMap
    var frontier = seeds
    for (h <- 1 to 3) {
      val next = frontier.flatMap(adj(_)).diff(visited.keySet)
      visited ++= next.map(_ -> h)
      frontier = next
    }
    val expected = visited.groupBy(_._2).map { case (h, m) =>
      (h, m.size.toLong, m.keys.sum)
    }.toSeq.sortBy(_._1)
    val got = run("graph_bfs").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // each BFS level is strictly new nodes: hop sets are disjoint by
    // construction, so total across levels ≤ graph size
    assert(got.map(_._2).sum <= adj.size)
  }

  test("O4 components equal driver union-find (the 10 rounds truly converge)") {
    // union-find ground truth over the minSupport=2 graph
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val edges = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) => parent(find(a)) = find(b) }
    val comps = parent.keys.toSeq.groupBy(find)
    // the served component of a node set is its MIN id (min-label fp)
    val want = comps.map { case (_, ns) => (ns.min, ns.size.toLong, ns.sum) }
      .toSeq.sortBy(c => (-c._2, c._1)).take(50)
    val got = run("graph_components").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("param variants return non-degenerate results") {
    assert(run("param_graph_pagerank").count() > 0)
    assert(run("param_graph_bfs").count() > 0)
  }
}
