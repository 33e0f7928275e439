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

  test("O14 DOULION: exact/sampled totals and integer estimate equal a driver replay") {
    val nbrs = adj.view.mapValues(_.toSet).toMap
    // canonical edge list (src < dst) and its md5 coin
    val canon = adj.toSeq.flatMap { case (a, ns) =>
      ns.filter(_ > a).map(b => (a, b)) }.distinct
    def keep(e: (Long, Long)): Boolean = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"${e._1}:${e._2}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      hex.head <= '7'
    }
    // naive a<b<c enumeration over the given canonical edge set
    def triCount(edges: Seq[(Long, Long)]): Long = {
      val n = edges.flatMap(e => Seq(e, e.swap)).groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      val es = edges.toSet
      // .toSeq: yielding into the neighbor SET would collapse each
      // edge's triangles to at most one
      (for {
        (a, b) <- edges; c <- n.getOrElse(b, Set.empty[Long]).toSeq if b < c
        if es((a, c))
      } yield 1).size.toLong
    }
    val kept = canon.filter(keep)
    val exact = triCount(canon)
    val sampled = triCount(kept)
    val row = run("graph_triangles_sampled").collect().head
    assert(row.getAs[Long]("n_edges") == canon.size.toLong)
    assert(row.getAs[Long]("n_kept") == kept.size.toLong)
    assert(row.getAs[Long]("exact_triangles") == exact)
    assert(row.getAs[Long]("sampled_triangles") == sampled)
    // the 1/p^3 blow-up is the exact integer 8, and the error columns
    // are pure integer arithmetic (half-up micro-units)
    assert(row.getAs[Long]("estimated_triangles") == sampled * 8)
    val err = math.abs(sampled * 8 - exact)
    assert(row.getAs[Long]("abs_err") == err)
    if (exact > 0)
      assert(row.getAs[Long]("rel_err_micro") ==
        (err * 2000000L + exact) / (2 * exact))
    // the coin is a real coin: the sparsified graph is a strict,
    // non-empty subset at this SF
    assert(kept.nonEmpty && kept.size < canon.size)
    // param twin (minSupport=2): internal arithmetic holds
    val p = run("param_graph_triangles_sampled").collect().head
    assert(p.getAs[Long]("n_kept") <= p.getAs[Long]("n_edges"))
    assert(p.getAs[Long]("estimated_triangles") ==
      p.getAs[Long]("sampled_triangles") * 8)
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

  test("O11 closeness equals a per-seed labeled BFS replayed on the driver") {
    val seeds = Tables.part(spark, sf)
      .filter(col("p_brand") === "Brand#1")
      .select(col("p_partkey")).collect().map(_.getLong(0))
      .filter(adj.contains).sorted.take(8)
    val expected = seeds.toSeq.map { s =>
      var visited = Map(s -> 0)
      var frontier = Set(s)
      for (h <- 1 to 3) {
        val next = frontier.flatMap(adj(_)).diff(visited.keySet)
        visited ++= next.map(_ -> h)
        frontier = next
      }
      val byHop = visited.values.groupBy(identity).view.mapValues(_.size).toMap
      // same left-fold shape as the engine: (n1/1 + n2/2) + n3/3
      val harm = (1 to 3).map(k => byHop.getOrElse(k, 0).toDouble / k).sum
      (s, (visited.size - 1).toLong,
        BigDecimal(harm).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.filter(_._2 > 0).sortBy(_._1)
    val got = run("graph_closeness").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got == expected)
  }

  test("O13 betweenness equals the fixed-point Brandes replay on the driver") {
    val seeds = Tables.part(spark, sf)
      .filter(col("p_brand") === "Brand#1")
      .select(col("p_partkey")).collect().map(_.getLong(0))
      .filter(adj.contains).sorted.take(8)
    val Scale = 1000000000L
    val maxHops = 3
    val deltaTot = scala.collection.mutable.Map[Long, Long]()
    val seedsBy = scala.collection.mutable.Map[Long, Set[Long]]()
    seeds.foreach { s =>
      // forward BFS with exact shortest-path counts
      var dist = Map(s -> 0)
      var sigma = Map(s -> 1L)
      var frontier = Seq(s)
      for (h <- 1 to maxHops) {
        val nxt = scala.collection.mutable.Map[Long, Long]()
        frontier.foreach { u =>
          adj(u).foreach { v =>
            if (!dist.contains(v)) nxt(v) = nxt.getOrElse(v, 0L) + sigma(u)
          }
        }
        dist ++= nxt.keys.map(_ -> h)
        sigma ++= nxt
        frontier = nxt.keys.toSeq
      }
      // backward fixed-point dependency accumulation (integer div —
      // the engine's exact recurrence, including the floor)
      var delta = Map[Long, Long]().withDefaultValue(0L)
      for (h <- (maxHops - 1) to 1 by -1) {
        val dH = scala.collection.mutable.Map[Long, Long]()
        dist.filter(_._2 == h).keys.foreach { v =>
          adj(v).foreach { w =>
            if (dist.get(w).contains(h + 1))
              dH(v) = dH.getOrElse(v, 0L) +
                (sigma(v) * (Scale + delta(w))) / sigma(w)
          }
        }
        dH.foreach { case (v, d) =>
          deltaTot(v) = deltaTot.getOrElse(v, 0L) + d
          seedsBy(v) = seedsBy.getOrElse(v, Set.empty) + s
        }
        delta = Map[Long, Long]().withDefaultValue(0L) ++ dH
      }
    }
    val expected = deltaTot.toSeq.map { case (n, d) =>
      (n, seedsBy(n).size.toLong, d,
        BigDecimal(d.toDouble / Scale.toDouble)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.sortBy(t => (-t._3, t._1)).take(100)
    val got = run("graph_betweenness").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSeq
    assert(got == expected)
    assert(got.nonEmpty && got.head._3 > 0L)
  }

  test("O12 HyperBall: sketch ball sizes band-track the exact BFS, serve anchors to O11") {
    val served = run("graph_closeness_hyperball").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getBoolean(3))).toSeq
    // the hash-anchored columns ARE O11's exact answers
    val o11 = run("graph_closeness").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(served.map(t => (t._1, t._2, t._3)) == o11)
    assert(served.forall(_._4), "a sketch ball left the ±15%+1 band")
    // band-check the raw estimates against the exact driver BFS balls
    val visited = operators.Graph.closenessVisited(spark, sf, "Brand#1",
      8, 1, 3)
    val exact = visited.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
      .groupBy(_._1).view.mapValues { rows =>
        (1 to 3).map(t => rows.count(_._3 <= t).toLong)
      }.toMap
    val ests = operators.Graph.hyperballSeedEsts(spark, sf, visited,
      "Brand#1", 8, 1, 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2).toDouble))
    assert(ests.length == exact.size * 3)
    ests.foreach { case (seed, t, est) =>
      val ex = exact(seed)(t - 1)
      assert(math.abs(est - ex) <= ex * 0.15 + 1.0,
        s"seed $seed radius $t: est $est vs exact $ex")
    }
    // estimates are monotone in the radius (balls only grow)
    ests.groupBy(_._1).values.foreach { rs =>
      val byT = rs.sortBy(_._2).map(_._3)
      assert(byT.zip(byT.drop(1)).forall { case (a, b) => b >= a })
    }
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

  test("O10 LPA communities equal 3 synchronous mode rounds on the driver") {
    // minSupport=2 undirected graph, same derivation as the O4 replay
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val canon = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val und = canon ++ canon.map(e => (e._2, e._1))
    val nodes = und.map(_._1).distinct
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 1 to 3) {
      val counts = scala.collection.mutable
        .Map[(Long, Long), Long]().withDefaultValue(0L)
      for ((s, d) <- und) counts((d, lab(s))) += 1
      lab = counts.groupBy(_._1._1).map { case (n, m) =>
        n -> m.toSeq.map { case ((_, l), c) => (c, l) }
          .sortBy { case (c, l) => (-c, l) }.head._2
      }
    }
    val want = lab.toSeq.groupBy(_._2).map { case (community, ns) =>
      (community, ns.size.toLong, ns.map(_._1).sum)
    }.toSeq.sortBy(c => (-c._2, c._1)).take(50)
    val got = run("graph_communities_lpa").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
  }

  test("O5 personalized pagerank equals the seeded recurrence on the driver") {
    val scale = 1000000000L
    val seeds = Tables.part(spark, sf)
      .filter(col("p_brand") === "Brand#1")
      .select(col("p_partkey")).collect().map(_.getLong(0))
      .filter(adj.contains).toSet
    var rank: Map[Long, Long] = adj.map { case (n, _) =>
      n -> (if (seeds(n)) scale else 0L) }
    for (_ <- 1 to 5) {
      val contrib = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
      for ((u, ns) <- adj; v <- ns) contrib(v) += rank(u) / ns.length
      rank = adj.map { case (n, _) =>
        n -> ((if (seeds(n)) 15L * scale / 100 else 0L) + 85L * contrib(n) / 100)
      }
    }
    val expected = rank.toSeq.filter(_._2 > 0)
      .sortBy { case (n, r) => (-r, n) }.take(100)
    val got = run("graph_ppr").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    // personalization law: seeded mass concentrates — every seed with
    // a self-loop-free neighborhood still holds its teleport floor
    val gotMap = rank.filter(_._2 > 0)
    assert(seeds.forall(s => gotMap.getOrElse(s, 0L) >= 15L * scale / 100))
  }

  test("O6 clustering coefficient equals the naive ratio on the driver") {
    val nbrs = adj.view.mapValues(_.toSet).toMap
    val naive = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for ((a, ns) <- adj; b <- ns if a < b; c <- nbrs(b) if b < c
         if nbrs(a).contains(c)) {
      naive(a) += 1; naive(b) += 1; naive(c) += 1
    }
    val expected = adj.collect { case (n, ns) if ns.length >= 2 && naive(n) > 0 =>
      (n, ns.length.toLong, naive(n),
        2.0 * naive(n) / (ns.length.toLong * (ns.length - 1)))
    }.toSeq.sortBy { case (n, _, _, cc) => (-cc, n) }.take(100)
    val got = run("graph_clustering_coef").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == expected)
    // a coefficient is a ratio of realized to possible wedge closures
    assert(got.forall { case (_, _, _, cc) => cc > 0.0 && cc <= 1.0 })
  }

  test("O7 link prediction equals the capped Adamic-Adar replay on the driver") {
    // minSupport=2 adjacency (O7's default graph)
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val canon = items.groupBy(_._1).values.flatMap { basket =>
      val ps = basket.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.size >= 2).keys.toSet
    val adj2 = (canon.toSeq ++ canon.toSeq.map(p => (p._2, p._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted).toMap
    val acc = scala.collection.mutable.Map[(Long, Long), (Long, Long)]()
      .withDefaultValue((0L, 0L))
    for ((w, ns) <- adj2 if ns.size <= 64) {
      val wAa = math.round(1e9 / math.log(ns.size.toDouble))
      for (i <- ns.indices; j <- (i + 1) until ns.length) {
        val k = (ns(i), ns(j))
        val (cn, aa) = acc(k)
        acc(k) = (cn + 1, aa + wAa)
      }
    }
    val expected = acc.toSeq.filterNot { case (k, _) => canon(k) }
      .map { case ((u, v), (cn, aa)) => (u, v, cn, aa) }
      .sortBy { case (u, v, _, aa) => (-aa, u, v) }.take(100)
    val got = run("graph_link_prediction").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // predicted links are non-edges by construction
    assert(got.forall { case (u, v, _, _) => !canon((u, v)) && u < v })
  }

  test("O8 degree distribution: histogram, CCDF and alpha match a driver replay") {
    val deg = adj.view.mapValues(_.size.toLong).toMap
    val hist = deg.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val total = deg.size.toLong
    def r9(x: Double) = BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    val tail = hist.filter(_._1 >= 2L)
    val nTail = tail.values.sum
    val logsum = tail.map { case (d, n) =>
      r9(math.log(d.toDouble / 1.5)) * BigDecimal(n) }.sum
    val alpha = 1.0 + nTail.toDouble / logsum.toDouble
    val expected = hist.keys.toSeq.sorted.map { d =>
      val nGeq = hist.filter(_._1 >= d).values.sum
      (d, hist(d), nGeq.toDouble / total.toDouble, nTail, alpha)
    }
    val got = run("graph_degree_dist").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3),
        r.getDouble(4))).toSeq
    assert(got == expected)
    // CCDF laws: exactly 1 at the min degree, monotone decreasing after
    assert(got.head._3 == 1.0)
    assert(got.map(_._3).reverse == got.map(_._3).reverse.sorted)
    // a co-purchase graph is right-skewed: alpha must be a sane tail exponent
    assert(alpha > 1.0 && alpha < 10.0)
  }

  test("O9 kcore equals driver peeling run to TRUE convergence") {
    // default graph (minSupport=1), peeled at k=3 until the fixed
    // point — proving the served 8 fixed rounds suffice
    var alive: Map[Long, Set[Long]] =
      adj.view.mapValues(_.toSet).toMap
    var changed = true
    var nRounds = 0
    while (changed) {
      val keep = alive.filter(_._2.size >= 3).keySet
      val next = alive.collect { case (n, ns) if keep(n) =>
        n -> ns.intersect(keep) }.filter(_._2.nonEmpty)
      changed = next != alive
      alive = next
      nRounds += 1
    }
    assert(nRounds <= 8, s"peeling took $nRounds rounds > the 8 served")
    val expected = alive.map { case (n, ns) => (n, ns.size.toLong) }
      .toSeq.sortBy { case (n, d) => (-d, n) }.take(100)
    val got = run("graph_kcore").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == expected)
    assert(expected.nonEmpty, "degenerate fixture: empty 3-core")
    // the defining k-core invariant: every survivor keeps >= k in-core
    // neighbors
    assert(got.forall(_._2 >= 3L))
  }

  test("param variants return non-degenerate results") {
    assert(run("param_graph_pagerank").count() > 0)
    assert(run("param_graph_bfs").count() > 0)
    assert(run("param_graph_ppr").count() > 0)
    assert(run("param_graph_clustering_coef").count() > 0)
    assert(run("param_graph_link_prediction").count() > 0)
    assert(run("param_graph_kcore").count() > 0)
  }

  test("O15 effective diameter equals the threshold law over the exact BFS") {
    val got = run("graph_eff_diameter").collect().map { r =>
      (r.getAs[Int]("t"), r.getAs[Long]("n_pairs"),
        r.getAs[Double]("frac"), r.getAs[Boolean]("is_effective_diameter"),
        r.getAs[Boolean]("sketch_in_band"))
    }.sortBy(_._1).toSeq
    // replay the neighborhood function from the shared memoized BFS
    val visited = operators.Graph.closenessVisited(
      spark, sf, "Brand#1", 8, 1, 3).collect()
    val nPairs = (1 to 3).map(t => t -> visited.count(_.getInt(2) <= t).toLong)
    val total = nPairs.last._2
    assert(got.map(g => (g._1, g._2)) == nPairs)
    // the integer threshold law picks the minimum qualifying radius
    val effT = nPairs.collectFirst {
      case (t, n) if n * 10000L >= 9000L * total => t }
    assert(got.count(_._4) == (if (effT.isEmpty) 0 else 1))
    for ((t, _, frac, isEff, _) <- got) {
      assert(isEff == effT.contains(t))
      assert(frac == BigDecimal(nPairs(t - 1)._2.toDouble / total)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    // the sketch route would have agreed (the O12 band over every seed)
    assert(got.forall(_._5), "HyperBall estimate left the ±15%+1 band")
  }
}
