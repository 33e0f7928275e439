package graft

import org.apache.spark.sql.functions._

class AnalyticsSpec extends SparkSpecBase {

  test("k35 migration matrix: totals reconcile, marginals match the period counts") {
    val rows = run("k35_segment_migration").collect()
      .map(r => (r.getAs[String]("segment_from"),
        r.getAs[String]("segment_to"), r.getAs[Long]("n_customers")))
    assert(rows.nonEmpty)
    // labels are RFM triples or the two explicit marginals; a customer
    // with >=1 order can never be absent from both periods
    val segRe = "^[1-4]-[1-4]-[1-4]$".r
    rows.foreach { case (f, t, n) =>
      assert(f == "NEW" || segRe.findFirstIn(f).isDefined)
      assert(t == "GONE" || segRe.findFirstIn(t).isDefined)
      assert(!(f == "NEW" && t == "GONE"))
      assert(n > 0)
    }
    // the matrix partitions the customer base exactly
    val orders = Tables.orders(spark, sf)
    val cutoff = "1998-07-01"
    assert(rows.map(_._3).sum ==
      orders.select("o_custkey").distinct().count())
    assert(rows.filter(_._1 == "NEW").map(_._3).sum ==
      orders.groupBy("o_custkey")
        .agg(min(col("o_orderdate")).as("first"))
        .filter(col("first") >= lit(cutoff).cast("timestamp")).count())
    assert(rows.filter(_._2 == "GONE").map(_._3).sum ==
      orders.groupBy("o_custkey")
        .agg(max(col("o_orderdate")).as("last"))
        .filter(col("last") < lit(cutoff).cast("timestamp")).count())
    // the matrix is a real readout: retained customers exist, and the
    // per-period quartile scoring spreads across more than one segment
    assert(rows.exists(r => r._1 != "NEW" && r._2 != "GONE"))
    assert(rows.map(_._1).distinct.length > 2)
    assert(rows.map(_._2).distinct.length > 2)
  }

  test("k33 bridge: reconciles by construction, effects re-derive from served cells") {
    val rows = run("k33_revenue_bridge").collect()
    assert(rows.length == 25) // every nation trades in both years here
    rows.foreach { r =>
      val (q0, q1) = (r.getAs[Double]("qty0"), r.getAs[Double]("qty1"))
      val (r0, r1) = (r.getAs[Double]("rev0"), r.getAs[Double]("rev1"))
      val delta = r.getAs[Double]("delta_rev")
      val vol = r.getAs[Double]("volume_effect")
      val price = r.getAs[Double]("price_effect")
      // delta is exactly rev1 - rev0 (same doubles, same op)
      assert(delta == r1 - r0)
      // the bridge RECONCILES: volume + price recovers delta (price is
      // the residual; one extra rounding step allows 1-ulp slack)
      assert(math.abs(delta - (vol + price)) < 1e-6)
      // volume effect re-derives from the served cells
      if (q0 > 0.0 && q1 > 0.0) assert(vol == (q1 - q0) * (r0 / q0))
      assert(q0 > 0.0 && q1 > 0.0 && r0 > 0.0 && r1 > 0.0)
    }
    // grand total: the bridge's summed delta equals a direct recompute
    // of total revenue change between the two years
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    def yearRev(y: Int): Double = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .filter(year(col("o_orderdate")) === y)
      .agg(operators.Analytics.dsum(rev)).collect().head.getDouble(0)
    val direct = yearRev(1998) - yearRev(1997)
    val summed = rows.map(_.getAs[Double]("delta_rev")).sum
    assert(math.abs(summed - direct) < 1e-4,
      s"bridge total $summed vs direct $direct")
  }

  test("q1 pricing summary: 6 flag/status groups, counts add up") {
    val rows = run("q1_pricing_summary").collect()
    assert(rows.length == 6)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") <= lit("1999-09-02").cast("timestamp")).count()
    assert(total == expected)
  }

  test("K1b incremental q1: merged partials equal the full recompute, both segments contribute") {
    val inc = run("q1_incremental")
    val full = run("q1_pricing_summary")
    assert(inc.count() == full.count())
    // exact equality incl. the decimal-routed doubles: two-stage
    // decimal summation must be bit-equal to one-stage
    assert(inc.exceptAll(full).count() == 0 && full.exceptAll(inc).count() == 0)
    // the cutoff genuinely splits the data — the merge is exercised,
    // not degenerate
    val li = Tables.lineitem(spark, sf)
    val cut = lit("1995-06-01").cast("timestamp")
    assert(li.filter(col("l_shipdate") <= cut).count() > 0)
    assert(li.filter(col("l_shipdate") > cut).count() > 0)
  }

  test("k6 plan: per-nation winner is an aggregate, not a 25-key window") {
    val df = run("k6_top_customer_per_nation")
    val p = executedPlan(df).toString
    assert(!p.contains("Window"), "K6 must not funnel rows through a low-cardinality window")
    assert(p.contains("HashAggregate") || p.contains("ObjectHashAggregate"))
  }

  test("q1 plan: whole-stage codegen + partial aggregation") {
    val df = run("q1_pricing_summary")
    assert(hasWholeStageCodegen(df))
    assert(executedPlan(df).toString.contains("HashAggregate"))
  }

  test("q3 top-k: descending revenue, broadcast dim join") {
    val df = run("q3_shipping_priority")
    val revs = df.collect().map(_.getAs[Double]("revenue"))
    assert(revs.length <= 10)
    assert(revs.sameElements(revs.sortBy(-_)))
    assert(plan(df).contains("BroadcastHashJoin"))
  }

  test("q6 plan: filters + projection pushed to parquet scan") {
    val p = plan(run("q6_forecast_revenue"))
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"))
    // projection pruning: scan must not read l_orderkey
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"))
  }

  test("k13: high+low line counts add up to the ship-window join size") {
    val rows = run("k13_linestatus_priority").collect()
    val total = rows.map(r => r.getAs[Long]("high_line_count") +
      r.getAs[Long]("low_line_count")).sum
    val want = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(total == want)
  }

  test("k14 plan: the l_quantity disjunction is derived and pushed to the scan") {
    val p = plan(run("k14_disjunctive_revenue"))
    // the original filter references part columns too; Catalyst must
    // still derive the lineitem-only OR and push it into the scan
    val pushed = p.linesIterator.filter(_.contains("PushedFilters")).mkString
    assert(pushed.contains("l_quantity"), s"no pushed l_quantity filter in: $pushed")
  }

  test("k5 rollup: grand total row present and equals orders count") {
    val rows = run("k5_segment_rollup").collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("n_orders") == Tables.orders(spark, sf).count())
  }

  test("k12: one supplier per part, EUROPE only, dims broadcast with one shuffle") {
    val df = run("k12_min_cost_supplier")
    val rows = df.collect()
    assert(rows.map(_.getAs[Long]("p_partkey")).distinct.length == rows.length)
    // EUROPE nations only
    val euNations = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(rows.forall(r => euNations.contains(r.getAs[String]("n_name"))))
    // dims broadcast; two exchanges expected — the cost rollup
    // (hash on all group keys) and the argmin window's repartition
    // on p_partkey alone; orderBy+limit plans as TakeOrdered (no
    // shuffle)
    assert(plan(df).contains("BroadcastHashJoin"))
    val shuffles = flattenPlan(executedPlan(df)).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(shuffles <= 2, s"expected rollup + window shuffles only, got $shuffles")
  }

  test("k6: exactly one top customer per nation present in orders") {
    val df = run("k6_top_customer_per_nation")
    val n = df.select("n_name").distinct().count()
    assert(df.count() == n)
    assert(plan(df).contains("BroadcastHashJoin"))
  }

  test("k15: promo + non-promo revenue partition the month's total") {
    val r = run("k15_promo_revenue").collect().head
    val promo = r.getAs[Double]("promo_revenue")
    val total = r.getAs[Double]("total_revenue")
    assert(promo >= 0.0 && promo <= total)
    assert(r.getAs[Double]("promo_revenue_pct") == 100.0 * promo / total)
  }

  test("k16: top-20 returned-item customers, revenue descending, dims broadcast") {
    val df = run("k16_returned_item_report")
    val rows = df.collect()
    assert(rows.length <= 20)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
    assert(plan(df).contains("BroadcastHashJoin"))
  }

  test("k17: every returned supplier has the same (max) revenue") {
    val rows = run("k17_top_supplier_revenue").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Double]("total_revenue")).distinct.length == 1)
  }

  test("k18: both nation directions only, year within ship range") {
    val rows = run("k18_nation_trade_volume").collect()
    val pairs = rows.map(r => (r.getAs[String]("supp_nation"),
      r.getAs[String]("cust_nation"))).toSet
    assert(pairs.subsetOf(Set(("NATION_3", "NATION_7"), ("NATION_7", "NATION_3"))))
    assert(rows.forall(r => r.getAs[Int]("l_year") >= 1995 &&
      r.getAs[Int]("l_year") <= 2001))
  }

  test("k21: distinct supplier counts bounded, excluded brand absent") {
    val rows = run("k21_supplier_variety").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[String]("p_brand") != "Brand#45"))
    val nSuppliers = Tables.supplier(spark, sf).count()
    rows.foreach { r =>
      val cnt = r.getAs[Long]("supplier_cnt")
      assert(cnt >= 1 && cnt <= r.getAs[Long]("n_lines") && cnt <= nSuppliers)
    }
  }

  test("k22: market share in [0,1], nation volume bounded by total") {
    val rows = run("k22_market_share").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nv, tv, ms) = (r.getAs[Double]("nation_volume"),
        r.getAs[Double]("total_volume"), r.getAs[Double]("mkt_share"))
      assert(nv >= 0.0 && nv <= tv)
      assert(ms == nv / tv && ms >= 0.0 && ms <= 1.0)
    }
  }

  test("k19: lapsed rich customers have no recent orders, above-average balance") {
    val rows = run("k19_idle_customers").collect()
    assert(rows.nonEmpty)
    // cross-check the cohort total against a direct anti-join count
    val cus = Tables.customer(spark, sf)
    val avgBal = cus.filter(col("c_acctbal") > 0.0)
      .agg(sum(col("c_acctbal").cast("decimal(18,6)")).cast("double") /
        count(lit(1))).head().getDouble(0)
    val want = cus.filter(col("c_acctbal") > avgBal)
      .join(Tables.orders(spark, sf)
          .filter(col("o_orderdate") >= lit("1998-06-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(rows.map(_.getAs[Long]("numcust")).sum == want)
  }

  test("k23: grouped profit total equals an ungrouped recompute") {
    val rows = run("k23_product_profit").collect()
    assert(rows.nonEmpty)
    // independent plan: same join chain, NO grouping — one global sum
    val profit = col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      lit(0.6) * col("p_retailprice") * col("l_quantity")
    val want = Tables.lineitem(spark, sf)
      .join(Tables.part(spark, sf).filter(col("p_name").contains("widget")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .agg(sum(profit.cast("decimal(18,6)"))).head().getDecimal(0)
    val got = rows.map(r => BigDecimal(r.getAs[Double]("sum_profit"))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum
    assert((got - BigDecimal(want)).abs < BigDecimal("0.000001"))
  }

  test("k24: every kept part clears the fraction-of-total bar") {
    val rows = run("k24_important_stock").collect()
    assert(rows.nonEmpty)
    // recompute the nation total independently (no per-part grouping)
    val total = Tables.lineitem(spark, sf)
      .join(Tables.supplier(spark, sf), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.nation(spark, sf).filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,6)")).cast("double"))
      .head().getDouble(0)
    // per-part values sum to <= total and each clears the bar (the
    // bar uses the per-part-rounded total, so allow 1e-3 slack)
    assert(rows.forall(_.getAs[Double]("stock_value") > 0.003 * total - 1e-3))
    assert(rows.map(_.getAs[Double]("stock_value")).sum <= total + 1e-3)
  }

  test("k25: every promoted supplier is from the nation and has a qualifying part") {
    val rows = run("k25_part_promotion").collect()
    assert(rows.nonEmpty)
    val natKeys = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf).filter(col("n_name") === "NATION_3"),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey").collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => natKeys(r.getAs[Long]("s_suppkey"))))
    // driver recompute of the qualifying-supplier set from raw rows
    val blue = Tables.part(spark, sf)
      .filter(col("p_name").startsWith("blue"))
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    val li = Tables.lineitem(spark, sf)
      .select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate").collect()
      .filter(r => blue(r.getLong(0)))
    val lo = java.sql.Timestamp.valueOf("1997-01-01 00:00:00").getTime
    val hi = java.sql.Timestamp.valueOf("1998-01-01 00:00:00").getTime
    val qual = li.groupBy(r => (r.getLong(0), r.getLong(1))).collect {
      case ((_, supp), rs)
          if rs.map(r => BigDecimal(r.getDouble(2))).sum * 0.3 <
            rs.filter { r =>
              val t = r.getAs[java.sql.Timestamp](3).getTime
              t >= lo && t < hi
            }.map(r => BigDecimal(r.getDouble(2))).sum => supp
    }.toSet
    assert(rows.map(_.getAs[Long]("s_suppkey")).toSet == (qual & natKeys))
  }

  test("k26: top waiting supplier matches a driver recompute of Q21's rules") {
    val rows = run("k26_waiting_suppliers").collect()
    assert(rows.nonEmpty)
    // recompute numwait per supplier from raw rows: sole late supplier
    // on a finished multi-supplier order; count late LINES
    val fOrd = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate").collect()
      .map(r => r.getLong(0) -> r.getAs[java.sql.Timestamp](1)).toMap
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_suppkey", "l_shipdate").collect()
      .filter(r => fOrd.contains(r.getLong(0)))
    val byOrder = li.groupBy(_.getLong(0))
    val numwait = scala.collection.mutable.Map.empty[Long, Long]
    byOrder.foreach { case (ok, rs) =>
      val cutoff = fOrd(ok).getTime + 90L * 86400000L
      val lateRows =
        rs.filter(_.getAs[java.sql.Timestamp](2).getTime > cutoff)
      val lateSupps = lateRows.map(_.getLong(1)).distinct
      if (rs.map(_.getLong(1)).distinct.length > 1 && lateSupps.length == 1)
        numwait(lateSupps.head) =
          numwait.getOrElse(lateSupps.head, 0L) + lateRows.length
    }
    val names = Tables.supplier(spark, sf)
      .select("s_suppkey", "s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = numwait.toSeq.map { case (k, v) => (names(k), v) }
      .sortBy { case (n, v) => (-v, n) }.take(100)
    val got = rows.map(r => (r.getAs[String]("s_name"), r.getAs[Long]("numwait")))
      .sortBy { case (n, v) => (-v, n) }
    assert(got.toSeq == want)
  }

  test("K29 RFM: every customer scored, quartile laws hold") {
    val rows = run("k29_rfm_segmentation").collect()
    assert(rows.length ==
      Tables.orders(spark, sf).select("o_custkey").distinct().count())
    // scores in 1..4, segment echoes them
    rows.foreach { r =>
      Seq("r_score", "f_score", "m_score").foreach { c =>
        val s = r.getAs[Int](c); assert(s >= 1 && s <= 4, s"$c=$s")
      }
      assert(r.getAs[String]("segment") ==
        s"${r.getAs[Int]("r_score")}-${r.getAs[Int]("f_score")}-${r.getAs[Int]("m_score")}")
    }
    // quartile law: boundaries split the population into four parts,
    // each at most half the total (ties can inflate a bucket, but a
    // monetary quartile can never swallow most of the population)
    val byM = rows.groupBy(_.getAs[Int]("m_score")).view.mapValues(_.length)
    assert(byM.keySet == Set(1, 2, 3, 4), s"m_score buckets ${byM.keySet}")
    assert(byM.values.max <= rows.length / 2)
    // monotonicity: a higher-m_score customer never spends less than
    // a lower-score one
    val maxBy = (1 to 4).map(s =>
      rows.filter(_.getAs[Int]("m_score") == s).map(_.getAs[Double]("monetary")))
    for (s <- 1 to 3 if maxBy(s - 1).nonEmpty && maxBy(s).nonEmpty)
      assert(maxBy(s - 1).max <= maxBy(s).min,
        s"m_score $s max ${maxBy(s - 1).max} > ${s + 1} min ${maxBy(s).min}")
  }

  test("K30 co-purchase: top-k pairs match a driver market-basket recount") {
    val rows = run("k30_copurchase_pairs").collect()
    assert(rows.nonEmpty)
    // driver recount: per-order distinct baskets, all i<j pairs
    val baskets = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).values.map(_.map(_._2).sorted.toIndexedSeq)
    val counts = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.foreach { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.size) {
        val k = (ps(i), ps(j)); counts(k) = counts.getOrElse(k, 0L) + 1L
      }
    }
    val want = counts.toSeq.filter(_._2 >= 2)
      .sortBy { case ((a, b), c) => (-c, a, b) }.take(100)
    val got = rows.toSeq.map(r => ((r.getAs[Long]("part_a"),
      r.getAs[Long]("part_b")), r.getAs[Long]("n_orders")))
    assert(got == want)
    // the ordering tiebreak makes the LIMIT deterministic: the last
    // kept row must strictly dominate (or tie-then-precede) the first
    // excluded one under (support desc, part_a, part_b)
    val all = counts.toSeq.filter(_._2 >= 2)
      .sortBy { case ((a, b), c) => (-c, a, b) }
    if (all.size > 100)
      assert(Ordering.Tuple3[Long, Long, Long].lt(
        (-want.last._2, want.last._1._1, want.last._1._2),
        (-all(100)._2, all(100)._1._1, all(100)._1._2)))
  }
  test("K31 association rules: confidence/lift match a driver recount") {
    val rows = run("k31_association_rules").collect()
    assert(rows.nonEmpty)
    val baskets = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
      .groupBy(_._1).values.map(_.map(_._2).sorted.toIndexedSeq).toSeq
    val nOrders = baskets.size.toDouble
    val partC = scala.collection.mutable.Map.empty[Long, Long]
    val pairC = scala.collection.mutable.Map.empty[(Long, Long), Long]
    baskets.foreach { ps =>
      ps.foreach(p => partC(p) = partC.getOrElse(p, 0L) + 1)
      for (i <- ps.indices; j <- i + 1 until ps.size) {
        val k = (ps(i), ps(j)); pairC(k) = pairC.getOrElse(k, 0L) + 1
      }
    }
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val want = pairC.toSeq.filter(_._2 >= 2)
      .flatMap { case ((a, b), c) => Seq((a, b, c), (b, a, c)) }
      .map { case (a, b, c) =>
        (a, b, c, partC(a), partC(b), r6(c.toDouble / partC(a)),
          r6(c.toDouble * nOrders / (partC(a).toDouble * partC(b))))
      }
      .filter(_._6 >= 0.05)
      .sortBy { case (a, b, _, _, _, _, lift) => (-lift, a, b) }.take(100)
    val got = rows.toSeq.map(r => (r.getAs[Long]("antecedent"),
      r.getAs[Long]("consequent"), r.getAs[Long]("c_pair"),
      r.getAs[Long]("c_ante"), r.getAs[Long]("c_cons"),
      r.getAs[Double]("confidence"), r.getAs[Double]("lift")))
    assert(got == want)
    // both directions of an asymmetric pair disagree on confidence
    // somewhere (c_a != c_b), proving the direction split is real
    assert(got.exists(g => got.exists(h =>
      h._1 == g._2 && h._2 == g._1 && h._6 != g._6)))
  }
}
