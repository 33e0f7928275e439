package graft

import org.apache.spark.sql.functions._

/** Bucketed co-located joins: the storage layout that removes the
  * shuffle from every entity-keyed operation (SURVEY §4). */
class BucketingSpec extends SparkSpecBase {

  test("join of two tables bucketed on the key runs with zero shuffles") {
    val ev = Tables.events(spark, sf)
    operators.Bucketing.writeBucketed(
      ev.select("event_id", "user_id", "event_type", "value"),
      "events_bucketed", "user_id", 8, Seq("user_id"))
    operators.Bucketing.writeBucketed(
      ev.groupBy("user_id").agg(count(lit(1)).as("n")),
      "user_counts_bucketed", "user_id", 8, Seq("user_id"))

    val joined = spark.table("events_bucketed")
      .join(spark.table("user_counts_bucketed"), "user_id")
    val shuffles = flattenPlan(executedPlan(joined)).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(shuffles == 0, s"bucketed join should not shuffle, got $shuffles")
    assert(joined.count() == ev.count())
  }

  test("served bucketed upsert: same results as flat D2, zero Exchange") {
    val bucketed = run("persist_upsert_bucketed")
    val flat = run("persist_upsert_version")
    assert(bucketed.except(flat).count() == 0 && flat.except(bucketed).count() == 0)
    // the whole windowed upsert reads co-located buckets: no shuffle
    val shuffles = flattenPlan(executedPlan(bucketed)).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(shuffles == 0, s"bucketed upsert should not shuffle, got $shuffles")
  }

  test("E15 stats read on the D2b bucketed layout: same results, zero Exchange") {
    // the SURVEY §2 claim "zero-exchange on the D2b bucketed layout":
    // hashpartitioning(user_id, 8) from the bucketed scan is a subset
    // of the rollup's grouping keys, so the one partial-aggregable
    // rollup plans with no shuffle at all
    val onBuckets = operators.QueryApi.obsStatsFrom(
      operators.Persist.bucketedEvents(spark, sf))
    val flat = run("api_obs_stats")
    assert(onBuckets.except(flat).count() == 0 &&
      flat.except(onBuckets).count() == 0)
    val shuffles = flattenPlan(executedPlan(onBuckets)).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(shuffles == 0, s"bucketed stats read should not shuffle, got $shuffles")
  }

  test("N14 incremental stats: delta-admitted store merges to the full-scan answer") {
    val served = run("store_stats_incremental").collect()
    assert(served.length == 4 &&
      served.forall(_.getAs[Boolean]("ndv_sketch_in_band")))
    // P4-style delta admission on a month boundary: profile the base
    // and the delta separately, union the STORES, merge at read —
    // must equal the full-store merged read row for row (exact
    // counters AND the merged HLL estimate: same per-month sketch
    // rows on both paths)
    val li = Tables.lineitem(spark, sf)
    val cutoff = lit("1997-01-01").cast("date")
    val baseStore = operators.Bucketing.statsStoreFrom(
      li.filter(col("l_shipdate") < cutoff))
    val deltaSlice = li.filter(col("l_shipdate") >= cutoff)
    val deltaStore = operators.Bucketing.statsStoreFrom(deltaSlice)
    assert(deltaStore.count() > 0 && baseStore.count() > 0)
    val mergedInc = operators.Bucketing
      .statsMergedRead(baseStore.unionAll(deltaStore)).collect()
    val mergedFull = operators.Bucketing
      .statsMergedRead(operators.Bucketing.statsStore(spark, sf)).collect()
    // exact counters merge identically by algebra (min/max/sum/count)
    def exactPart(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(_.toSeq.dropRight(1)).toSet // all but ndv_est
    assert(exactPart(mergedInc) == exactPart(mergedFull),
      "delta-admitted store read diverges from the full store")
    // the sketch estimate is NOT bit-stable across partition splits
    // (DataSketches HLL union order/mode effects) — that is WHY the
    // serve exposes only the in-band boolean; pin the incremental
    // path's estimate to the same +-15%+1 contract against exact NDV
    val exactNdv = served.map(r =>
      r.getAs[String]("column_name") -> r.getAs[Long]("ndv")).toMap
    mergedInc.foreach { r =>
      val ndv = exactNdv(r.getAs[String]("column_name"))
      assert(math.abs(r.getAs[Long]("ndv_est") - ndv) <= ndv * 0.15 + 1,
        s"incremental sketch out of band: $r vs exact $ndv")
    }
    // the delta profile reads ONLY the delta slice: the shipdate
    // cutoff is pushed into the parquet scan
    val scan = flattenPlan(executedPlan(deltaSlice)).collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(l_shipdate"),
      s"delta scan filter not pushed: $pushed")
  }

  test("N2 partition prune: executed scan reads only the queried day's files") {
    val df = run("store_partition_prune")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // planning-time pruning: every file the EXECUTED scan actually
    // selected lives in the queried partition directory (note
    // df.inputFiles would report the relation's full file list)
    val scan = flattenPlan(executedPlan(df)).collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val files = scan.selectedPartitions.toPartitionArray.map(_.urlEncodedPath)
    assert(files.nonEmpty)
    assert(files.forall(_.contains("event_date=2024-01-15")),
      s"unpruned files: ${files.filterNot(_.contains("event_date=2024-01-15")).take(3).mkString(", ")}")
    // and the rollup matches the flat-table filter
    val want = Tables.events(spark, sf)
      .filter(to_date(col("ts")) === lit("2024-01-15"))
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n_events")).toMap == want)
  }

  test("N13 dpp join: fact scan carries a DynamicPruning partition filter, rollup matches flat recompute") {
    val df = run("store_dpp_join")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // the runtime-only "hot days" dimension cannot prune statically:
    // the fact-side scan must carry a DynamicPruningExpression in its
    // PARTITION filters — a regression to a full-store read fails here
    val scans = flattenPlan(executedPlan(df)).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.exists(
        _.partitionFilters.mkString.toLowerCase.contains("dynamicpruning")),
      s"no dynamic pruning on any scan: ${scans.map(_.partitionFilters.mkString(",")).mkString(" | ")}")
    // flat-table recompute of the same hot-day rollup
    val dailyAll = Tables.events(spark, sf)
      .groupBy(date_format(col("ts"), "yyyy-MM-dd").as("event_date"))
      .agg(sum(col("value").cast("decimal(18,6)")).as("day_sum"))
    val Array(totalD, nd) = dailyAll
      .agg(sum(col("day_sum")).cast("double"), count(lit(1)).cast("double"))
      .collect().head.toSeq.map(_.asInstanceOf[Double]).toArray
    val daily = dailyAll
      .filter(col("day_sum").cast("double") > lit(1.02) * lit(totalD / nd))
      .select(col("event_date"))
    val want = Tables.events(spark, sf)
      .withColumn("event_date", date_format(col("ts"), "yyyy-MM-dd"))
      .join(daily, Seq("event_date"))
      .groupBy(col("event_date"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(rows.map(r => (r.getAs[String]("event_date"),
      r.getAs[String]("event_type")) -> r.getAs[Long]("n_events")).toMap == want)
  }

  test("N3 z-order: every file's rows fit a 32x32 rectangle in both dims") {
    val rows = run("store_zorder_layout").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val uSpan = r.getAs[Long]("u_max") - r.getAs[Long]("u_min")
      val mSpan = r.getAs[Long]("m_max") - r.getAs[Long]("m_min")
      // z >> 10 fixed leaves 5 free low bits per dim: spans <= 31.
      // This is the file-skipping law: min/max stats on EITHER dim
      // prune most files for a point/range predicate on that dim.
      assert(uSpan <= 31 && mSpan <= 31,
        s"file ${r.getAs[Long]("file_id")}: spans $uSpan x $mSpan exceed 31")
    }
    // total rows conserved
    assert(rows.map(_.getAs[Long]("n_events")).sum ==
      Tables.events(spark, sf).count())
  }

  test("N4 compaction plan: bins near target size, files and rows conserved") {
    val inv = run("store_compaction_plan").collect()
    val nFiles = inv.map(_.getAs[Long]("n_files")).sum
    val nRows = inv.map(_.getAs[Long]("total_rows")).sum
    val wantFiles = Tables.events(spark, sf)
      .select(operators.Obs.tenant, operators.Obs.ingestDate, hour(col("ts")))
      .distinct().count()
    assert(nFiles == wantFiles, s"plan covers $nFiles of $wantFiles files")
    assert(nRows == Tables.events(spark, sf).count())
    // packing law: a bin holds the files STARTING in one
    // target-sized cumsum interval, so its total is bounded by
    // target + largest-file - 1 (the last file may overhang)
    val maxFile = Tables.events(spark, sf)
      .groupBy(operators.Obs.tenant, operators.Obs.ingestDate, hour(col("ts")))
      .count().agg(max("count")).collect()(0).getLong(0)
    inv.foreach { r =>
      assert(r.getAs[Long]("total_rows") <= 500 + maxFile - 1,
        s"bin ${r.getAs[Long]("bin_id")} overpacked: ${r.getAs[Long]("total_rows")}")
    }
  }

  test("N7 column stats: ranges/ndv match direct recomputes, scans are column-pruned") {
    val stats = run("store_column_stats").collect()
      .map(r => r.getAs[String]("column_name") -> r).toMap
    assert(stats.size == 11)
    // spot-check against direct single-column recomputes
    val li = Tables.lineitem(spark, sf)
    assert(stats("l_returnflag").getAs[Long]("ndv") ==
      li.select("l_returnflag").distinct().count())
    val qty = li.agg(min("l_quantity"), max("l_quantity")).collect()(0)
    assert(stats("l_quantity").getAs[Double]("min_v") == qty.getDouble(0))
    assert(stats("l_quantity").getAs[Double]("max_v") == qty.getDouble(1))
    stats.values.foreach { r =>
      assert(r.getAs[Long]("n_nulls") == 0L)
      assert(r.getAs[Boolean]("ndv_sketch_in_band"))
      if (!r.isNullAt(r.fieldIndex("min_v")))
        assert(r.getAs[Double]("min_v") <= r.getAs[Double]("max_v"))
    }
    // the scale claim: every branch's parquet scan reads ONLY its
    // column — no branch drags the full row through the stats agg
    val scans = flattenPlan(executedPlan(run("store_column_stats"))).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f.requiredSchema
    }
    assert(scans.nonEmpty && scans.forall(_.size <= 1),
      s"stats branches must scan single columns, got ${scans.map(_.size).toSeq}")
  }

  test("N15 bloom prune: no false negatives, zone maps blind, bits knob moves only FPs") {
    // fileRows=100 so sf0.001's 1000 events make 10 files (the
    // registry default 1250 would make pruning trivially 1-file here)
    val rows = operators.Bucketing.bloomPrune(spark, sf, fileRows = 100L)
      .collect()
      .map(r => (r.getAs[String]("trace_id"), r.getAs[Boolean]("present"),
        r.getAs[Long]("n_files"), r.getAs[Long]("n_zone_pass"),
        r.getAs[Long]("n_bloom_pass"), r.getAs[Long]("n_true_files"),
        r.getAs[Long]("n_false_pos")))
    assert(rows.length == 75)
    val nFiles = rows.head._3
    assert(nFiles == 10)
    rows.foreach { case (id, present, nf, _, bp, tf, fp) =>
      assert(nf == nFiles)
      // THE bloom law: never below the true count (no false negatives)
      assert(bp >= tf, s"$id: bloom false negative")
      assert(fp == bp - tf)
      if (present) assert(tf >= 1, s"$id: present probe finds no file")
      else assert(tf == 0, s"$id: planted absent probe has a true file")
    }
    // traces are ingest-clustered: 1-2 true files each
    assert(rows.filter(_._2).forall(_._6 <= 2))
    // zone maps are blind on the hash key (5-trace files still span
    // ~2/3 of hex space: E[max-min] = (n-1)/(n+1)): they pass more
    // than half of everything and 3x what the bloom passes
    assert(rows.map(_._4).sum * 2 > rows.map(_._3).sum)
    assert(rows.map(_._4).sum > 3 * rows.map(_._5).sum)
    // the bloom actually prunes: passes well under half the files
    assert(rows.map(_._5).sum * 2 < rows.map(_._3).sum)
    // the bits knob is monotone: shrinking the filter can only ADD
    // false positives, never lose a true file
    val small = operators.Bucketing
      .bloomPrune(spark, sf, bits = 16L, fileRows = 100L).collect()
      .map(r => (r.getAs[String]("trace_id"), r.getAs[Long]("n_bloom_pass"),
        r.getAs[Long]("n_true_files")))
    val big = rows.map(r => (r._1, r._5)).toMap
    small.foreach { case (id, bp, tf) =>
      assert(bp >= big(id), s"$id: smaller filter pruned MORE")
      assert(bp >= tf)
    }
    // at 16 bits a ~15-position file filter saturates — false
    // positives must actually appear (the knob is live)
    assert(small.map(t => t._2 - t._3).sum >
      rows.map(_._7).sum)
  }

  test("N3b skipping read: consult really skips files, result matches the full-scan filter") {
    val res = run("store_skipping_read").cache()
    assert(res.count() > 0)
    // effectiveness: the predicate box selects a strict subset of the
    // manifest — the consult skips files (the oracle separately proves
    // soundness: no needed file was skipped)
    val allFiles = run("store_zorder_layout").count()
    val kept = operators.Bucketing.skippingFiles(spark, sf).count()
    assert(kept > 0 && kept < allFiles,
      s"consult kept $kept of $allFiles files — no skipping happened")
    // soundness recheck in-engine: identical rows to the naive filter
    val naive = Tables.events(spark, sf)
      .withColumn("zu", pmod(col("user_id"), lit(256L)))
      .withColumn("zm",
        floor((hour(col("ts")) * 60 + minute(col("ts"))) / lit(6)).cast("long"))
      .filter(col("zu").between(4, 9) && col("zm").between(60, 90))
      .select("event_id", "user_id", "ts", "value", "zu", "zm")
    assert(res.exceptAll(naive).count() == 0)
    assert(naive.exceptAll(res).count() == 0)
    res.unpersist(): Unit
  }

  test("ts predicates push into the parquet scan (NTZ read as session-TZ TIMESTAMP)") {
    // regression pin for the r7 ADVICE fix: with
    // spark.sql.parquet.inferTimestampNTZ.enabled=false the scan
    // yields TimestampType directly, so ts filters reach PushedFilters
    // (a per-column Cast after load would block pushdown and row-group
    // skipping on every time-ranged query)
    val df = Tables.events(spark, sf)
      .filter(col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp"))
    val scan = flattenPlan(executedPlan(df)).collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    assert(scan.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampType, "scan must read ts as TIMESTAMP")
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(ts"),
      s"ts predicate not pushed: $pushed")
  }

  test("N11 skew report: counts and hot verdicts recount on the driver") {
    val users = Tables.events(spark, sf).select("user_id").collect()
      .map(_.getLong(0))
    val counts = users.map(u => "s" + (if (u % 4 != 0) 0L else (u / 4) % 32))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = users.length.toLong
    val rows = run("store_skew_report").collect()
    assert(rows.length == counts.size)
    rows.foreach { r =>
      val c = counts(r.getString(0))
      assert(r.getAs[Long]("n_rows") == c)
      assert(r.getAs[Long]("total_rows") == total)
      assert(r.getAs[Long]("n_keys") == counts.size.toLong)
      assert(r.getAs[Long]("max_key_rows") == counts.values.max)
      assert(r.getAs[Boolean]("is_hot") == (c * counts.size > 3 * total))
    }
    // the legacy default shard is genuinely hot — the detector fires
    assert(rows.exists(_.getAs[Boolean]("is_hot")))
    assert(rows.count(_.getAs[Boolean]("is_hot")) < rows.length)
  }

  test("N9 equi-depth histogram: conservation, contiguity, and balance bound") {
    val rows = run("store_equidepth_hist").collect()
    val li = Tables.lineitem(spark, sf)
    val total = li.count()
    val maxBin = li.groupBy(floor(col("l_extendedprice")).cast("long"))
      .count().agg(max("count")).head().getLong(0)
    // conservation: every row lands in exactly one bucket
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    // contiguity: bucket ranges are ordered and non-overlapping
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("hi_dollar") <= b.getAs[Long]("lo_dollar"))
      case _ =>
    }
    // compressed equi-depth balance: a bucket overshoots the ideal
    // depth only by (at most) the largest unsplittable bin
    val ideal = total / 16.0
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rows") <= ideal + maxBin,
        s"bucket ${r.getAs[Long]("bucket")} exceeds depth+maxBin")
    }
  }

  test("aggregation on the bucket key needs no exchange") {
    val agg = spark.table("events_bucketed")
      .groupBy("user_id").agg(sum("value").as("total"))
    val shuffles = flattenPlan(executedPlan(agg)).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])
    assert(shuffles == 0, s"bucketed agg should not shuffle, got $shuffles")
  }
}
