package graft

import graft.operators.RelationalQueries
import graft.sources.Tables
import org.apache.spark.sql.functions._

class RelationalOpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables.events(spark, sf)
    .select($"event_id", $"user_id", $"event_type", unix_micros($"ts").as("us"), $"value")
    .as[(Long, Long, String, Long, Double)].collect()

  test("q14: as-of matches a brute-force latest-purchase-at-or-before scan") {
    val purchases = events.filter(_._3 == "purchase")
      .groupBy(_._2).view.mapValues(_.sortBy(e => (e._4, e._1))).toMap
    val expected = events.filter(_._3 == "click").map { c =>
      val p = purchases.getOrElse(c._2, Array.empty[(Long, Long, String, Long, Double)])
        .filter(_._4 <= c._4).lastOption
      c._1 -> p.map(_._1)
    }.toMap
    val got = RelationalQueries.q14AsofJoin(spark, sf)
      .select($"event_id", $"asof_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got === expected)
    assert(got.nonEmpty)
  }

  test("q16: pivot cells sum back to the per-cohort event totals") {
    val rows = RelationalQueries.q16Pivot(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.length === 10)
    val cellTotal = rows.map(r => r._2 + r._3 + r._4 + r._5 + r._6).sum
    val total = graft.sources.Tables.events(spark, sf).count()
    assert(cellTotal === total, "pivot must partition the events exactly")
    // spot-check one cell against a direct filter
    val c0clicks = graft.sources.Tables.events(spark, sf)
      .where(pmod($"user_id", lit(10)) === 0 && $"event_type" === "click").count()
    assert(rows.find(_._1 == 0L).get._2 === c0clicks)
  }

  test("q17: cube grouping ids partition the rows; grand total matches") {
    val rows = RelationalQueries.q17Cube(spark, sf)
      .select($"gid", $"rflag", $"lstatus", $"cnt")
      .as[(Int, String, String, Long)].collect()
    val byGid = rows.groupBy(_._1)
    assert(byGid.keySet === Set(0, 1, 2, 3))
    val total = graft.sources.Tables.lineitem(spark, sf).count()
    // every grouping set partitions the input: counts per gid all sum to total
    byGid.values.foreach(g => assert(g.map(_._4).sum === total))
    // gid bit order: 1 = linestatus rolled up, 2 = returnflag rolled up
    assert(byGid(1).forall(r => r._3 == "ALL" && r._2 != "ALL"))
    assert(byGid(2).forall(r => r._2 == "ALL" && r._3 != "ALL"))
    assert(byGid(3) === Array((3, "ALL", "ALL", total)).toSeq)
  }

  test("q18: SQL-entry correlated subquery matches a DataFrame recomputation") {
    val cust = graft.sources.Tables.customer(spark, sf)
    val avgByNation = cust.groupBy($"c_nationkey")
      .agg(graft.sources.Det.davg($"c_acctbal").as("nation_avg"))
    val want = cust.join(avgByNation, Seq("c_nationkey"))
      .where($"c_acctbal" > $"nation_avg")
      .join(graft.sources.Tables.nation(spark, sf),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("above_avg_cnt"), min($"c_acctbal").as("min_above"))
      .as[(String, Long, Double)].collect().toSet
    val got = RelationalQueries.q18SqlEntry(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q15: range lookback counts match a brute-force window scan") {
    val byUser = events.groupBy(_._2)
    val expected = events.map { e =>
      val peers = byUser(e._2)
      e._1 -> (
        peers.count(p => p._4 >= e._4 - 300000000L && p._4 <= e._4) - 1,
        peers.count(p => p._4 >= e._4 - 3600000000L && p._4 <= e._4) - 1)
    }.toMap
    val got = RelationalQueries.q15RangeLookback(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._3.toInt, r._4.toInt)).toMap
    assert(got === expected)
  }

  test("q20: recursive subtree rollup matches a Scala ancestor-walk recount") {
    val docs = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", size(split($"text", " ")).cast("long").as("t"))
      .as[(Long, Long)].collect()
    val expect = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    docs.foreach { case (id, t) =>
      val chain = Iterator.iterate(id)(_ / 2).takeWhile(_ > 0).toSeq :+ 0L
      chain.foreach { node =>
        val (c, s0) = expect.getOrElse(node, (0L, 0L))
        expect(node) = (c + 1, s0 + t)
      }
    }
    val got = RelationalQueries.q20RecursiveCte(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === expect.toMap)
    // the root aggregates the whole corpus
    assert(got(0L)._1 === docs.length.toLong)
    assert(got(0L)._2 === docs.map(_._2).sum)
  }

  test("q20b: level-wise bottom-up rollup equals the recursive CTE exactly") {
    val rec = RelationalQueries.q20RecursiveCte(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    val lvl = RelationalQueries.q20LevelRollup(spark, sf)
      .as[(Long, Long, Long)].collect().toSet
    assert(lvl === rec)
    assert(lvl.nonEmpty)
  }

  test("q20: recursion-limit raise is scoped — session guard intact afterwards") {
    val key = "spark.sql.cteRecursionRowLimit"
    val before = spark.conf.get(key)
    RelationalQueries.q20RecursiveCte(spark, sf).count()
    assert(spark.conf.get(key) === before,
      "q20 must restore the recursion guard it temporarily raised")
    assert(spark.conf.get(key).toLong < Int.MaxValue.toLong,
      "the session must keep a finite runaway-recursion guard")
  }

  test("q21: LATERAL top-3 equals the window-rank formulation") {
    val got = RelationalQueries.q21LateralTopk(spark, sf)
      .as[(String, Long, Double)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
    val want = graft.sources.Tables.customer(spark, sf)
      .withColumn("rnk", row_number().over(w))
      .where($"rnk" <= 3)
      .join(graft.sources.Tables.nation(spark, sf),
        $"c_nationkey" === $"n_nationkey")
      .select($"n_name", $"c_custkey", $"c_acctbal")
      .as[(String, Long, Double)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty)
    got.groupBy(_._1).values.foreach(rows => assert(rows.size <= 3))
  }

  test("q19: listagg rosters are sorted, complete, and partition-invariant") {
    val rows = RelationalQueries.q19StringAgg(spark, sf)
      .as[(String, Long, String)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, n, ids) =>
      val parts = ids.split(",").map(_.toLong).toSeq
      assert(parts.length.toLong === n)
      assert(parts === parts.sorted, s"roster not sorted: $ids")
    }
    // group count matches t5's group_sz >= 2 fingerprint count
    val t5groups = graft.operators.TextOps.t5Fingerprint(spark, sf)
      .where($"group_sz" >= 2).select($"fingerprint").distinct().count()
    assert(rows.length.toLong === t5groups)
    // aggregated string is stable under an adversarial repartition: the
    // sort_array pins element order regardless of physical layout
    val shuffled = graft.sources.Tables.documents(spark, sf).repartition(13)
      .select($"doc_id",
        md5(concat_ws(" ", array_sort(array_distinct(split($"text", " ")))))
          .as("fingerprint"))
      .groupBy($"fingerprint")
      .agg(count(lit(1)).as("n_docs"),
        concat_ws(",",
          transform(sort_array(collect_list($"doc_id")), _.cast("string")))
          .as("doc_ids"))
      .where($"n_docs" >= 2)
      .as[(String, Long, String)].collect().toSet
    assert(shuffled === rows.toSet)
  }

  test("q23: max_by merge equals the window formulation, applies updates, drops tombstones") {
    val merged = RelationalQueries.q23MergeLatest(spark, sf)

    // the agg path must not pay a window sort: no Window operator, and the
    // whole merge is ONE hash-partitioned exchange (the groupBy)
    val plan = merged.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"merge must not use a window sort:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1,
      s"merge should shuffle exactly once:\n$plan")

    val got = merged
      .as[(Long, Long, String, Double, String)].collect().toSet

    // oracle-shaped alternative: window row_number over the same union
    val o = Tables.orders(spark, sf)
    val slice = pmod(graft.sources.Hash60.col60($"o_orderkey".cast("string")), lit(10))
    val v = o.select($"o_orderkey", $"o_custkey", $"o_orderstatus",
        $"o_totalprice", $"o_orderpriority", lit(1L).as("version"), lit("i").as("op"))
      .unionByName(o.where(slice < 2).select($"o_orderkey", $"o_custkey",
        lit("U").as("o_orderstatus"), ($"o_totalprice" * 2).as("o_totalprice"),
        $"o_orderpriority", lit(2L).as("version"), lit("u").as("op")))
      .unionByName(o.where(slice === 2).select($"o_orderkey",
        lit(null).cast("bigint").as("o_custkey"),
        lit(null).cast("string").as("o_orderstatus"),
        lit(null).cast("double").as("o_totalprice"),
        lit(null).cast("string").as("o_orderpriority"),
        lit(3L).as("version"), lit("d").as("op")))
    val byKey = org.apache.spark.sql.expressions.Window
      .partitionBy($"o_orderkey").orderBy($"version".desc)
    val want = v.withColumn("rn", row_number().over(byKey))
      .where($"rn" === 1 && $"op" =!= "d")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice",
        $"o_orderpriority")
      .as[(Long, Long, String, Double, String)].collect().toSet
    assert(got === want)

    // the change batch genuinely landed: deletes gone, updates applied
    val total = o.count()
    val deleted = o.where(slice === 2).count()
    val updated = o.where(slice < 2).count()
    assert(deleted > 0 && updated > 0, s"degenerate slices: $deleted/$updated")
    assert(got.size === (total - deleted))
    assert(got.count(_._3 == "U") === updated)
  }

  test("q24: one-pass window funnel equals the naive 3-join formulation") {
    val got = RelationalQueries.q24Funnel(spark, sf)

    // the single-pass shape: one hashpartitioning exchange (user_id)
    // feeds both window steps AND the per-user aggregate; only the final
    // 1-row global aggregate adds its SinglePartition exchange
    val plan = got.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).length === 1,
      s"funnel must shuffle the log exactly once:\n$plan")

    val ev = Tables.events(spark, sf).select($"user_id", $"ts", $"event_type")
    val fv = ev.where($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("fv"))
    val fc = ev.where($"event_type" === "click").join(fv, Seq("user_id"))
      .where($"ts" > $"fv")
      .groupBy($"user_id").agg(min($"ts").as("fc"))
    val fp = ev.where($"event_type" === "purchase").join(fc, Seq("user_id"))
      .where($"ts" > $"fc")
      .groupBy($"user_id").agg(min($"ts").as("fp"))
    val (nv, nc, np) = (fv.count(), fc.count(), fp.count())

    val row = got.collect().head
    assert(row.getLong(row.fieldIndex("users_view")) === nv)
    assert(row.getLong(row.fieldIndex("users_click")) === nc)
    assert(row.getLong(row.fieldIndex("users_purchase")) === np)
    assert(nv > 0 && np > 0 && np <= nc && nc <= nv,
      s"degenerate funnel: $nv/$nc/$np")
  }

  test("q25: cohort grid recounts from a per-user Scala replay") {
    val got = RelationalQueries.q25RetentionCohort(spark, sf)
      .as[(Long, Long, Long)].collect()
      .map { case (c, o, n) => (c, o) -> n }.toMap

    val ev = Tables.events(spark, sf)
      .select($"user_id", unix_micros($"ts").as("us"))
      .as[(Long, Long)].collect()
    val first = ev.groupBy(_._1).map { case (u, rows) => u -> rows.map(_._2).min }
    val want = ev
      .map { case (u, us) =>
        ((first(u) - RelationalQueries.CohortEpochUs) / RelationalQueries.WeekUs,
          (us - first(u)) / RelationalQueries.WeekUs, u)
      }
      .distinct
      .groupBy(t => (t._1, t._2))
      .map { case (k, v) => k -> v.size.toLong }
    assert(got === want)
    // every user's offset-0 cell exists and cohort sizes are monotone vs offset 0
    assert(got.keys.exists(_._2 == 0L))
  }

  test("q23 kernel: random multi-version logs merge to the Scala replay") {
    // the registered query exercises exactly two versions per key; real
    // CDC logs carry arbitrarily many — drive the kernel with a seeded
    // random log (1..5 distinct versions per key, random ops) and replay
    // the latest-surviving-row rule in plain Scala
    val rng = new scala.util.Random(42L)
    val log = (0 until 100).flatMap { k =>
      val nv = 1 + rng.nextInt(5)
      rng.shuffle((1 to 9).toList).take(nv).map { v =>
        val op = Seq("i", "u", "d")(rng.nextInt(3))
        (k.toLong, s"payload_${k}_$v", v.toLong, op)
      }
    }
    val df = log.toDF("k", "pay", "version", "op")
    val got = RelationalQueries.mergeLatest(df, "k", Seq("pay"))
      .as[(Long, String)].collect().toSet
    val want = log.groupBy(_._1).flatMap { case (k, rows) =>
      val latest = rows.maxBy(_._3)
      if (latest._4 == "d") None else Some((k, latest._2))
    }.toSet
    assert(got === want)
    assert(want.nonEmpty && want.size < 100,
      s"degenerate case: ${want.size} survivors of 100 keys")
  }

  test("q26: SCD2 intervals chain per key and current rows equal the q23 merge") {
    val hist = RelationalQueries.q26Scd2History(spark, sf)
      .select($"o_orderkey", $"version", $"op", $"next_version", $"is_current")
      .as[(Long, Long, String, Option[Long], Boolean)].collect()

    // every key's intervals chain: versions sorted, each next_version is
    // the following row's version, exactly the last row open
    hist.groupBy(_._1).foreach { case (k, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === rows.map(_._2).sorted.toSeq)
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 === Some(b._2), s"broken chain at key $k")
        case _ =>
      }
      assert(sorted.last._4.isEmpty, s"open interval not last for key $k")
      val current = rows.filter(_._5)
      assert(current.length === (if (sorted.last._3 == "d") 0 else 1),
        s"current-count wrong for key $k: $rows")
    }

    // the current rows ARE q23's merged state (same keys)
    val currentKeys = hist.filter(_._5).map(_._1).toSet
    val mergedKeys = RelationalQueries.q23MergeLatest(spark, sf)
      .select($"o_orderkey").as[Long].collect().toSet
    assert(currentKeys === mergedKeys)

    // history keeps what compaction discards
    assert(hist.length > mergedKeys.size)
  }

  test("q22: salted aggregation equals the direct GROUP BY, and the hot key actually spreads") {
    val salted = RelationalQueries.q22SkewSalted(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect().toSet
    val direct = Tables.orders(spark, sf)
      .groupBy(when($"o_custkey" % 10 =!= 0, 0L).otherwise($"o_custkey").as("hot_key"))
      .agg(count(lit(1)).as("n_orders"),
        graft.sources.Det.dsum($"o_totalprice").as("total_price"),
        min($"o_totalprice").as("min_price"),
        max($"o_totalprice").as("max_price"))
      .as[(Long, Long, Double, Double, Double)].collect().toSet
    assert(salted === direct)
    // the key must be genuinely pathological, and stage 1 must spread it:
    // the hot key's rows land in all 16 salt groups at this corpus size
    val orders = Tables.orders(spark, sf)
    val hotShare = orders.where($"o_custkey" % 10 =!= 0).count().toDouble / orders.count()
    assert(hotShare > 0.8, s"hot key owns only $hotShare of the table")
    val spread = orders.where($"o_custkey" % 10 =!= 0)
      .select(pmod(xxhash64($"o_orderkey"), lit(RelationalQueries.SkewSalts)).as("salt"))
      .distinct().count()
    assert(spread === RelationalQueries.SkewSalts.toLong,
      s"expected all ${RelationalQueries.SkewSalts} salt buckets hit, got $spread")
  }
}
