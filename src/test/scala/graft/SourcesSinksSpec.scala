package graft

import graft.sources.Tables
import org.apache.spark.sql.functions._

/** Storage-layout levers for the 100 TB deployment, proven on the plan:
  * partitioned parquet writes → partition pruning at the scan, and
  * bucketed tables → co-located (exchange-free) joins. These are the
  * sink-side counterparts of the PushedFilters/ReadSchema discipline in
  * [[graft.sources.Tables]].
  */
class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned parquet write prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    Tables.lineitem(spark, sf)
      .write.mode("overwrite").partitionBy("l_returnflag")
      .parquet(s"$dir/lineitem_part")
    val back = spark.read.parquet(s"$dir/lineitem_part")
    val q = back.where($"l_returnflag" === "R")
      .agg(sum($"l_quantity").as("qty"), count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(l_returnflag"),
      s"expected partition filter in:\n$plan")
    // pruned result equals the unpartitioned filter
    val want = Tables.lineitem(spark, sf).where($"l_returnflag" === "R")
      .agg(sum($"l_quantity"), count(lit(1))).as[(Double, Long)].collect()(0)
    val got = q.as[(Double, Long)].collect()(0)
    assert(got === want)
  }

  test("bucketed tables join without any exchange") {
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")
    Tables.orders(spark, sf)
      .write.mode("overwrite").bucketBy(4, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    Tables.customer(spark, sf)
      .write.mode("overwrite").bucketBy(4, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")
    // Disable auto-broadcast: at test scale every side is broadcastable,
    // but the claim under test is the big-big case where bucket layout
    // replaces both shuffles.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      val exchangesBelowJoin = plan.linesIterator
        .dropWhile(l => !l.contains("SortMergeJoin") && !l.contains("ShuffledHashJoin"))
        .count(_.contains("Exchange hashpartitioning"))
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected a shuffle-family join in:\n$plan")
      assert(exchangesBelowJoin === 0,
        s"bucketed join must not re-shuffle either side:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scans in:\n$plan")
      // same result as the unbucketed join
      val want = Tables.orders(spark, sf)
        .join(Tables.customer(spark, sf), $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        .as[(String, Long)].collect().toMap
      val got = joined.as[(String, Long)].collect().toMap
      assert(got === want)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("events scan is ts-encoding-robust: nanos INT64, micros NTZ and micros LTZ fixtures yield identical rows") {
    // The driver has regenerated events.ts under different parquet encodings
    // across rounds (TIMESTAMP(NANOS) -> TIMESTAMP(MICROS, NTZ), which broke
    // 19 queries in r9). Pin Tables.events against all the surfaces the scan
    // can produce: LongType (what nanosAsLong yields for a NANOS column —
    // Spark cannot WRITE nanos parquet, so encode the same INT64-nanos
    // surface directly), TIMESTAMP_NTZ (micros, isAdjustedToUTC=false), and
    // TIMESTAMP (micros, adjusted). All three must normalize to the same
    // session-TZ TIMESTAMP rows.
    import org.apache.spark.sql.types.TimestampType
    val base = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", $"ts", $"value")
      .limit(200).cache()
    val root = java.nio.file.Files.createTempDirectory("graft_ts_enc").toString
    val nanosDir = s"$root/nanos"; val ntzDir = s"$root/ntz"; val ltzDir = s"$root/ltz"
    base.withColumn("ts", expr("unix_micros(ts) * 1000L"))
      .write.parquet(s"$nanosDir/events.parquet")
    base.withColumn("ts", $"ts".cast("timestamp_ntz"))
      .write.parquet(s"$ntzDir/events.parquet")
    base.write.parquet(s"$ltzDir/events.parquet")
    def rows(dir: String) = {
      val df = Tables.events(spark, dir)
      assert(df.schema("ts").dataType === TimestampType,
        s"events.ts must normalize to TIMESTAMP, got ${df.schema("ts").dataType} from $dir")
      df.select($"event_id", $"ts", $"value").collect().toSeq
        .sortBy(r => r.getLong(0)) // event_id order, deterministic across scans
    }
    val (n, z, l) = (rows(nanosDir), rows(ntzDir), rows(ltzDir))
    assert(n.nonEmpty)
    assert(n === z, "nanos-encoded and micros-NTZ fixtures must load identically")
    assert(n === l, "nanos-encoded and micros-LTZ fixtures must load identically")
    base.unpersist()
  }
}
