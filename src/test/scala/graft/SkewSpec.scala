package graft

import org.apache.spark.sql.functions._

/** Skew discipline for the 100 TB case, proven end-to-end at test scale:
  * AQE's skew-join splits a pathological partition at runtime, and the
  * manual salting composition gives the same answer when AQE can't help
  * (e.g. skewed aggregation keys). */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  /** 100k-row fact where one key owns 90% of the table, tiny dim. */
  private def skewed() = {
    val fact = spark.range(100000)
      .select(when($"id" % 10 =!= 0, 0L).otherwise($"id").as("k"),
        ($"id" % 97).as("v"))
    val dim = spark.range(200).select($"id".as("k"), ($"id" * 7).as("w"))
    (fact, dim)
  }

  test("AQE splits the skewed join partition at runtime") {
    val (fact, dim) = skewed()
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // Thresholds lowered so the hot key qualifies as skewed at test size.
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val j = fact.join(dim, Seq("k")).groupBy($"k" === 0L).agg(sum($"v" + $"w"))
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"))
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salted join composition equals the plain join result") {
    val (fact, dim) = skewed()
    val S = 8
    // Salt the fact side's key; explode the dim side across all salts —
    // the manual pattern for when a single key must spread over S tasks.
    val saltedFact = fact.withColumn("salt", pmod(xxhash64($"v"), lit(S)))
    val saltedDim = dim.withColumn("salt", explode(array((0 until S).map(lit): _*)))
    val salted = saltedFact.join(saltedDim, Seq("k", "salt"))
      .groupBy($"k").agg(sum($"v" + $"w").as("s"))
    val plain = fact.join(dim, Seq("k"))
      .groupBy($"k").agg(sum($"v" + $"w").as("s"))
    val a = salted.as[(Long, Long)].collect().toMap
    val b = plain.as[(Long, Long)].collect().toMap
    assert(a === b)
  }
}
