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
}
