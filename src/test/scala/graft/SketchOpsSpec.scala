package graft

import graft.operators.SketchOps
import org.apache.spark.sql.functions._

class SketchOpsSpec extends SparkSpec {
  import spark.implicits._

  test("k1: HLL distinct lands within its 5% bound on every group") {
    val rows = SketchOps.k1HllDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("hll_within_5pct"),
        s"${r.getAs[String]("event_type")}: HLL outside bound")
      assert(r.getAs[Long]("exact_users") > 0)
    }
  }

  test("k2: quantile sketch within 2% of exact; p50 <= p95") {
    val rows = SketchOps.k2QuantileSketch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("sketch_within_2pct"))
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p95"))
    }
  }

  test("k3: exactly 5 heavy hitters, descending, CMS inside its bound") {
    val rows = SketchOps.k3CmsTopk(spark, sf)
      .as[(Long, Long, Boolean)].collect()
    assert(rows.length === 5)
    assert(rows.forall(_._3), "CMS estimate escaped its guarantee")
    val counts = rows.map(_._2)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b })
    // cross-check the top entry against a direct filter
    val top = rows.head
    val direct = graft.sources.Tables.events(spark, sf)
      .where($"user_id" === top._1).count()
    assert(direct === top._2)
  }

  test("k4: merged shard sketches estimate the global distinct within bound") {
    val rows = SketchOps.k4SketchUnion(spark, sf)
      .as[(Long, Boolean, Long)].collect()
    assert(rows.length === 1)
    val (exact, ok, nSketches) = rows.head
    assert(nSketches === 4L)
    assert(ok, "merged HLL estimate escaped the 5% bound")
    val direct = graft.sources.Tables.events(spark, sf)
      .select($"user_id").distinct().count()
    assert(exact === direct)
    // mergeability: the union of the 4 shard sketches must agree with a
    // single sketch over the undivided column to within sketch error.
    // NOT exact equality: the one-shot path can retain the HIP estimator
    // while a union is always composite-estimator — whether they coincide
    // depends on partition count, so a === here would flake across
    // machines. Both must sit within the 5% band around exact.
    val ev = graft.sources.Tables.events(spark, sf)
    val one = ev.agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))"))
      .as[Long].collect()(0)
    val merged = ev.withColumn("shard", pmod($"user_id", lit(4)))
      .groupBy($"shard").agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .as[Long].collect()(0)
    assert(math.abs(merged - exact) <= exact * 0.05 + 1, s"merged=$merged exact=$exact")
    assert(math.abs(one - exact) <= exact * 0.05 + 1, s"one=$one exact=$exact")
  }
}
