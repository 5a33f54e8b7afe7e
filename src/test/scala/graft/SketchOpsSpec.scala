package graft

import graft.operators.SketchOps

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
}
