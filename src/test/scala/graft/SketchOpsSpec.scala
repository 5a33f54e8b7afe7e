package graft

import graft.operators.SketchOps

class SketchOpsSpec extends SparkSpec {

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
}
