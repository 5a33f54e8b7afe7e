package graft

import graft.operators.{DedupOps, PipelineOps, TextOps}
import org.apache.spark.sql.functions._

class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  test("e1: disposition equals the conjunction of its component queries") {
    val got = PipelineOps.e1Pipeline(spark, sf)
      .as[(Long, Boolean, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val dedup = DedupOps.d6DedupKeep(spark, sf)
      .as[(Long, Boolean)].collect().toMap
    val quality = TextOps.t3QualityScore(spark, sf)
      .select($"doc_id", $"keep").as[(Long, Boolean)].collect().toMap
    val rep = TextOps.t7Repetition(spark, sf)
      .select($"doc_id", $"repetitive").as[(Long, Boolean)].collect().toMap
    val splits = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"source").as[(Long, String)].collect().map(_._1)

    assert(got.keySet === splits.toSet)
    splits.foreach { id =>
      val expectKeep = dedup(id) && quality(id) && !rep(id)
      assert(got(id)._1 === expectKeep, s"doc $id keep")
      if (expectKeep) assert(Set("train", "val", "test")(got(id)._2), s"doc $id split")
      else assert(got(id)._2 === "dropped", s"doc $id split")
    }
    // the pipeline must actually drop something AND keep something here —
    // a corpus where either side is empty would make this test vacuous
    assert(got.values.exists(_._1) && got.values.exists(!_._1))
  }

  test("e1: kept docs land in the same split t6 assigns their id") {
    val byId = PipelineOps.e1Pipeline(spark, sf)
      .where($"keep")
      .select($"doc_id", $"split")
      .as[(Long, String)].collect()
    assert(byId.nonEmpty)
    val t6 = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", TextOps.splitExpr($"doc_id").as("s"))
      .as[(Long, String)].collect().toMap
    byId.foreach { case (id, s) => assert(s === t6(id), s"doc $id") }
  }
}
