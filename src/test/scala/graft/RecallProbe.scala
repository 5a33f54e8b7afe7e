package graft

import graft.operators.SimilarityOps
import graft.sources.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev probe (test scope, never shipped): measures per-tier ANN recall on
  * the real testdata at each SF, to size the registered recall floors
  * just below measured (r8 judge ask: floors within 0.1 of measured).
  * Run: sbt "Test/runMain graft.RecallProbe"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    val K = SimilarityOps.K

    def stats(tier: String, sf: String, exact: DataFrame, approx: DataFrame): Unit = {
      val hits = exact.select($"query_id", $"neighbor_id")
        .join(approx.select($"query_id", $"neighbor_id"),
          Seq("query_id", "neighbor_id"))
        .groupBy($"query_id").agg(count(lit(1)).as("n_hits"))
      val perQ = exact.select($"query_id").distinct()
        .join(hits, Seq("query_id"), "left")
        .select(coalesce($"n_hits", lit(0L)))
        .as[Long].collect()
      val mean = perQ.map(_.toDouble / K).sum / perQ.length
      println(f"$sf%-8s $tier%-3s mean=$mean%.3f minHits=${perQ.min} nQueries=${perQ.length}")
    }

    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val exact = SimilarityOps.s1CosineTopk(spark, dir)
      stats("s2", sf, exact, SimilarityOps.s2AnnIvf(spark, dir))
      stats("s5", sf, exact, SimilarityOps.s5PqRerank(spark, dir))
      stats("s7", sf, exact, SimilarityOps.s7IvfPq(spark, dir))
      // s4's exact side: brute-force top-K of the registered audit sample
      val emb = Tables.embeddings(spark, dir)
      val sample = emb
        .where(pmod($"vec_id", lit(SimilarityOps.KnnSampleMod)) === 0 &&
          $"vec_id" < SimilarityOps.KnnAuditCap)
        .select($"vec_id".as("query_id"), $"embedding".as("q_emb"))
      val sims = emb.select($"vec_id".as("neighbor_id"), $"embedding".as("c_emb"))
        .crossJoin(sample)
        .where($"neighbor_id" =!= $"query_id")
        .select($"query_id", $"neighbor_id",
          round(SimilarityOps.cosineCol($"q_emb", $"c_emb"), 6).as("cos_sim"))
      val w = Window.partitionBy($"query_id")
        .orderBy($"cos_sim".desc, $"neighbor_id".asc)
      val s4exact = sims.withColumn("rnk", row_number().over(w))
        .where($"rnk" <= K)
      stats("s4", sf, s4exact, SimilarityOps.s4KnnJoin(spark, dir))
      // s3: single query — report its hit count
      stats("s3", sf, exact.where($"query_id" === 0),
        SimilarityOps.s3AnnCellPruned(spark, dir))
    }
    spark.stop()
  }
}
