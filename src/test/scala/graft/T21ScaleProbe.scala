package graft

import graft.operators.SimilarityOps
import graft.sources.Tables
import org.apache.spark.sql.SparkSession

/** Dev probe (test scope, never shipped): times t21's two paths head to
  * head on a scale replica, to size [[SimilarityOps.EvalBroadcastCap]]
  * from measurement rather than guesswork (the m10 pre-ship-probe
  * discipline). Run after a ScaleBench build:
  *   sbt "Test/runMain graft.T21ScaleProbe /root/repo/target/scale80x"
  */
object T21ScaleProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scale80x")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("t21-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.embeddings(spark, dir)
    println(s"N=${emb.count()}")
    def time(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = f
      df.write.format("noop").mode("overwrite").save()
      println(f"$label%-10s ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    val k = SimilarityOps.ivfK(SimilarityOps.corpusCount(spark, dir))
    val cents = SimilarityOps.centroidsFor(spark, dir, k)
    println(s"k=$k")
    time("broadcast")(SimilarityOps.semanticDecontOf(emb))
    time("probe")(SimilarityOps.semanticDecontProbe(emb, cents))
    time("broadcast")(SimilarityOps.semanticDecontOf(emb))
    time("probe")(SimilarityOps.semanticDecontProbe(emb, cents))
    // pruning power on this corpus: candidates vs the full cross size
    val (cand, evCells) = SimilarityOps.semanticProbePlan(emb, cents)
    val nc = cand.join(evCells.select("cell").groupBy("cell").count(), Seq("cell"))
      .selectExpr("sum(count)").collect()(0).getLong(0)
    val nEv = evCells.count(); val nTr = emb.count() - nEv
    println(f"pairs: probed=$nc full=${nTr * nEv} ratio=${nc.toDouble / (nTr * nEv)}%.3f")
    spark.stop()
  }
}
