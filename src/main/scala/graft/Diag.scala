package graft
import graft.operators.DedupOps
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    spark.read.parquet(s"$dir/documents.parquet").count()
    def time[T](label: String)(f: => T): T = { val t0=System.nanoTime; val r=f; println(f"$label: ${(System.nanoTime-t0)/1e9}%.2f s"); r }
    for (i <- 1 to 2) println(s"d2#$i rows=" + time(s"d2#$i")(DedupOps.d2MinhashLsh(spark, dir).count()))
    for (i <- 1 to 2) println(s"d3#$i rows=" + time(s"d3#$i")(DedupOps.d3SimhashNeardup(spark, dir).count()))
    for (i <- 1 to 2) println(s"d4#$i rows=" + time(s"d4#$i")(DedupOps.d4NgramJaccard(spark, dir).count()))
    for (i <- 1 to 2) println(s"d5#$i rows=" + time(s"d5#$i")(DedupOps.d5EmbeddingNeardup(spark, dir).count()))
    spark.stop()
  }
}
