package graft
import org.apache.spark.sql.functions._
import graft.operators.DedupOps
object Diag {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count()
    def time[T](label: String)(f: => T): T = { val t0=System.nanoTime; val r=f; println(f"$label: ${(System.nanoTime-t0)/1e9}%.2f s"); r }
    // stage profile of d4
    val th = transform(split(col("text"), " "), t => xxhash64(t))
    val m = size(th) - lit(2)
    val tri = zip_with(
      zip_with(slice(th, lit(1), m), slice(th, lit(2), m), (a, b) => xxhash64(a, b)),
      slice(th, lit(3), m), (p, c) => xxhash64(p, c))
    val hsDf = docs.select(col("doc_id"),
      when(size(th) >= 3, array_distinct(tri)).otherwise(array(xxhash64(col("text")))).as("hs"))
    for (i <- 1 to 2) time(s"a hs pass #$i")(hsDf.select(sum(size($"hs"))).collect())
    val sh = hsDf.select($"doc_id", explode($"hs").as("h"))
    for (i <- 1 to 2) time(s"b explode count #$i")(sh.count())
    val sz = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    for (i <- 1 to 2) time(s"c sz agg #$i")(sz.count())
    val shared = sh.as("a").join(sh.as("b"),
        $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("c"))
    for (i <- 1 to 2) time(s"d shared join #$i")(shared.count())
    for (i <- 1 to 2) time(s"e full d4 #$i")(DedupOps.d4NgramJaccard(spark, dir).count())
    spark.stop()
  }
}
