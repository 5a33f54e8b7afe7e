// Plan audit for the round-8 operators (dev tooling; spark-shell -I).
val dir = "/root/testdata/sf0.01"
def audit(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
  val p = df.queryExecution.executedPlan.toString
  val nEx = "Exchange".r.findAllIn(p).length
  val nReuse = "ReusedExchange".r.findAllIn(p).length
  val nScan = "Scan parquet".r.findAllIn(p).length
  val nBhj = "BroadcastHashJoin".r.findAllIn(p).length
  val nSmj = "SortMergeJoin".r.findAllIn(p).length
  println(s"AUDIT $name: exchanges=$nEx reused=$nReuse scans=$nScan bhj=$nBhj smj=$nSmj")
}
audit("t12", graft.operators.TextOps.t12Boilerplate(spark, dir))
audit("d9", graft.operators.DedupOps.d9EmbeddingClusterDedup(spark, dir))
audit("st9", graft.streaming.StreamingOps.st9StreamNearDupScreen(spark, dir))
audit("s7", graft.operators.SimilarityOps.s7IvfPq(spark, dir))
println("AUDIT t12 full plan:")
println(graft.operators.TextOps.t12Boilerplate(spark, dir).queryExecution.executedPlan.toString.take(4000))
System.exit(0)
