// Measure s2 IVF mean recall@5 vs quantizer size k on a scale corpus —
// the recall side of the k-pinning trade (SCALING.md). Dev tooling; run
// after `sbt -batch compile` via:
//
//   /opt/spark/bin/spark-shell --master "local[16]" \
//     --driver-class-path target/scala-2.13/classes \
//     --conf spark.ui.enabled=false \
//     --conf spark.sql.shuffle.partitions=16 -I dev/recall_vs_k.sc
//
// Set RECALL_DIR to the corpus (default target/scale40x). Each k trains
// its own quantizer (memoized per (dir, k)) and probes nprobe = ceil(k/4)
// cells — the FIXED probe ratio, so the measured delta is the cap's cost
// alone, not a probe-budget change.
import org.apache.spark.sql.functions._

// NOTE: single-line vals — the REPL's -I mode treats a leading-dot line
// as a continuation of the PREVIOUS RESULT, so a split chain on its own
// line would leave `ks` bound to the raw string (and a for over a String
// iterates chars — k = 44..57 char codes, 20 silent nonsense runs).
val dir = sys.env.getOrElse("RECALL_DIR", "target/scale40x")
val ks: Seq[Int] = sys.env.getOrElse("RECALL_KS", "64,96,142,200,283").split(",").map(_.trim.toInt).toSeq

def topk(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] = {
  import df.sparkSession.implicits._
  df.select($"query_id", $"neighbor_id").as[(Long, Long)]
    .collect().groupBy(_._1).map { case (q, a) => q -> a.map(_._2).toSet }
}

val exact = topk(graft.operators.SimilarityOps.s1CosineTopk(spark, dir))
println(s"RECALL corpus=$dir queries=${exact.size}")
for (k <- ks) {
  val nprobe = math.max(4, (k + 3) / 4)
  val t0 = System.nanoTime()
  val approx = topk(graft.operators.SimilarityOps.s2AnnIvf(spark, dir, k, nprobe))
  val sec = (System.nanoTime() - t0) / 1e9
  val recalls = exact.map { case (q, t) =>
    approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size }
  println(f"RECALL k=$k%4d nprobe=$nprobe%3d mean=${recalls.sum / recalls.size}%.3f " +
    f"min=${recalls.min}%.2f zero_hit=${recalls.count(_ == 0.0)}%d wall=$sec%.1fs")
}
System.exit(0)
