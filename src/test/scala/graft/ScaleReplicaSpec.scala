package graft

import org.apache.spark.sql.functions._

/** Pins the scale-replica embedding transform ([[ScaleBench.copyTransform]]):
  * every copy's map must be orthogonal (norm- and within-copy-cosine-
  * preserving, so planted near-dup structure replicates exactly) and the
  * copies pairwise distinct (so the ANN tier sees genuinely new points,
  * not exact-duplicate ties). The 80× point of round 10 failed on the raw
  * rotation running out of transforms at copy = dim — this spec covers
  * the full supported 0..127 range so that can't regress silently.
  */
class ScaleReplicaSpec extends SparkSpec {
  import spark.implicits._

  test("copyTransform: orthogonal per copy, distinct across copies 0..127") {
    val dim = 64
    val rng = new scala.util.Random(7L)
    val a = Array.fill(dim)(rng.nextGaussian().toFloat)
    val b = a.zipWithIndex.map { case (x, i) => if (i == 0) x + 0.01f else x }
    val copies = (0 until 128).map(_.toLong)
    val rows = copies.flatMap(c => Seq((c, "a", a.toSeq), (c, "b", b.toSeq)))
      .toDF("copy", "which", "embedding")
    val out = rows
      .withColumn("t", ScaleBench.copyTransform($"embedding", $"copy"))
      .select($"copy", $"which", $"t")
      .as[(Long, String, Seq[Float])].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3.toArray).toMap).toMap

    def dot(x: Array[Float], y: Array[Float]): Double =
      x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
    val normA = math.sqrt(dot(a, a))
    val cosAB = dot(a, b) / (normA * math.sqrt(dot(b, b)))

    for (c <- copies) {
      val ta = out(c)("a"); val tb = out(c)("b")
      assert(ta.length === dim)
      assert(math.abs(math.sqrt(dot(ta, ta)) - normA) < 1e-5,
        s"copy $c must preserve norms")
      val cosT = dot(ta, tb) / (math.sqrt(dot(ta, ta)) * math.sqrt(dot(tb, tb)))
      assert(math.abs(cosT - cosAB) < 1e-6,
        s"copy $c must preserve within-copy cosines (near-dup structure)")
    }
    // distinctness: the same base vector never maps to (nearly) the same
    // point under two different copies — cross-copy cosine stays well
    // below near-dup range
    val images = copies.map(c => out(c)("a"))
    for (i <- images.indices; j <- (i + 1) until images.length) {
      val cos = dot(images(i), images(j)) /
        (math.sqrt(dot(images(i), images(i))) * math.sqrt(dot(images(j), images(j))))
      assert(cos < 0.9, s"copies $i and $j map the same vector too close (cos=$cos)")
    }
  }
}
