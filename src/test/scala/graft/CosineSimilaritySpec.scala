package graft

import graft.functions.cosineSim
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val vecs = {
    val rng = new scala.util.Random(99L)
    Seq.fill(50)((Array.fill(64)(rng.nextGaussian().toFloat).toSeq,
                  Array.fill(64)(rng.nextGaussian().toFloat).toSeq))
  }

  private def reference(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  test("cosineSim matches the reference fold bit-for-bit (codegen path)") {
    val got = vecs.toDF("a", "b").select(cosineSim($"a", $"b")).as[Double].collect()
    val want = vecs.map { case (a, b) => reference(a, b) }
    got.zip(want).foreach { case (g, w) => assert(g === w) } // exact, no tolerance
  }

  test("cosineSim codegen and interpreted evaluation agree") {
    val df = vecs.toDF("a", "b")
    val gen = df.select(cosineSim($"a", $"b")).as[Double].collect()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interp = df.select(cosineSim($"a", $"b")).as[Double].collect()
      gen.zip(interp).foreach { case (g, i) => assert(g === i) }
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("nearestCells: codegen and interpreted agree, and match an independent argmax") {
    val rng = new scala.util.Random(41L)
    val centroids = Array.fill(13)(Array.fill(16)(rng.nextGaussian()))
    val df = Seq.fill(60)(Seq.fill(16)(rng.nextGaussian().toFloat)).toDF("v")
    def run(): Array[Seq[Int]] =
      df.select(graft.functions.nearestCells($"v", centroids, 4)).as[Seq[Int]].collect()
    val gen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(gen.toSeq === run().toSeq)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // independent reference: full descending sort by (score, cell)
    val vecs = df.as[Seq[Float]].collect()
    val want = vecs.map { v =>
      centroids.zipWithIndex.map { case (c, i) =>
        val dot = v.zip(c).map { case (p, q) => p.toDouble * q }.sum
        (dot / math.sqrt(c.map(x => x * x).sum), i)
      }.sortBy { case (s, i) => (-s, -i) }.take(4).map(_._2).toSeq
    }
    assert(gen.toSeq === want.toSeq)
  }

  test("pqEncodeCodes: codegen and interpreted agree, and match direct argmin distance") {
    val rng = new scala.util.Random(43L)
    val books = Array.fill(4)(Array.fill(8)(Array.fill(4)(rng.nextGaussian())))
    val df = Seq.fill(60)(Seq.fill(16)(rng.nextGaussian().toFloat)).toDF("v")
    def run(): Array[Seq[Int]] =
      df.select(graft.functions.pqEncodeCodes($"v", books)).as[Seq[Int]].collect()
    val gen = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(gen.toSeq === run().toSeq)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    // independent reference: literal argmin of the squared distance
    // (the expression uses the dot − ‖c‖²/2 form; equal argmin on
    // non-degenerate data)
    val vecs = df.as[Seq[Float]].collect()
    val want = vecs.map { v =>
      (0 until 4).map { m =>
        val vm = v.slice(m * 4, m * 4 + 4).map(_.toDouble)
        books(m).zipWithIndex.minBy { case (c, _) =>
          vm.zip(c).map { case (p, q) => (p - q) * (p - q) }.sum
        }._2
      }
    }
    assert(gen.toSeq === want.toSeq)
  }

  test("simhashFingerprint and minhashBandKeys: codegen and interpreted agree") {
    val rng = new scala.util.Random(7L)
    val df = Seq.fill(20)(Seq.fill(40)(rng.nextLong())).toDF("hs")
    def run(): (Array[Long], Array[Seq[Long]]) = (
      df.select(graft.functions.simhashFingerprint($"hs", 60)).as[Long].collect(),
      df.select(graft.functions.minhashBandKeys($"hs", 128, 4)).as[Seq[Long]].collect())
    val (fpGen, mhGen) = run()
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val (fpInt, mhInt) = run()
      assert(fpGen.toSeq === fpInt.toSeq)
      assert(mhGen.toSeq === mhInt.toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    mhGen.foreach(keys => assert(keys.length === 32))
  }

  test("minhashBandKeys: identical sets share all keys; near sets share some") {
    val rng = new scala.util.Random(42L)
    val base = Seq.fill(60)(rng.nextLong())
    val near = base.drop(3) ++ Seq(1L, 2L, 3L)
    val far = Seq.fill(60)(rng.nextLong())
    val df = Seq(base, base, near, far).toDF("hs")
    val keys = df.select(graft.functions.minhashBandKeys($"hs", 128, 4))
      .as[Seq[Long]].collect()
    assert(keys(0) === keys(1))
    assert(keys(0).toSet.intersect(keys(2).toSet).nonEmpty, "near-dup must collide")
    assert(keys(0).toSet.intersect(keys(3).toSet).isEmpty, "unrelated must not")
  }

  test("signLshBandKeys matches the SignLsh reference impl exactly") {
    import graft.operators.DedupOps.SignLsh
    val rng = new scala.util.Random(3L)
    val vs = Seq.fill(20)(Seq.fill(64)(rng.nextGaussian().toFloat))
    val got = vs.toDF("v")
      .select(graft.functions.signLshBandKeys(
        $"v", SignLsh.NumBands, SignLsh.BandBits, SignLsh.Dim, SignLsh.Seed))
      .as[Seq[Long]].collect()
    val want = vs.map(v => SignLsh.bandKeys(v).toSeq)
    assert(got.toSeq === want)
  }

  test("cosineSim handles orthogonal, identical, and null inputs") {
    val df = Seq(
      (Some(Seq(1.0f, 0.0f)), Some(Seq(0.0f, 1.0f))),
      (Some(Seq(2.0f, 2.0f)), Some(Seq(2.0f, 2.0f))),
      (None, Some(Seq(1.0f, 0.0f)))
    ).toDF("a", "b")
    val got = df.select(cosineSim($"a", $"b")).collect().map(r =>
      if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0) === Some(0.0))
    assert(math.abs(got(1).get - 1.0) < 1e-15)
    assert(got(2) === None)
  }
}
