package graft

import graft.operators.DedupOps
import graft.operators.DedupOps.{MinHash, SimHash}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based evidence for the dedup kernels' mathematical claims —
  * the statements the operators' docstrings make (estimator accuracy,
  * metric axioms, banding recall) checked over generated inputs, not just
  * hand-picked goldens. Generators are driven with fixed seeds so every
  * run checks the identical 200-case sample (no flaky statistics). */
class DedupPropertySpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int = 200, seed: Long = 1234L): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private val tokenSet: Gen[Seq[String]] =
    Gen.chooseNum(5, 120).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0, 100000).map(i => s"tok$i")).map(_.distinct))

  test("jaccardExact: symmetric, bounded, identity (200 generated pairs)") {
    val pairs = samples(Gen.zip(tokenSet, tokenSet))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      val jab = DedupOps.jaccardExact(a, b)
      assert(jab === DedupOps.jaccardExact(b, a))
      assert(jab >= 0.0 && jab <= 1.0)
      assert(DedupOps.jaccardExact(a, a) === 1.0)
    }
  }

  test("MinHash estimator tracks exact jaccard within 4 standard errors") {
    // se = sqrt(j(1-j)/128) <= 0.0442; bound 4*se — per-case failure
    // probability ~6e-5, and deterministic here because inputs are seeded.
    val cases = samples(Gen.zip(tokenSet, Gen.chooseNum(0, 100)))
      .filter(_._1.size >= 10)
    assert(cases.size > 100)
    cases.foreach { case (base, overlapPct) =>
      val keep = (base.size * overlapPct) / 100
      val other = base.take(keep) ++ (0 until (base.size - keep)).map(i => s"x$i")
      val s1 = MinHash.signature(base)
      val s2 = MinHash.signature(other)
      val est = s1.zip(s2).count { case (x, y) => x == y }.toDouble / s1.length
      val exact = DedupOps.jaccardExact(base, other)
      val se = math.sqrt(exact * (1 - exact) / s1.length)
      assert(math.abs(est - exact) <= 4 * se + 1e-9,
        s"est=$est exact=$exact se=$se")
    }
  }

  test("SimHash fingerprint: order-invariant, 60-bit") {
    val rng = new scala.util.Random(5L)
    samples(tokenSet).foreach { ts =>
      val fp1 = SimHash.fingerprintRef(ts)
      val fp2 = SimHash.fingerprintRef(rng.shuffle(ts))
      assert(fp1 === fp2) // set semantics — input order must not matter
      assert(fp1 >= 0L && fp1 < (1L << 60))
    }
  }

  test("shingles column equals a Scala sliding-window recount on generated texts") {
    // Guards the zip_with-fold formulation (the transform-lambda original
    // was quadratic): whatever the plan shape, the OUTPUT contract is
    // distinct n-gram strings in first-occurrence order, whole text as
    // fallback below n tokens.
    val spark = TestSpark.spark
    import spark.implicits._
    val text: Gen[String] = Gen.chooseNum(1, 40).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "cc", "dd", "tok", "x1"))
        .map(_.mkString(" ")))
    val texts = samples(text, n = 120).distinct
    assert(texts.size > 50)
    for (n <- Seq(2, 3, 5)) {
      val got = texts.toDF("text")
        .select($"text", DedupOps.shingles($"text", n).as("sh"))
        .as[(String, Seq[String])].collect().toMap
      texts.foreach { t =>
        val w = t.split(" ", -1)
        val expect =
          if (w.length >= n) w.sliding(n).map(_.mkString(" ")).toSeq.distinct
          else Seq(t)
        assert(got(t) === expect, s"n=$n text='$t'")
      }
    }
  }

  test("SimHash pigeonhole: hamming <= 3 pairs always share a two-block table key") {
    val fpAndFlips = Gen.zip(
      Gen.chooseNum(Long.MinValue, Long.MaxValue).map(_ & ((1L << 60) - 1)),
      Gen.chooseNum(0, SimHash.HammingMax)
        .flatMap(k => Gen.listOfN(k, Gen.chooseNum(0, 59))))
    def keys(f: Long): Set[(Int, Long)] = SimHash.tables.zipWithIndex.map {
      case ((i, j), t) =>
        val bi = (f >>> (i * SimHash.BlockBits)) & ((1L << SimHash.BlockBits) - 1)
        val bj = (f >>> (j * SimHash.BlockBits)) & ((1L << SimHash.BlockBits) - 1)
        (t, bi * (1L << SimHash.BlockBits) + bj)
    }.toSet
    samples(fpAndFlips, n = 500).foreach { case (fp, bits) =>
      val fp2 = bits.foldLeft(fp)((f, b) => f ^ (1L << b))
      assert(SimHash.hamming(fp, fp2) <= SimHash.HammingMax)
      assert(keys(fp).intersect(keys(fp2)).nonEmpty,
        f"no shared table key for fp=$fp%x flips=$bits")
    }
  }
}
