package graft.operators

import graft.Engine
import graft.sources.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's de-facto query corpus (SURVEY.md §2.2) — the concrete
  * computations its POD/tests document — re-expressed Spark-first.
  *
  * Q1 sum/avg/count: t/01_basic.t:17-39 (golden: sum=22000 avg=5.5 num=4000)
  * Q2 prime-sum:     Simple.pm:893-919
  * Q3 matrix inverse per element: Simple.pm:796-811
  * Q4 word-count:    named at Simple.pm:612
  *
  * `q1_agg`/`q2_prime_sum`/`q4_wordcount` are pure DataFrame plans (Catalyst
  * does partial+final aggregation, predicate pushdown, column pruning);
  * `mr_q1_agg`/`mr_prime_sum` run the same computations through the
  * [[graft.Engine]] parity API to tie the map-reduce harness into the
  * correctness gate.
  */
object ReferenceQueries {

  /** Q1: grouped sum/avg/count over lineitem — the reference's flagship
    * aggregate pattern. Catalyst plans partial (map-side) + final
    * HashAggregate automatically; only 6 groups flow through the shuffle. */
  def q1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum($"l_quantity").as("sum_qty"), // integral-valued -> exact in double
        Det.dsum($"l_extendedprice").as("sum_price"),
        (sum($"l_quantity") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("cnt"))
  }

  private val q1AggSql =
    s"""SELECT l_returnflag, l_linestatus,
       |  SUM(l_quantity) AS sum_qty,
       |  ${Det.dsumSql("l_extendedprice")} AS sum_price,
       |  SUM(l_quantity) / COUNT(*) AS avg_qty,
       |  COUNT(*) AS cnt
       |FROM lineitem GROUP BY 1, 2""".stripMargin

  private final case class Partial(sum: Double, num: Long)

  /** Q1 again, but through the exact-parity map-reduce path: per-chunk
    * partial {sum, num}, one local reducer merging partials — precisely the
    * shape of t/01_basic.t:17-39. Driver traffic is one tiny Partial per
    * chunk, so this stays cluster-safe at any scale.
    *
    * Scale note: the mapper consumes the scan's NATURAL partitions — no
    * re-chunking. Chunking is result-invariant (EngineSpec property), so a
    * full-data shuffle before an 8-byte-per-chunk partial would be pure
    * waste; `Engine.chunk` remains an explicit opt-in for callers that need
    * reference chunk-count parity and accept its shuffle cost. */
  def mrQ1Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val qty = Tables.lineitem(s, dir).select($"l_quantity").as[Double]
    val merged = Engine.mapReduce[Double, Partial, Partial](
      qty,
      it => { var sm = 0.0; var n = 0L
              while (it.hasNext) { sm += it.next(); n += 1 }
              Partial(sm, n) },
      parts => parts.reduce((a, b) => Partial(a.sum + b.sum, a.num + b.num)))
    Seq((merged.sum, merged.num, merged.sum / merged.num))
      .toDF("sum_val", "num", "avg_val")
  }

  private val mrQ1AggSql =
    """SELECT CAST(SUM(l_quantity) AS DOUBLE) AS sum_val,
      |  COUNT(*) AS num,
      |  CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*) AS avg_val
      |FROM lineitem""".stripMargin

  private[graft] def isPrime(k: Long): Boolean = {
    if (k < 2) false
    else {
      var d = 2L
      var p = true
      while (p && d * d <= k) { if (k % d == 0) p = false; d += 1 }
      p
    }
  }

  /** Q2: predicate-filter + sum — primality filter over order keys, like the
    * reference's prime-sum showcase (Simple.pm:893-919). The BETWEEN range
    * is pushed down to the parquet scan; the primality UDF runs on the
    * surviving rows only. */
  def q2PrimeSum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val prime = udf(isPrime _)
    Tables.orders(s, dir)
      .select($"o_orderkey".as("k"))
      .where($"k".between(2, 20000))
      .where(prime($"k"))
      .agg(sum($"k").as("prime_sum"), count(lit(1)).as("prime_cnt"))
  }

  // Divisor candidates are the constant relation range(2,142) (141² > 20000);
  // DuckDB 1.0 disallows correlated generate_series arguments, a correlated
  // predicate over a constant range is equivalent.
  private val q2PrimeSumSql =
    """SELECT CAST(SUM(k) AS BIGINT) AS prime_sum, COUNT(*) AS prime_cnt
      |FROM (SELECT o_orderkey AS k FROM orders
      |      WHERE o_orderkey BETWEEN 2 AND 20000) ks
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM range(2, 142) t(d) WHERE d * d <= k AND k % d = 0)""".stripMargin

  /** Q2 through the associative scale path: per-partition prime sums merged
    * with `treeReduce` (Engine.mapReduceAssociative) — executors do the
    * partial merges, the driver sees O(log n) values. */
  def mrPrimeSum(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val keys = Tables.orders(s, dir)
      .select($"o_orderkey")
      .where($"o_orderkey".between(2, 20000))
      .as[Long]
    val (sm, cnt) = Engine.mapReduceAssociative[Long, (Long, Long)](
      keys,
      it => {
        var sm = 0L; var n = 0L
        while (it.hasNext) { val k = it.next(); if (isPrime(k)) { sm += k; n += 1 } }
        (sm, n)
      },
      (a, b) => (a._1 + b._1, a._2 + b._2))
    Seq((sm, cnt)).toDF("prime_sum", "prime_cnt")
  }

  /** Q3: per-element matrix inverse (Simple.pm:796-811, PDL `inv`). Matrices
    * are built deterministically from the embeddings table (first 16 dims →
    * 4×4, diagonal boosted to guarantee invertibility), inverted with an
    * in-partition Gauss-Jordan, and self-checked against M·M⁻¹ = I. Pure
    * narrow map — no shuffle, scales linearly.
    *
    * The oracle is self-contained (full-trace form): alongside the
    * M·M⁻¹ ≈ I boolean it emits `inv_trace` = round(trace(A⁻¹), 6), which
    * DuckDB reproduces in closed form — trace(A⁻¹) = Σᵢ Mᵢᵢ / det(A) with
    * the principal minors and determinant expanded via generated Leibniz
    * SQL ([[q3DetSql]]). A wrong inverse flips the boolean AND the trace
    * values, so the hash check pins the actual numbers, not just the
    * self-check. */
  def q3MatrixInverse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = 4
    val invert = udf { (vec0: Seq[Float]) =>
      val vec = vec0.toArray // Seq UDF args are List-backed; index an array
      val a = Array.tabulate(n, n) { (i, j) =>
        vec(i * n + j).toDouble + (if (i == j) 8.0 else 0.0) }
      val inv = MatrixOps.gaussJordanInverse(a)
      (MatrixOps.maxAbsErrorVsIdentity(a, inv) < 1e-9, MatrixOps.trace(inv))
    }
    Tables.embeddings(s, dir)
      .select($"vec_id", invert($"embedding").as("r"))
      .select($"vec_id", $"r._1".as("inv_ok"), round($"r._2", 6).as("inv_trace"))
  }

  /** DuckDB entry expression for A(i,j) = embedding[i*4+j] + 8·[i=j]
    * (1-indexed list extract; FLOAT→DOUBLE cast is exact, matching the
    * Scala side's Float.toDouble). */
  private def q3EntrySql(i: Int, j: Int): String = {
    val e = s"CAST(embedding[${i * 4 + j + 1}] AS DOUBLE)"
    if (i == j) s"($e + 8.0)" else e
  }

  /** Leibniz-expansion determinant SQL over the given row/col index sets
    * (k! signed products — 24 terms for the 4×4, 6 per 3×3 minor). */
  private def q3DetSql(rows: Seq[Int], cols: Seq[Int]): String =
    cols.permutations.map { perm =>
      val inversions = (for {
        a <- perm.indices; b <- a + 1 until perm.length if perm(a) > perm(b)
      } yield 1).sum
      val sign = if (inversions % 2 == 0) "+" else "-"
      val prod = rows.indices.map(r => q3EntrySql(rows(r), perm(r))).mkString(" * ")
      s"$sign $prod"
    }.mkString(" ")

  private val q3MatrixInverseSql = {
    val all = 0 until 4
    val det = q3DetSql(all, all)
    val minors = all
      .map(i => s"(${q3DetSql(all.filterNot(_ == i), all.filterNot(_ == i))})")
      .mkString(" + ")
    s"""SELECT vec_id, true AS inv_ok,
       |  round(($minors) / ($det), 6) AS inv_trace
       |FROM embeddings""".stripMargin
  }

  /** Q4: canonical word-count over documents (Simple.pm:612). explode+split
    * stays in whole-stage codegen; the groupBy shuffles only (word, partial
    * count) pairs thanks to map-side partial aggregation. */
  def q4WordCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("word"))
      .where($"word" =!= "")
      .groupBy($"word")
      .agg(count(lit(1)).as("cnt"))
  }

  private val q4WordCountSql =
    """SELECT w AS word, COUNT(*) AS cnt
      |FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
      |WHERE w <> '' GROUP BY 1""".stripMargin

  /** Q4 through the exact-parity map-reduce path: per-partition word-count
    * HashMap partials, one local reducer merging the maps — the classic
    * MapReduce word-count shape (Simple.pm:612). Driver traffic is one
    * vocabulary-sized map per partition (vocab ≪ corpus; bounded like the
    * reference client). Exercises the groupBy-shaped reducer case. */
  def mrQ4WordCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val words = Tables.documents(s, dir)
      .select(explode(split($"text", " ")).as("word"))
      .where($"word" =!= "")
      .as[String]
    val merged = Engine.mapReduce[String, Map[String, Long], Map[String, Long]](
      words,
      it => {
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        while (it.hasNext) { val w = it.next(); m.update(w, m.getOrElse(w, 0L) + 1L) }
        m.toMap
      },
      parts => parts.foldLeft(Map.empty[String, Long]) { (acc, m) =>
        m.foldLeft(acc) { case (a, (w, c)) => a.updated(w, a.getOrElse(w, 0L) + c) }
      })
    merged.toSeq.toDF("word", "cnt")
  }

  /** Q3 through the exact-parity path with the reference's IDENTITY reducer
    * (Simple.pm:808-811: `sub { return $_[0]; }` — concatenate chunk
    * outputs). This is the one documented non-associative-shape reducer:
    * the driver must see every chunk's output, exactly like the reference
    * client. Map outputs here are (vec_id, inv_ok) pairs — small summaries,
    * the documented bound for this API. */
  def mrQ3MatrixInverse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = 4
    val rows = Engine.mapReduce[(Long, Seq[Float]), Seq[(Long, Boolean, Double)], Seq[(Long, Boolean, Double)]](
      Tables.embeddings(s, dir).select($"vec_id", $"embedding").as[(Long, Seq[Float])],
      it => it.map { case (id, vec0) =>
        val vec = vec0.toArray
        val a = Array.tabulate(n, n) { (i, j) =>
          vec(i * n + j).toDouble + (if (i == j) 8.0 else 0.0) }
        val inv = MatrixOps.gaussJordanInverse(a)
        (id, MatrixOps.maxAbsErrorVsIdentity(a, inv) < 1e-9, MatrixOps.trace(inv))
      }.toSeq,
      parts => parts.flatten)
    rows.toDF("vec_id", "inv_ok", "raw_trace")
      .select($"vec_id", $"inv_ok", round($"raw_trace", 6).as("inv_trace"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> q1Agg _,
    "mr_q1_agg" -> mrQ1Agg _,
    "q2_prime_sum" -> q2PrimeSum _,
    "mr_prime_sum" -> mrPrimeSum _,
    "q3_matrix_inverse" -> q3MatrixInverse _,
    "mr_q3_matrix_inverse" -> mrQ3MatrixInverse _,
    "q4_wordcount" -> q4WordCount _,
    "mr_q4_wordcount" -> mrQ4WordCount _)

  val oracleSql: Map[String, String] = Map(
    "q1_agg" -> q1AggSql,
    "mr_q1_agg" -> mrQ1AggSql,
    "q2_prime_sum" -> q2PrimeSumSql,
    "mr_prime_sum" -> q2PrimeSumSql,
    "q3_matrix_inverse" -> q3MatrixInverseSql,
    "mr_q3_matrix_inverse" -> q3MatrixInverseSql,
    "q4_wordcount" -> q4WordCountSql,
    "mr_q4_wordcount" -> q4WordCountSql)
}

/** Small dense-matrix helpers for Q3 (no external linalg dependency). */
private[graft] object MatrixOps {
  /** In-place Gauss-Jordan with partial pivoting; input is copied. */
  def gaussJordanInverse(m: Array[Array[Double]]): Array[Array[Double]] = {
    val n = m.length
    val a = Array.tabulate(n, 2 * n) { (i, j) =>
      if (j < n) m(i)(j) else if (j - n == i) 1.0 else 0.0 }
    var col = 0
    while (col < n) {
      var piv = col
      var i = col + 1
      while (i < n) { if (math.abs(a(i)(col)) > math.abs(a(piv)(col))) piv = i; i += 1 }
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val d = a(col)(col)
      var j = 0
      while (j < 2 * n) { a(col)(j) /= d; j += 1 }
      i = 0
      while (i < n) {
        if (i != col) {
          val f = a(i)(col)
          j = 0
          while (j < 2 * n) { a(i)(j) -= f * a(col)(j); j += 1 }
        }
        i += 1
      }
      col += 1
    }
    Array.tabulate(n, n)((i, j) => a(i)(n + j))
  }

  def trace(m: Array[Array[Double]]): Double = {
    var t = 0.0
    var i = 0
    while (i < m.length) { t += m(i)(i); i += 1 }
    t
  }

  def maxAbsErrorVsIdentity(
      m: Array[Array[Double]], inv: Array[Array[Double]]): Double = {
    val n = m.length
    var err = 0.0
    var i = 0
    while (i < n) {
      var j = 0
      while (j < n) {
        var s = 0.0
        var k = 0
        while (k < n) { s += m(i)(k) * inv(k)(j); k += 1 }
        val expect = if (i == j) 1.0 else 0.0
        err = math.max(err, math.abs(s - expect))
        j += 1
      }
      i += 1
    }
    err
  }
}
