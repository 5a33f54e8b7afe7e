package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import scala.util.hashing.MurmurHash3

/** M3 LLM-data-pipeline tier, dedup family (SURVEY.md §7.2 M4; the driver
  * brief's north star). The reference has no dedup of any kind — its users
  * would write these inside mapper closures; here each is a declarative
  * Spark plan with a DuckDB oracle, designed for the 100 TB case:
  *
  *  - d1 exact dedup groups on a 32-byte content hash, never on the raw
  *    text, so the shuffle carries hashes instead of documents;
  *  - d2 MinHash-LSH is banded — candidates come from an equi-join on
  *    (band, bandKey), NEVER an all-pairs comparison, and only candidate
  *    pairs are exact-verified;
  *  - d3 SimHash uses the same band-join shape over 64-bit fingerprints;
  *  - d4 n-gram Jaccard is the exact kernel: an equi-join on shingles.
  *    It is also the verify step d2/d3 reuse. At 100 TB the headline
  *    operator is d2 (signatures are O(docs), the join is bucketed);
  *    d4 alone inflates on high-document-frequency shingles — mitigate
  *    with a df-cap prune (drop shingles appearing in > K docs; they only
  *    connect already-dissimilar docs) before the self-join;
  *  - d5 embedding near-dup brackets candidates with sign-LSH bands and
  *    verifies exact cosine, same two-phase shape.
  */
object DedupOps {

  /** Word n-gram shingle set as a native (codegen'd) column — no UDF.
    * Documents shorter than n tokens contribute their whole text as the
    * single shingle so every doc has a non-empty set. */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = split(text, " ")
    when(size(w) >= n,
      array_distinct(transform(
        sequence(lit(1), size(w) - lit(n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n))))))
      .otherwise(array(text))
  }

  /** d1: exact dedup. Survivor = min doc_id per content-hash group; every
    * doc is flagged rather than dropped so the lineage (who was a dup of
    * whom) stays queryable. Grouping key is sha2(text) — at 100 TB the
    * shuffle moves 32-byte digests, not documents. */
  def d1ExactDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        ($"doc_id" === min($"doc_id").over(
          Window.partitionBy(sha2($"text", 256)))).as("is_canonical"))
  }

  // DuckDB partitions by the raw text — same groups as sha2(text) absent a
  // SHA-256 collision, and fine at oracle scale.
  private val d1Sql =
    """SELECT doc_id,
      |  doc_id = min(doc_id) OVER (PARTITION BY text) AS is_canonical
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- MinHash

  /** MinHash machinery. 128 two-universal hash functions over shingle base
    * hashes, banded 32×4 for LSH. All parameters seeded/deterministic: the
    * whole pipeline must give identical results on every run (and the
    * driver's oracle compare depends on it).
    *
    * Band math: P(candidate | jaccard j) = 1-(1-j^4)^32 — at the planted
    * near-dup level j≈0.9 the miss probability is ~1e-15, at the verify
    * threshold 0.8 it is ~2e-9, while a j=0.2 pair survives banding with
    * p≈0.05 and is then discarded by the exact verify. Candidates are
    * therefore effectively recall-1 above threshold without ever comparing
    * all pairs. */
  private[graft] object MinHash {
    val NumHashes = 128
    val Rows = 4
    val Bands: Int = NumHashes / Rows // 32
    // One deterministic 64-bit seed per hash function. A linear
    // `(a*x+b) mod p` family is NOT usable here: with 32-bit murmur inputs
    // and a 61-bit prime the product almost never wraps, the map stays
    // monotone in x, and every hash function elects the same argmin — the
    // estimator collapses to ~1. A finalizing mixer (splitmix64) decorrelates
    // the permutations properly.
    private val rng = new scala.util.Random(420042L)
    private val seeds: Array[Long] = Array.fill(NumHashes)(rng.nextLong())

    /** splitmix64 finalizer — full-avalanche 64-bit mix. */
    @inline private def mix64(z0: Long): Long = {
      var z = z0 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }

    def signature(shingleSet: Seq[String]): Array[Long] = {
      val sig = Array.fill(NumHashes)(Long.MaxValue)
      val it = shingleSet.iterator
      while (it.hasNext) {
        val x = MurmurHash3.stringHash(it.next()).toLong & 0xffffffffL
        var i = 0
        while (i < NumHashes) {
          val h = mix64(x ^ seeds(i))
          if (h < sig(i)) sig(i) = h
          i += 1
        }
      }
      sig
    }

    /** One opaque join key per band: band index tagged into the high bits
      * of a murmur over that band's signature rows. */
    def bandKeys(sig: Array[Long]): Array[Long] = {
      Array.tabulate(Bands) { b =>
        var h = MurmurHash3.arraySeed
        var r = 0
        while (r < Rows) {
          val v = sig(b * Rows + r)
          h = MurmurHash3.mix(h, (v ^ (v >>> 32)).toInt)
          r += 1
        }
        (b.toLong << 32) | (MurmurHash3.finalizeHash(h, Rows).toLong & 0xffffffffL)
      }
    }
  }

  /** Exact Jaccard between two shingle sets — the verify kernel. The
    * division is long/long in double, bit-identical to the oracle's
    * CAST(c AS DOUBLE)/(na+nb-c). */
  private[graft] def jaccardExact(a: Seq[String], b: Seq[String]): Double = {
    val sa = a.toSet
    val sb = b.toSet
    val inter = sa.count(sb.contains)
    inter.toDouble / (sa.size + sb.size - inter)
  }

  /** Generic two-phase near-dup: banded candidate join + exact-Jaccard
    * verify. `keyed` must be (doc_id, band, key, shingles).
    *
    * Shuffle discipline: the candidate self-join and the multi-band dedupe
    * move ONLY (id, band, key) — 24 bytes a row — never the shingle
    * arrays. Payloads are re-joined afterwards, once per surviving pair
    * side. At 100 TB this is the difference between shuffling the corpus
    * ~bands times and shuffling an id list. */
  private def verifiedPairs(keyed: DataFrame, threshold: Double): DataFrame = {
    val jac = udf(jaccardExact _)
    val ids = keyed.select(col("doc_id"), col("band"), col("key"))
    val pairs = ids.select(col("doc_id").as("doc_a"), col("band"), col("key"))
      .join(ids.select(col("doc_id").as("doc_b"), col("band"), col("key")),
        Seq("band", "key"))
      .where(col("doc_a") < col("doc_b"))
      // A pair can collide in several bands; dedupe before the (relatively)
      // expensive exact verify.
      .select("doc_a", "doc_b").dropDuplicates("doc_a", "doc_b")
    val sh = keyed.select(col("doc_id"), col("sh")).dropDuplicates("doc_id")
    pairs
      .join(sh.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sh.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .withColumn("jaccard", jac(col("sh_a"), col("sh_b")))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** d2: MinHash-LSH near-duplicate pairs, exact-verified at j ≥ 0.8.
    * Signatures are one narrow pass over each document (O(n) total);
    * candidates come from the banded equi-join; only candidates pay the
    * exact set comparison. This is the 100 TB dedup path. */
  def d2MinhashLsh(s: SparkSession, dir: String): DataFrame = {
    val bandUdf = udf((sh: Seq[String]) => MinHash.bandKeys(MinHash.signature(sh)))
    val keyed = Tables.documents(s, dir)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .select(col("doc_id"), col("sh"),
        posexplode(bandUdf(col("sh"))).as(Seq("band", "key")))
    verifiedPairs(keyed, 0.8)
  }

  /** Shared oracle for the verified near-dup family: exact shingle-join
    * Jaccard over all pairs (the oracle may brute-force; the engine must
    * not). */
  private def jaccardPairsSql(threshold: Double): String =
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, s FROM toks,
       |  UNNEST(CASE WHEN len(w) >= 3
       |    THEN list_transform(generate_series(1, len(w)-2),
       |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |    ELSE [array_to_string(w, ' ')] END) AS u(s)),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT da AS doc_a, db AS doc_b,
       |  CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
       |FROM inter
       |JOIN sz sa ON da = sa.doc_id
       |JOIN sz sb ON db = sb.doc_id
       |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= $threshold""".stripMargin

  // ---------------------------------------------------------------- SimHash

  /** 64-bit SimHash over the shingle set: each shingle votes ±1 on every
    * bit of its 64-bit hash; fingerprint bit = sign of the tally. Banded
    * 8×8 for candidates. Near-dups at j≈0.9 land at expected Hamming ≈ 6-7
    * of 64, so an 8-bit band matches with high probability; exact-Jaccard
    * verify then removes band-collision noise. */
  private[graft] object SimHash {
    val BandBits = 8
    val NumBands: Int = 64 / BandBits

    def fingerprint(shingleSet: Seq[String]): Long = {
      val acc = new Array[Int](64)
      val it = shingleSet.iterator
      while (it.hasNext) {
        val shingle = it.next()
        val lo = MurmurHash3.stringHash(shingle, 0x9747b28c)
        val hi = MurmurHash3.stringHash(shingle, 0x85ebca6b)
        val h = (hi.toLong << 32) | (lo.toLong & 0xffffffffL)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
          bit += 1
        }
      }
      var fp = 0L
      var bit = 0
      while (bit < 64) {
        if (acc(bit) > 0) fp |= (1L << bit)
        bit += 1
      }
      fp
    }

    def bandKeys(fp: Long): Array[Long] =
      Array.tabulate(NumBands) { b =>
        (b.toLong << 32) | ((fp >>> (b * BandBits)) & ((1L << BandBits) - 1))
      }

    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
  }

  /** d3: SimHash near-duplicate pairs, exact-verified at j ≥ 0.8 — same
    * two-phase shape as d2 with a 64-bit fingerprint instead of a 128-hash
    * signature (8 bytes/doc of state; the cheapest near-dup index). */
  def d3SimhashNeardup(s: SparkSession, dir: String): DataFrame = {
    val bandUdf = udf((sh: Seq[String]) => SimHash.bandKeys(SimHash.fingerprint(sh)))
    val keyed = Tables.documents(s, dir)
      .select(col("doc_id"), shingles(col("text")).as("sh"))
      .select(col("doc_id"), col("sh"),
        posexplode(bandUdf(col("sh"))).as(Seq("band", "key")))
    verifiedPairs(keyed, 0.8)
  }

  /** d4: exact n-gram Jaccard near-dup — the non-approximate kernel, fully
    * native (no UDF anywhere: shingling, join, and the similarity are all
    * codegen'd). Join on shingle, count shared, jaccard = |∩|/|∪|. */
  def d4NgramJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = Tables.documents(s, dir)
      .select($"doc_id", explode(shingles($"text")).as("s"))
    val sz = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val shared = sh.as("a").join(sh.as("b"),
        $"a.s" === $"b.s" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("c"))
    shared
      .join(sz.as("sa"), $"doc_a" === $"sa.doc_id")
      .join(sz.as("sb"), $"doc_b" === $"sb.doc_id")
      .select($"doc_a", $"doc_b",
        ($"c" / ($"sa.n" + $"sb.n" - $"c")).as("jaccard"))
      .where($"jaccard" >= 0.5)
  }

  // ------------------------------------------------- embedding near-dup

  /** Sign-LSH for cosine: 256 seeded random hyperplanes, banded 16×16.
    * P(bit agrees) = 1 - θ/π. Band width is sized for SCALE first: a
    * random pair (θ≈90°) matches a 16-bit band with p = 2^-16 ≈ 1.5e-5,
    * so candidate volume stays ~linear in corpus size instead of
    * quadratic — with narrow 6-bit bands ~40% of ALL pairs collide and
    * the join degenerates to all-pairs at 100 TB. A true near-dup at
    * cos ≥ 0.99 (θ ≤ 8.1°, p_bit ≈ 0.955) matches a band with p ≈ 0.48
    * and misses all 16 with p ≈ 3e-5. Recall at the 0.9 boundary is
    * partial by design (LSH trades boundary recall for linear cost);
    * the exact-verify keeps precision at 1. */
  private[graft] object SignLsh {
    val BandBits = 16
    val NumBands = 16
    val NumBits: Int = BandBits * NumBands
    val Dim = 64
    private val rng = new scala.util.Random(70077L)
    val planes: Array[Array[Double]] =
      Array.fill(NumBits)(Array.fill(Dim)(rng.nextGaussian()))

    def bandKeys(v0: Seq[Float]): Array[Long] = {
      // Spark deserializes Seq UDF args as List — indexed access is O(i),
      // which turns the plane loop quadratic. Copy once, index flat.
      val v = v0.toArray
      val bits = new Array[Boolean](NumBits)
      var k = 0
      while (k < NumBits) {
        var dot = 0.0
        val p = planes(k)
        var i = 0
        while (i < Dim && i < v.length) { dot += p(i) * v(i); i += 1 }
        bits(k) = dot > 0
        k += 1
      }
      Array.tabulate(NumBands) { b =>
        var key = 0L
        var j = 0
        while (j < BandBits) {
          key = (key << 1) | (if (bits(b * BandBits + j)) 1L else 0L)
          j += 1
        }
        (b.toLong << 32) | key
      }
    }

    def cosine(a0: Seq[Float], b0: Seq[Float]): Double = {
      val a = a0.toArray // List-backed UDF args: index arrays, not Seqs
      val b = b0.toArray
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = math.min(a.length, b.length)
      while (i < n) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  /** d5: embedding-cosine near-dup at cos ≥ 0.9 — sign-LSH banded
    * candidates, exact-cosine verify, rounded to 6 dp so the value is
    * representation-stable against the oracle. (This corpus plants no
    * embedding near-dups, so the result is legitimately empty here;
    * DedupOpsSpec proves recall on synthetic near-identical vectors.) */
  def d5EmbeddingNeardup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bandUdf = udf((v: Seq[Float]) => SignLsh.bandKeys(v))
    val cosUdf = udf((a: Seq[Float], b: Seq[Float]) => SignLsh.cosine(a, b))
    val emb = Tables.embeddings(s, dir)
    // id-only candidate join (same shuffle discipline as verifiedPairs)
    val ids = emb.select($"vec_id", posexplode(bandUdf($"embedding")).as(Seq("band", "key")))
    val pairs = ids.select($"vec_id".as("vec_a"), $"band", $"key")
      .join(ids.select($"vec_id".as("vec_b"), $"band", $"key"), Seq("band", "key"))
      .where($"vec_a" < $"vec_b")
      .select("vec_a", "vec_b").dropDuplicates("vec_a", "vec_b")
    pairs
      .join(emb.select($"vec_id".as("vec_a"), $"embedding".as("emb_a")), Seq("vec_a"))
      .join(emb.select($"vec_id".as("vec_b"), $"embedding".as("emb_b")), Seq("vec_b"))
      .withColumn("cos_sim", round(cosUdf($"emb_a", $"emb_b"), 6))
      .where($"cos_sim" >= 0.9)
      .select("vec_a", "vec_b", "cos_sim")
  }

  private val d5Sql =
    """SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
      |  round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                               CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
      |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      |WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
      |                                   CAST(b.embedding AS DOUBLE[])), 6) >= 0.9""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d1_exact_dedup" -> d1ExactDedup _,
    "d2_minhash_lsh" -> d2MinhashLsh _,
    "d3_simhash_neardup" -> d3SimhashNeardup _,
    "d4_ngram_jaccard" -> d4NgramJaccard _,
    "d5_embedding_neardup" -> d5EmbeddingNeardup _)

  val oracleSql: Map[String, String] = Map(
    "d1_exact_dedup" -> d1Sql,
    "d2_minhash_lsh" -> jaccardPairsSql(0.8),
    "d3_simhash_neardup" -> jaccardPairsSql(0.8),
    "d4_ngram_jaccard" -> jaccardPairsSql(0.5),
    "d5_embedding_neardup" -> d5Sql)
}
