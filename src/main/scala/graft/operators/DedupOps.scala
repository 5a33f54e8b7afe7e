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
  *  - d3 SimHash is the high-precision tier: Hamming ≤ 3 over 60-bit
  *    md5-derived fingerprints (native SQL end-to-end, oracle-checkable),
  *    candidates pigeonhole-guaranteed by two-block 24-bit table keys;
  *  - d4 n-gram Jaccard is the exact kernel: an inverted-index equi-join
  *    on 64-bit trigram hashes. At 100 TB the headline operator is d2
  *    (signatures are O(docs), the join is bucketed); d4's Σdf² join
  *    volume inflates on Zipfian trigram skew — [[d4PrefixJaccard]] is
  *    the implemented prefix-filter switch for that regime (bounded
  *    candidates spec-proven under a planted hot trigram);
  *  - d5 embedding near-dup brackets candidates with sign-LSH bands and
  *    verifies exact cosine, same two-phase shape.
  */
object DedupOps {

  /** Word n-gram shingle set as a native (codegen'd) column — no UDF.
    * Documents shorter than n tokens contribute their whole text as the
    * single shingle so every doc has a non-empty set.
    *
    * Built as a zip_with fold over n shifted slices of the token array,
    * NOT `transform(sequence(...), i -> concat_ws(slice(w, i, n)))`: in
    * the lambda form the token-array subtree is re-evaluated per element
    * (the CollapseProject trap that made trigram hashing quadratic, see
    * [[withShingleHashes]]) — measured 3.3× slower at sf0.1 with
    * byte-identical output. */
  def shingles(text: Column, n: Int = 3): Column = {
    val w = split(text, " ")
    val m = size(w) - lit(n - 1)
    val grams = (2 to n).foldLeft(slice(w, lit(1), m)) { (acc, j) =>
      zip_with(acc, slice(w, lit(j), m), (p, c) => concat(p, lit(" "), c))
    }
    when(size(w) >= n, array_distinct(grams)).otherwise(array(text))
  }

  /** [[shingles]] WITHOUT the distinct — grams in position order, so
    * `posexplode` recovers each gram's 0-based token start. Same
    * zip_with ladder (no per-element token-array re-eval), same
    * whole-text fallback below n words (one pseudo-gram at pos 0).
    * Shared by t19's surgical decontamination, which needs WHERE a
    * gram hit, not just whether. */
  private[graft] def posGrams(text: Column, n: Int): Column = {
    val w = split(text, " ")
    val m = size(w) - lit(n - 1)
    val grams = (2 to n).foldLeft(slice(w, lit(1), m)) { (acc, j) =>
      zip_with(acc, slice(w, lit(j), m), (p, c) => concat(p, lit(" "), c))
    }
    when(size(w) >= n, grams).otherwise(array(text))
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

  /** d1n: exact dedup over the NORMALIZED text — d1's keep rule keyed on
    * [[graft.functions.normalizeText]] (t25's NFC + mark-strip +
    * whitespace-collapse kernel) instead of raw bytes, closing CCNet's
    * normalize-then-hash gap: the NFC and NFD spellings of one document
    * are byte-different, so d1 can never group them, while their
    * normalized forms are identical. Runs over t25's derived messy twin
    * ([[TextNorm.messyTextExprSql]] — the fixture is pure ASCII, so the
    * un-normalized collisions d1n exists to catch are planted by the
    * same one-spelling derivation both engines splice): raw-text dup
    * groups whose members landed in the combining-mark class (doc_id%3=0)
    * and the precomposed class (doc_id%3=1) re-converge here, and the
    * DedupOpsSpec NFD-twin plant pins the semantics directly.
    *
    * Scale shape: derivation + normalization are one narrow codegen'd
    * projection; the keep-bit window is d1's exact geometry keyed on the
    * 32-char md5 of the normalized text — the exchange moves digests,
    * never documents. */
  def d1nNormalizedDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        md5(graft.functions.normalizeText(
          expr(TextNorm.messyTextExprSql))).as("norm_sig"))
      .select($"doc_id", $"norm_sig",
        ($"doc_id" === min($"doc_id").over(
          Window.partitionBy($"norm_sig"))).as("is_canonical"))
  }

  private lazy val d1nSql =
    s"""WITH m1n AS (
       |  SELECT doc_id, ${TextNorm.messyTextExprSql} AS messy FROM documents),
       |n1n AS (
       |  SELECT doc_id, md5(${TextNorm.normSqlOf("messy")}) AS norm_sig
       |  FROM m1n)
       |SELECT doc_id, norm_sig,
       |  doc_id = min(doc_id) OVER (PARTITION BY norm_sig) AS is_canonical
       |FROM n1n""".stripMargin

  // ---------------------------------------------------------------- MinHash

  /** MinHash design constants + reference Scala implementation (the
    * operator itself runs the codegen'd [[graft.functions.minhashBandKeys]]
    * expression; DedupOpsSpec keeps this impl honest as the estimator
    * ground truth). 128 hash functions over shingle base hashes, banded
    * 32×4 for LSH. All parameters seeded/deterministic: the whole pipeline
    * must give identical results on every run (and the driver's oracle
    * compare depends on it).
    *
    * Band math: P(candidate | jaccard j) = 1-(1-j^4)^32 — at the planted
    * near-dup level j≈0.9 the miss probability is ~1.5e-15, at the verify
    * threshold 0.8 it is ~4.7e-8, while a j=0.2 pair survives banding with
    * p≈0.05 and is then discarded by the exact verify. Candidates are
    * therefore effectively recall-1 above threshold without ever comparing
    * all pairs. */
  private[graft] object MinHash {
    val NumHashes = 128
    val Rows = 4
    val Bands: Int = NumHashes / Rows // 32
    // Seeds and mixer come from the ONE shared home
    // (graftext.GraftMix) so this reference impl and the codegen'd
    // expression cannot drift apart. A linear `(a*x+b) mod p` family is
    // NOT usable here: the map stays monotone in x and every hash
    // function elects the same argmin — the estimator collapses to ~1;
    // the splitmix64 finalizer decorrelates the permutations properly.
    private val seeds: Array[Long] =
      org.apache.spark.sql.graftext.GraftMix.seeds(NumHashes)

    @inline private def mix64(z: Long): Long =
      org.apache.spark.sql.graftext.GraftMix.splitmix64(z)

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

  /** Exact Jaccard between two shingle sets — reference implementation of
    * the verify kernel (the operators run the native array_intersect form
    * in [[verifyPairs]]; specs use this to compute ground truth). The
    * division is long/long in double, bit-identical to the oracle's
    * CAST(c AS DOUBLE)/(na+nb-c). */
  private[graft] def jaccardExact(a: Seq[String], b: Seq[String]): Double = {
    val sa = a.toSet
    val sb = b.toSet
    val inter = sa.count(sb.contains)
    inter.toDouble / (sa.size + sb.size - inter)
  }

  /** Candidate pairs from banded keys. `keyed` must be (doc_id, band,
    * key): each bucket is grouped ONCE (a band-key SELF-join would
    * recompute the signature subtree once per side) and pairs are
    * generated inside the bucket with native collection functions
    * (codegen'd, no UDF), then deduped — a pair can collide in several
    * bands. The only wide exchange over the corpus moves (doc_id, band,
    * key) — 24 bytes a row, never shingle arrays. */
  private def bucketPairs(keyed: DataFrame): DataFrame = keyed
    .groupBy(col("band"), col("key"))
    .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
    .where(size(col("ids")) >= 2)
    // ids ascending, so doc_a < doc_b by construction.
    .select(explode(expr(
      "flatten(transform(ids, (x, i) -> " +
        "transform(slice(ids, i + 2, size(ids) - i - 1), " +
        "y -> struct(x AS doc_a, y AS doc_b))))")).as("p"))
    .select(col("p.doc_a"), col("p.doc_b"))
    .dropDuplicates("doc_a", "doc_b")

  /** Exact-Jaccard verify of candidate pairs (doc_a, doc_b) against the
    * j ≥ threshold contract.
    *
    * Shuffle discipline: shingle payloads are computed only for candidate
    * ids (small by LSH design) and joined back per pair side — at 100 TB
    * this is the difference between shuffling the corpus ~bands times and
    * shuffling an id list once. The persist + count() is deliberate (the
    * same eager materialization MLlib's LSH models use): `pairs` is
    * referenced three times (verify join ×2 + candidate-id derivation)
    * and lambda exprIds defeat ReuseExchange, so without it the whole
    * signature pipeline re-executes per reference; the count also gives
    * the optimizer real statistics, so the candidate-id join broadcasts
    * when pairs are small and gracefully shuffles when they are not.
    * Pairs are (long, long) — linear in corpus and orders of magnitude
    * smaller than it, safe to cache at any scale.
    *
    * Contract notes: building the DataFrame therefore RUNS the candidate
    * stage eagerly (like fitting an MLlib model), and the cached pair
    * relation lives until the session ends or `spark.catalog.clearCache()`
    * — one id-pair relation per operator build, not per query execution. */
  private def verifyPairs(docs: DataFrame, pairs0: DataFrame,
                          threshold: Double): DataFrame =
    verifiedSetMetrics(docs, pairs0)
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")

  /** The ONE exact-verify scaffold behind [[verifyPairs]] and the
    * prefix arms: candidate pairs eagerly materialized,
    * shingling AFTER the candidate filter (computing the sets below the
    * join would re-shingle the whole corpus once per pair side), |∩| via
    * native array_intersect over the distinct trigram-hash sets (same
    * values as over the string sets), every set metric emitted —
    * long/long division in double, identical to the oracles' formulas.
    * Consumers filter and project; Catalyst prunes the columns they
    * drop, so the jaccard-only path pays nothing for the containment
    * columns. */
  private def verifiedSetMetrics(docs: DataFrame, pairs0: DataFrame): DataFrame =
    verifiedSetMetricsOn(docs, eagerPairs(pairs0))

  /** Persist + materialize a candidate-pair relation (the eager half of
    * [[verifiedSetMetrics]], exposed so the dir-keyed prefix entry
    * points can memoize THIS relation per corpus fingerprint instead of
    * pinning a fresh copy per invocation). */
  private def eagerPairs(pairs0: DataFrame): DataFrame = {
    val pairs = pairs0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count()
    pairs
  }

  /** The verify scaffold over an ALREADY-materialized pair relation. */
  private def verifiedSetMetricsOn(docs: DataFrame, pairs: DataFrame): DataFrame = {
    val candIds = pairs.select(explode(array(col("doc_a"), col("doc_b")))
      .as("doc_id")).distinct()
    val candSh = withShingleHashes(docs.join(candIds, Seq("doc_id")))
    val inter = size(array_intersect(col("hs_a"), col("hs_b")))
    pairs
      .join(candSh.select(col("doc_id").as("doc_a"), col("hs").as("hs_a")), Seq("doc_a"))
      .join(candSh.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        (inter.cast("double") / size(col("hs_a"))).as("cont_a"),
        (inter.cast("double") / size(col("hs_b"))).as("cont_b"),
        (inter.cast("double") / (size(col("hs_a")) + size(col("hs_b")) - inter))
          .as("jaccard"))
  }

  /** d2: MinHash-LSH near-duplicate pairs, exact-verified at j ≥ 0.8.
    * Signatures are one narrow pass over each document (O(n) total);
    * candidates come from the banded equi-join; only candidates pay the
    * exact set comparison. This is the 100 TB dedup path.
    *
    * UDF-free: trigram sets are the native 64-bit hash arrays of
    * [[withShingleHashes]] (shared with d4), band keys come from the
    * codegen'd [[graft.functions.minhashBandKeys]] expression, and the
    * verify is a native array_intersect — the whole operator stays in
    * whole-stage codegen. */
  /** MinHash-verified near-dup pairs over an arbitrary (doc_id, text)
    * relation — the reusable core of d2 and the pipeline operator d6. */
  private def minhashPairs(docs: DataFrame, threshold: Double): DataFrame = {
    val keyed = withShingleHashes(docs).select(col("doc_id"),
      posexplode(graft.functions.minhashBandKeys(
        col("hs"), MinHash.NumHashes, MinHash.Rows)).as(Seq("band", "key")))
    verifyPairs(docs, bucketPairs(keyed), threshold)
  }

  /** The verified-pair relation, memoized per (session, corpus
    * fingerprint, docs variant): constructing it RUNS the candidate +
    * verify stage eagerly and persists the pairs (see [[verifyPairs]]),
    * so before this memo every query touching the near-dup machinery —
    * d2, d6, d7, and each capstone through them — re-ran an identical
    * LSH pass at build time. A real deployment computes verified pairs
    * once per corpus snapshot and reuses them downstream (the quantizer
    * memo's fit-once discipline applied to the dedup tier); the
    * fingerprint validates the entry, so a corpus rewrite both misses
    * the memo AND evicts the stale pair relation — its persisted RDD
    * blocks are released instead of pinning the JVM lifetime. */
  private val pairMemo =
    new graft.sources.FingerprintMemo[DataFrame](_.unpersist(false))

  private def minhashPairsFor(s: SparkSession, dir: String, variant: String)
      (docs: => DataFrame): DataFrame =
    pairMemo.getOrBuild(s, graft.sources.Layouts.dirTag(dir), variant,
      graft.sources.Layouts.tableFingerprint(dir, "documents"))(
      minhashPairs(docs, 0.8))

  /** Connected-component labels, memoized per (session, corpus
    * fingerprint, graph variant): the CC iteration runs its actions
    * EAGERLY at build time (one localCheckpoint per propagation round),
    * so an unmemoized caller re-labels an identical graph on every
    * construction — same fit-once discipline as [[pairMemo]], and the
    * same fingerprint-validated staleness guard with eviction. */
  private val ccMemo =
    new graft.sources.FingerprintMemo[DataFrame](_.unpersist(false))

  private def ccLabelsFor(s: SparkSession, dir: String, table: String,
      variant: String)(edges: => DataFrame): DataFrame =
    ccMemo.getOrBuild(s,
      graft.sources.Layouts.dirTag(dir) + "#" + table, variant,
      graft.sources.Layouts.tableFingerprint(dir, table))(
      connectedComponents(edges))

  /** `(doc_id, text, canon_id)` with canon_id = the exact-dup group's
    * min doc_id — d1's canonicity as a window ON THE SCAN ITSELF, not a
    * docs⋈d1 self-join: the id rides the same pass that carries the
    * text to the shingler, so each downstream reference costs one
    * corpus scan and one sha2-keyed exchange instead of two scans plus
    * a join (shared by d6 and d7). */
  private def withCanonId(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("text"),
      min(col("doc_id")).over(
        Window.partitionBy(sha2(col("text"), 256))).as("canon_id"))

  def d2MinhashLsh(s: SparkSession, dir: String): DataFrame =
    minhashPairsFor(s, dir, "full")(Tables.documents(s, dir))

  /** The word-trigram shingle relation + per-doc set sizes + the exact
    * shared-shingle pair counts — ONE SQL spelling of the brute-force
    * pair scaffold, shared by [[jaccardPairsSql]] and
    * [[containmentPairsSql]] (the charTrigramsSqlOf lesson: shared
    * fragments, never per-consumer respellings). */
  private[graft] val shinglePairCtesSql =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
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
      |  GROUP BY 1, 2)""".stripMargin

  /** Shared oracle for the verified near-dup family: exact shingle-join
    * Jaccard over all pairs (the oracle may brute-force; the engine must
    * not). */
  private[graft] def jaccardPairsSql(threshold: Double): String =
    s"WITH $shinglePairCtesSql\n" +
    s"""SELECT da AS doc_a, db AS doc_b,
       |  CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
       |FROM inter
       |JOIN sz sa ON da = sa.doc_id
       |JOIN sz sb ON db = sb.doc_id
       |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= $threshold""".stripMargin

  // ---------------------------------------------------------------- SimHash

  /** SimHash design. 60-bit fingerprint over the shingle set: each shingle
    * votes ±1 on every bit of its 60-bit base hash; fingerprint bit = sign
    * of the tally (strict majority, so ties are deterministic zeros).
    *
    * The base hash is the first 15 hex chars of md5(shingle) — a NATIVE
    * column expression in Spark (md5/conv/bit ops, whole-stage codegen, no
    * UDF) that DuckDB reproduces bit-for-bit, which makes the entire
    * operator oracle-checkable, fingerprints included. 60 bits keeps the
    * value positive in a signed BIGINT in both engines.
    *
    * Semantics: d3 detects pairs at Hamming ≤ 3 (the classic web-dedup
    * operating point — SimHash is the cheap high-precision tier; d2
    * MinHash is the recall workhorse for j ≥ 0.8, where true pairs can
    * sit at Hamming 10+ and NO banding of a single fingerprint can
    * guarantee recall). The Hamming bound is part of the contract, not a
    * best-effort: candidates come from C(5,2) = 10 tables keyed by every
    * pair of 12-bit fingerprint blocks, and by pigeonhole ≤ 3 flipped
    * bits leave ≥ 2 blocks clean, so some table key matches — recall 1
    * by construction, with 24-bit keys that keep buckets small (the old
    * single-block 8-bit keys had 256 buckets/band: ~N²/256 candidate
    * pairs — quadratic at any scale). */
  private[graft] object SimHash {
    val Bits = 60
    val BlockBits = 12
    val NumBlocks: Int = Bits / BlockBits // 5
    val HammingMax = 3
    /** Every unordered pair of blocks → one banding table. */
    val tables: Seq[(Int, Int)] =
      for { i <- 0 until NumBlocks; j <- (i + 1) until NumBlocks } yield (i, j)

    /** shingle → 60-bit base hash ([[graft.sources.Hash60]] device), as a
      * native (codegen'd) column. */
    def shingleHash(s: Column): Column =
      graft.sources.Hash60.col60(s.cast("binary"))

    /** (doc_id, sh: array<string>) → (doc_id, fp): per-bit majority votes
      * via the [[graft.functions.simhashFingerprint]] codegen'd expression
      * — a NARROW per-row map. (The first formulation exploded shingles
      * into a 60-sum groupBy: a full corpus shuffle for a value that never
      * needed to leave its row.) */
    def fingerprintCol(docsSh: DataFrame): DataFrame =
      docsSh.select(col("doc_id"),
        graft.functions.simhashFingerprint(
          transform(col("sh"), s => shingleHash(s)), Bits).as("fp"))

    /** Reference Scala implementation (tests only — the operator itself
      * is pure native SQL). */
    def fingerprintRef(shingleSet: Seq[String]): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val acc = new Array[Int](Bits)
      shingleSet.foreach { s =>
        val hex = md.digest(s.getBytes("UTF-8")).take(8)
          .map(b => f"$b%02x").mkString.take(15)
        val h = java.lang.Long.parseLong(hex, 16)
        var bit = 0
        while (bit < Bits) {
          if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
          bit += 1
        }
      }
      (0 until Bits).map(i => if (acc(i) > 0) 1L << i else 0L).reduce(_ | _)
    }

    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
  }

  /** d3: SimHash near-duplicate pairs — Hamming(fp_a, fp_b) ≤ 3 with
    * exact-Jaccard verify at j ≥ 0.8. Fully native until the verify UDF:
    * fingerprint, banding, bucket pair-gen and the Hamming filter are all
    * codegen'd column expressions, and the oracle recomputes the identical
    * fingerprints in DuckDB (brute-force all-pairs — the oracle may; the
    * engine must not). */
  def d3SimhashNeardup(s: SparkSession, dir: String): DataFrame = {
    import SimHash._
    val docs = Tables.documents(s, dir)
    val fp = fingerprintCol(
      docs.select(col("doc_id"), shingles(col("text")).as("sh")))
    val block = (0 until NumBlocks).map(b =>
      shiftright(col("fp"), b * BlockBits).bitwiseAND(lit((1L << BlockBits) - 1)))
    val keyed = fp.select(col("doc_id"), col("fp"),
      posexplode(array(tables.map { case (i, j) =>
        block(i) * lit(1L << BlockBits) + block(j)
      }: _*)).as(Seq("band", "key")))
    // Bucket pair-gen carries the fingerprint so the Hamming ≤ 3 contract
    // is enforced natively inside the bucket, before any shuffle of pairs.
    val pairs = keyed
      .groupBy(col("band"), col("key"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("fp")))).as("xs"))
      .where(size(col("xs")) >= 2)
      .select(explode(expr(
        "flatten(transform(xs, (x, i) -> " +
          "filter(transform(slice(xs, i + 2, size(xs) - i - 1), " +
          "y -> struct(x.doc_id AS doc_a, y.doc_id AS doc_b, x.fp AS fa, y.fp AS fb)), " +
          s"p -> bit_count(p.fa ^ p.fb) <= ${HammingMax})))")).as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    verifyPairs(docs, pairs, 0.8)
  }

  /** Oracle for d3: identical md5-based fingerprints in DuckDB, brute-force
    * Hamming ≤ 3 candidate pairs, exact Jaccard ≥ threshold. */
  private def simhashSql(threshold: Double): String = {
    val fpExpr = (0 until SimHash.Bits).map(i =>
      s"(CASE WHEN 2*sum((h >> $i) & 1) > count(*) THEN ${1L << i} ELSE 0 END)")
      .mkString("\n      + ")
    s"""WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, s FROM toks,
       |  UNNEST(CASE WHEN len(w) >= 3
       |    THEN list_transform(generate_series(1, len(w)-2),
       |                        i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])
       |    ELSE [array_to_string(w, ' ')] END) AS u(s)),
       |hs AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS h FROM sh),
       |fp AS (SELECT doc_id, $fpExpr AS fp FROM hs GROUP BY doc_id),
       |cand AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db
       |  FROM fp a JOIN fp b ON a.doc_id < b.doc_id
       |  WHERE bit_count(xor(a.fp, b.fp)) <= ${SimHash.HammingMax}),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
       |inter AS (
       |  SELECT a.doc_id AS da, b.doc_id AS db, count(*) AS c
       |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT i.da AS doc_a, i.db AS doc_b,
       |  CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
       |FROM inter i
       |JOIN cand ON i.da = cand.da AND i.db = cand.db
       |JOIN sz sa ON i.da = sa.doc_id
       |JOIN sz sb ON i.db = sb.doc_id
       |WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= $threshold""".stripMargin
  }

  /** Distinct 64-bit trigram hashes of `text`, never materializing shingle
    * strings: tokens are xxhash64'd once, trigram hash = xxhash64 of three
    * consecutive token hashes. Equivalent to hashing the distinct trigram
    * STRINGS (modulo a ~1e-13 64-bit collision), ~5× cheaper than building
    * ~n concatenated strings per document — and set sizes, intersections
    * and Jaccard values over the hash sets equal those over the string
    * sets, so results stay oracle-exact. Built with zip_with over three
    * shifted slices — NOT element_at inside a transform lambda, which
    * Catalyst's project-collapsing can turn into an O(tokens) re-eval of
    * the token-hash array per trigram (quadratic per document). */
  private[graft] def withShingleHashes(docs: DataFrame, n: Int = 3): DataFrame = {
    val th = transform(split(col("text"), " "), t => xxhash64(t))
    val m = size(th) - lit(n - 1) // trigram count
    val tri = zip_with(
      zip_with(slice(th, lit(1), m), slice(th, lit(2), m), (a, b) => xxhash64(a, b)),
      slice(th, lit(3), m), (p, c) => xxhash64(p, c))
    docs.select(col("doc_id"),
      when(size(th) >= n, array_distinct(tri))
        .otherwise(array(xxhash64(col("text")))).as("hs"))
  }

  /** d4: exact n-gram Jaccard near-dup — the non-approximate kernel, fully
    * native and fully numeric (no UDF, no shingle strings: tokens and
    * trigrams live as 64-bit hashes end-to-end). Inverted-index self-join
    * on trigram hash, count shared, jaccard = |∩|/|∪|.
    *
    * Scale note — the Σdf² question. This join's intermediate volume is
    * Σ_trigram df², which a Zipfian real-world corpus can blow up on
    * high-df "stopword" trigrams. The exact mitigation is prefix
    * filtering (AllPairs/PPJoin: order each doc's trigrams by ascending
    * df; j ≥ t forces a shared trigram within the first n−⌈t·n⌉+1 — join
    * only those prefixes, then exact-verify candidates via
    * [[verifyPairs]]). Measured here it LOSES ~2× (extra df join + per-doc
    * rank window + verify pass ≈ 4-7s vs 2.5s at sf0.1) because this
    * corpus's max trigram df is 25 — there is no explosion to prevent.
    * Since round 16 the choice is AUTOMATIC (t21's measure-then-guard
    * device): [[usePrefixPlan]] reads the memoized (Σdf, Σdf²) statistic
    * and dispatches to [[d4PrefixJaccard]] only when the
    * occurrence-weighted mean df says the naive intermediate stops
    * being linear in the corpus — a deployment never needs to know the
    * second entry point exists. Both arms are spec-asserted
    * output-identical, so the dispatch can never change results. d2
    * MinHash remains the headline path at 100 TB either way. */
  def d4NgramJaccard(s: SparkSession, dir: String): DataFrame =
    if (usePrefixPlan(s, dir)) d4PrefixJaccard(s, dir)
    else d4InvertedJaccard(s, dir)

  /** Dispatch threshold for the prefix arms, on the statistic
    * R = Σdf²/Σdf — the occurrence-weighted MEAN document frequency of
    * a trigram, i.e. the naive join's expected fan-out per gram
    * occurrence. R is scale-invariant where a raw Σdf² cutoff is not: a
    * 100 TB corpus with bounded df has astronomical Σdf² but R stays at
    * the df bound (intermediate volume = R × corpus gram count —
    * linear, the naive join's measured-winner regime), while true
    * stopword-grade skew sends R to the hot gram's df (quadratic in the
    * hot class).
    *
    * Sized from the D15SkewProbe measurement (SCALING.md round 16, the
    * 20k-doc hot-block series): naive wins at R = 10 (sf0.1: 3.2 s vs
    * 7.0 s) and stays the winner on the content-decorrelated scale
    * replicas (same R class); prefix already wins at R = 36 (2.2 s vs
    * 3.4 s) and the naive arm detonates quadratically above it (R = 218
    * → 27 s vs 2.4 s; R = 824 → 120 s vs 3.8 s; R = 2979 → 566 s vs
    * 2.2 s). The crossover sits in (10, 36); 32 splits it — and errs
    * LOW on purpose: a mis-dispatch to prefix costs a bounded ~2×
    * (the two extra exchanges), a mis-dispatch to naive costs an
    * unbounded quadratic. */
  private[graft] val PrefixSwitchRatio = 32L

  private val dfStatsMemo =
    new graft.sources.FingerprintMemo[(Long, Long)](_ => ())

  /** (Σdf, Σdf²) over the corpus trigram-hash df relation — the cheap
    * statistic guarding the d4/d15 prefix dispatch: one scan + one
    * map-side-combined aggregate + a 1-ROW collect, memoized per corpus
    * fingerprint (shared by d4 and d15 at every τ, priced once per
    * corpus snapshot — the quantizer-memo discipline). */
  private[graft] def dfSkewStats(s: SparkSession, dir: String): (Long, Long) =
    dfStatsMemo.getOrBuild(s, graft.sources.Layouts.dirTag(dir), "dfstats",
      graft.sources.Layouts.tableFingerprint(dir, "documents")) {
      dfSkewStatsOf(withShingleHashes(Tables.documents(s, dir)))
    }

  /** The (Σdf, Σdf²) aggregation kernel over any shingled relation —
    * factored so the spec can assert it exact against a driver-side
    * BigInt replay. Σdf² accumulates in DECIMAL(38,0), NOT Long: with
    * ANSI off a hot gram past ~3e9 df (or enough mass in the running
    * sum) wraps the Long product silently negative, R collapses to 0,
    * and [[usePrefixPlan]] would dispatch the NAIVE quadratic arm in
    * exactly the stopword-skew regime the guard exists to escape
    * (ADVICE r16). Decimal keeps the sum exact to 10³⁸; the collect
    * SATURATES at Long.MaxValue, which errs toward the bounded prefix
    * arm — the failure direction the dispatch comment prescribes. */
  private[graft] def dfSkewStatsOf(shingled: DataFrame): (Long, Long) = {
    import shingled.sparkSession.implicits._
    val row = shingled
      .select(explode($"hs").as("h"))
      .groupBy($"h").agg(count(lit(1)).as("df"))
      .agg(sum($"df").as("s1"),
        sum($"df".cast("decimal(38,0)") * $"df").as("s2"))
      .head()
    // an empty corpus aggregates to (null, null): R = 0, naive arm
    if (row.isNullAt(0)) (0L, 0L)
    else if (row.isNullAt(1)) {
      // Σdf² can be null ALONE: with ANSI off a DECIMAL(38,0) overflow
      // (sum past 10³⁸) returns null rather than throwing. Same contract
      // as an over-cap value — saturate toward the bounded prefix arm,
      // never NPE (ADVICE r17).
      (row.getLong(0), Long.MaxValue)
    } else {
      val s2 = row.getDecimal(1).toBigInteger
      val cap = java.math.BigInteger.valueOf(Long.MaxValue)
      (row.getLong(0),
        if (s2.compareTo(cap) > 0) Long.MaxValue else s2.longValueExact())
    }
  }

  /** True when the corpus's trigram-df skew makes the prefix-filtered
    * candidate plan the safe one (see [[PrefixSwitchRatio]]). */
  private[graft] def usePrefixPlan(s: SparkSession, dir: String): Boolean = {
    val (s1, s2) = dfSkewStats(s, dir)
    s2 / math.max(s1, 1L) > PrefixSwitchRatio
  }

  /** d4's naive arm — the exact inverted-index join (the measured winner
    * at bounded trigram df; see [[d4NgramJaccard]]'s scale note). */
  private[graft] def d4InvertedJaccard(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = withShingleHashes(Tables.documents(s, dir))
      .select($"doc_id", explode($"hs").as("h"))
    val sz = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    // SHUFFLE_HASH: equi-join on a high-cardinality hash key gains nothing
    // from sort order, and the sort of both shuffled sides is the join's
    // dominant cost; per-partition hash tables are small by construction.
    val shared = sh.as("a").join(sh.as("b").hint("SHUFFLE_HASH"),
        $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("c"))
    shared
      .join(sz.as("sa"), $"doc_a" === $"sa.doc_id")
      .join(sz.as("sb"), $"doc_b" === $"sb.doc_id")
      .select($"doc_a", $"doc_b",
        ($"c" / ($"sa.n" + $"sb.n" - $"c")).as("jaccard"))
      .where($"jaccard" >= 0.5)
  }

  /** The df-skew switch for [[d4NgramJaccard]]: SAME exact output
    * (DedupOpsSpec asserts equality), different candidate plan — AllPairs/
    * PPJoin prefix filtering. Order each document's trigrams by ascending
    * document frequency (ties by hash — any consistent global order
    * works); if J(a,b) ≥ t the documents MUST share a trigram within
    * their first n−⌈t·n⌉+1, so joining only those prefixes is
    * recall-complete, and high-df "stopword" trigrams mostly stay out of
    * prefixes — collapsing the Σdf² explosion. Candidates then pay the
    * same exact verify as d2/d3. Costs two extra exchanges (df join +
    * per-doc rank window) plus a candidate dedupe, and those are NOT
    * free: measured, the naive join wins 2× at sf0.1 (max df 25) and
    * still 4× at a 20×-replicated corpus (max df ≈ 500, Σdf² ≈ 5×10⁸) —
    * this variant's regime is true stopword-grade skew. Since round 16
    * [[d4NgramJaccard]] dispatches here automatically when the measured
    * R = Σdf²/Σdf statistic crosses [[PrefixSwitchRatio]]; outputs are
    * identical by construction (spec-asserted). See SCALING.md. */
  def d4PrefixJaccard(s: SparkSession, dir: String, t: Double = 0.5): DataFrame = {
    val docs = Tables.documents(s, dir)
    verifiedSetMetricsOn(docs, prefixPairsFor(s, dir, "d4prefix", t.toString)(
        prefixCandidates(docs, t)))
      .where(col("jaccard") >= t)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** The prefix arms' materialized candidate-pair relation, memoized per
    * (corpus fingerprint, FAMILY) — one pinned (long, long) relation per
    * corpus snapshot instead of one per invocation (the pairMemo
    * discipline applied to the dir-keyed prefix entry points; a corpus
    * rewrite misses the memo and unpersists the stale relation).
    * private[graft]: the spec asserts the one-entry-per-family bound. */
  private[graft] val prefixPairMemo =
    new graft.sources.FingerprintMemo[DataFrame](_.unpersist(false))

  /** τ rides the VALIDITY TOKEN, not the memo key: the public prefix
    * entry points take caller-supplied thresholds, and keying the memo
    * by `family:τ` pinned one MEMORY_AND_DISK pair relation per distinct
    * τ for the snapshot's lifetime with no eviction bound (ADVICE r16).
    * Folding τ into the fingerprint token instead means a second τ for
    * the same (dir, family) MISSES, rebuilds, and EVICTS (unpersists)
    * the first through the memo's evict-on-roll path — at most one live
    * pair relation per (dir, family), whatever τ sequence callers use;
    * the dispatch-default τ path re-hits as long as no other τ
    * intervened. */
  private def prefixPairsFor(s: SparkSession, dir: String, family: String,
      tauTag: String)(pairs0: => DataFrame): DataFrame =
    prefixPairMemo.getOrBuild(s, graft.sources.Layouts.dirTag(dir), family,
      graft.sources.Layouts.tableFingerprint(dir, "documents") + "|" + tauTag)(
      eagerPairs(pairs0))

  /** [[d4PrefixJaccard]]'s candidate stage, exposed so the skew spec can
    * assert the claim the switch exists for: one stopword-grade trigram
    * shared by k documents inflates the naive inverted-index join by
    * C(k,2) pairs, while here it ranks last by df and stays OUT of the
    * prefixes, so candidate volume stays bounded by the rare-gram df². */
  private[graft] def prefixCandidates(docs: DataFrame, t: Double): DataFrame = {
    import docs.sparkSession.implicits._
    // Set size n rides along from the array stage — no second window.
    val sh = withShingleHashes(docs)
      .select($"doc_id", size($"hs").as("n"), explode($"hs").as("h"))
    val dfRel = sh.groupBy($"h").agg(count(lit(1)).as("df"))
    val prefix = sh
      .join(dfRel.hint("SHUFFLE_HASH"), Seq("h"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"df", $"h")))
      .where($"rnk" <= $"n" - ceil(lit(t) * $"n") + 1)
      .select($"doc_id", $"h")
    prefix.as("a").join(prefix.as("b").hint("SHUFFLE_HASH"),
        $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
  }

  // ------------------------------------------------- d15 containment dedup

  /** One-sided containment flag threshold: a pair is flagged when the
    * SMALLER side shares ≥ 90% of its trigram set with the other — the
    * Broder (1997, "On the resemblance and containment of documents")
    * containment operating point. Per-corpus calibration; the per-side
    * c(A,B) = |A∩B|/|A| columns are the contract. */
  private[graft] val ContainTau = 0.9

  /** d15: CONTAINMENT dedup — the one duplication semantics every
    * symmetric screen in the tier provably misses. d2/d3/d4 score
    * resemblance |A∩B|/|A∪B|, so a document wholly CONTAINED in a longer
    * one (a quote inside an article, an article inside a digest —
    * Broder's containment case) has Jaccard |A|/|B| ≪ any near-dup
    * threshold and survives; its one-sided containment |A∩B|/|A| is
    * still 1.0. Emits per qualifying pair: `cont_a` = |∩|/|A|, `cont_b`
    * = |∩|/|B| (denominators differ per side — containment is not
    * symmetric), plus the pair's `jaccard` for context, filtered at
    * greatest(cont_a, cont_b) ≥ [[ContainTau]].
    *
    * Candidate plan — deliberately NOT d2's band index: MinHash band
    * collision probability is J^rows per band, and the operator's whole
    * point is pairs whose J is LOW (a doc at 25% of its container's
    * length sits at J ≈ 0.25 → ≈ 1-(1-0.25⁴)⁸ ≈ 3% band recall — the
    * planted spec pair would be missed 97% of the time). The shipped
    * plan is d4's exact inverted-index join over the shared 64-bit
    * trigram-hash relation (recall-complete by construction, measured
    * winner at this corpus's df ≤ 25); the Σdf² skew switch is
    * [[d15PrefixContainment]] — prefix filtering adapted to the
    * one-sided bound (spec-asserted equal output), dispatched
    * AUTOMATICALLY on the memoized R = Σdf²/Σdf statistic since
    * round 16 (see [[PrefixSwitchRatio]]). */
  def d15Containment(s: SparkSession, dir: String): DataFrame =
    if (usePrefixPlan(s, dir)) d15PrefixContainment(s, dir)
    else containmentPairsOf(Tables.documents(s, dir), ContainTau)

  /** The d15 kernel over any (doc_id, text) relation — d4's exact
    * inverted-index geometry with per-side denominators. */
  private[graft] def containmentPairsOf(docs: DataFrame, tau: Double): DataFrame = {
    import docs.sparkSession.implicits._
    val sh = withShingleHashes(docs).select($"doc_id", explode($"hs").as("h"))
    val sz = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val shared = sh.as("a").join(sh.as("b").hint("SHUFFLE_HASH"),
        $"a.h" === $"b.h" && $"a.doc_id" < $"b.doc_id")
      .groupBy($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"))
      .agg(count(lit(1)).as("c"))
    shared
      .join(sz.as("sa"), $"doc_a" === $"sa.doc_id")
      .join(sz.as("sb"), $"doc_b" === $"sb.doc_id")
      .select($"doc_a", $"doc_b",
        ($"c" / $"sa.n").as("cont_a"),
        ($"c" / $"sb.n").as("cont_b"),
        ($"c" / ($"sa.n" + $"sb.n" - $"c")).as("jaccard"))
      .where(greatest($"cont_a", $"cont_b") >= tau)
  }

  /** The df-skew switch for [[d15Containment]] (d4PrefixJaccard's role
    * for the one-sided bound): if max(cont_a, cont_b) ≥ τ then the
    * SMALLER side X shares ≥ ⌈τ·|X|⌉ trigrams with the other, so under
    * any fixed global trigram order X cannot avoid matching within its
    * first |X| − ⌈τ·|X|⌉ + 1 (pigeonhole) — joining every doc's
    * ascending-df prefix against the FULL inverted index (one side full,
    * unlike d4's prefix×prefix, because the larger side's denominator
    * never binds) is recall-complete, and stopword-grade grams stay out
    * of prefixes, collapsing Σdf² to Σ prefix-df·df. Candidates then pay
    * the exact array_intersect verify. Same measured caveat as d4: at
    * this corpus's df the naive join wins — this is the switch for real
    * stopword skew, shipped spec-asserted equal and auto-dispatched by
    * [[d15Containment]] via [[usePrefixPlan]]. */
  def d15PrefixContainment(s: SparkSession, dir: String,
      tau: Double = ContainTau): DataFrame = {
    val docs = Tables.documents(s, dir)
    verifiedSetMetricsOn(docs, prefixPairsFor(s, dir, "d15prefix", tau.toString)(
        containPrefixCandidates(docs, tau)))
      .where(greatest(col("cont_a"), col("cont_b")) >= tau)
  }

  /** [[d15PrefixContainment]]'s candidate stage: ascending-df prefixes
    * (the smaller side's pigeonhole bound) probed against the full
    * index; both orderings covered because EVERY doc's prefix probes. */
  private[graft] def containPrefixCandidates(docs: DataFrame, tau: Double): DataFrame = {
    import docs.sparkSession.implicits._
    val sh = withShingleHashes(docs)
      .select($"doc_id", size($"hs").as("n"), explode($"hs").as("h"))
    val dfRel = sh.groupBy($"h").agg(count(lit(1)).as("df"))
    val prefix = sh
      .join(dfRel.hint("SHUFFLE_HASH"), Seq("h"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy($"doc_id").orderBy($"df", $"h")))
      .where($"rnk" <= $"n" - ceil(lit(tau) * $"n") + 1)
      .select($"doc_id", $"h")
    prefix.as("a").join(sh.select($"doc_id", $"h").as("b").hint("SHUFFLE_HASH"),
        $"a.h" === $"b.h" && $"a.doc_id" =!= $"b.doc_id")
      .select(least($"a.doc_id", $"b.doc_id").as("doc_a"),
        greatest($"a.doc_id", $"b.doc_id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
  }

  /** d15's oracle: [[jaccardPairsSql]]'s exact-join shape (the shared
    * [[shinglePairCtesSql]] scaffold) with per-side denominators. */
  private[graft] def containmentPairsSql(tau: Double): String =
    s"WITH $shinglePairCtesSql\n" +
    s"""SELECT da AS doc_a, db AS doc_b,
       |  CAST(c AS DOUBLE) / sa.n AS cont_a,
       |  CAST(c AS DOUBLE) / sb.n AS cont_b,
       |  CAST(c AS DOUBLE) / (sa.n + sb.n - c) AS jaccard
       |FROM inter
       |JOIN sz sa ON da = sa.doc_id
       |JOIN sz sb ON db = sb.doc_id
       |WHERE greatest(CAST(c AS DOUBLE) / sa.n,
       |               CAST(c AS DOUBLE) / sb.n) >= $tau""".stripMargin

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
    val Seed = 70077L
    // Reference implementation for tests; the operator runs the codegen'd
    // graft.functions.signLshBandKeys expression (identical planes: same
    // seed, same [bit][dim] fill order).
    private val rng = new scala.util.Random(Seed)
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
    val emb = Tables.embeddings(s, dir)
    // single-pass bucket candidates (same shuffle discipline as
    // verifyPairs: one codegen'd banding pass, id-only exchange, native
    // pair-gen)
    val pairs = emb
      .select($"vec_id", posexplode(graft.functions.signLshBandKeys(
        $"embedding", SignLsh.NumBands, SignLsh.BandBits, SignLsh.Dim, SignLsh.Seed))
        .as(Seq("band", "key")))
      .groupBy($"band", $"key")
      .agg(sort_array(collect_list($"vec_id")).as("ids"))
      .where(size($"ids") >= 2)
      .select(explode(expr(
        "flatten(transform(ids, (x, i) -> " +
          "transform(slice(ids, i + 2, size(ids) - i - 1), " +
          "y -> struct(x AS vec_a, y AS vec_b))))")).as("p"))
      .select($"p.vec_a", $"p.vec_b")
      .dropDuplicates("vec_a", "vec_b")
      // see verifiedPairs: multi-referenced tiny relation, eagerly cached
      // so the hyperplane pass runs once and the optimizer sees real stats
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    pairs.count()
    val candIds = pairs.select(explode(array($"vec_a", $"vec_b")).as("vec_id")).distinct()
    val candEmb = emb.join(candIds, Seq("vec_id"))
    pairs
      .join(candEmb.select($"vec_id".as("vec_a"), $"embedding".as("emb_a")), Seq("vec_a"))
      .join(candEmb.select($"vec_id".as("vec_b"), $"embedding".as("emb_b")), Seq("vec_b"))
      .withColumn("cos_sim",
        round(graft.functions.cosineSim($"emb_a", $"emb_b"), 6))
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

  /** d9: embedding-CLUSTER dedup — the SemDeDup shape (semantic dedup a
    * training pipeline runs where text dedup cannot see the duplication:
    * re-encodes, paraphrases, format shifts). d5's verified cosine ≥ 0.9
    * pairs become edges, [[connectedComponents]] labels each semantic
    * cluster with its min vec_id, and exactly the cluster root is kept —
    * the embedding-space twin of d7 (same transitive-keep semantics: A~B,
    * B~C drops BOTH B and C even when A~C was never observed). Candidate
    * generation stays sign-LSH-bucketed, verify candidates-only, and the
    * CC iteration moves (id, label) pairs — nothing here ever shuffles an
    * embedding twice. On this corpus d5 finds no pairs, so every vector
    * is its own kept cluster — the structure is exercised by the oracle
    * either way, and DedupOpsSpec proves cluster/keep behavior on planted
    * near-identical vector families (the d5 precedent). */
  def d9EmbeddingClusterDedup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(s, dir)
    val labels = ccLabelsFor(s, dir, "embeddings", "sign-lsh")(
      d5EmbeddingNeardup(s, dir)
        .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
    emb.select(col("vec_id"))
      .join(labels.withColumnRenamed("node", "vec_id"), Seq("vec_id"), "left")
      .select(col("vec_id"),
        coalesce(col("lbl"), col("vec_id")).as("cluster_id"))
      .withColumn("keep", col("vec_id") === col("cluster_id"))
  }

  /** Oracle: recursive-CTE closure over the brute-force cosine pair list
    * (d7's oracle device applied to d5's pair relation). */
  private[operators] val d9Sql =
    s"""WITH RECURSIVE
       |pairs AS (SELECT * FROM ($d5Sql)),
       |sym AS (SELECT vec_a AS a, vec_b AS b FROM pairs
       |        UNION SELECT vec_b, vec_a FROM pairs),
       |reach AS (
       |  SELECT a, b FROM sym
       |  UNION
       |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
       |  WHERE s.b <> r.a),
       |comp AS (SELECT a AS node, least(a, min(b)) AS cluster
       |         FROM reach GROUP BY a)
       |SELECT e.vec_id,
       |  COALESCE(c.cluster, e.vec_id) AS cluster_id,
       |  e.vec_id = COALESCE(c.cluster, e.vec_id) AS keep
       |FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.node""".stripMargin

  // ------------------------------------------------- end-to-end keep bit

  /** d6: the dedup pipeline's end product — one keep/drop bit per
    * document, composed in the order SCALING.md's stress numbers mandate:
    *
    *  1. exact dedup first (d1): only the min-doc_id copy of each
    *     identical text is canonical — this also keeps identical-content
    *     groups out of the LSH stage's buckets;
    *  2. MinHash near-dup pairs among CANONICAL docs only (d2 machinery);
    *  3. greedy survivor rule: drop every doc that appears as the
    *     higher-id side of a verified pair. Deterministic and
    *     SQL-expressible (unlike transitive-closure clustering, which
    *     needs iterative connected components); the standard keep-first
    *     policy training pipelines use.
    *
    * Output: (doc_id, keep) for every document. */
  def d6DedupKeep(s: SparkSession, dir: String): DataFrame = {
    val flagged = withCanonId(Tables.documents(s, dir))
      .withColumn("canon", col("doc_id") === col("canon_id"))
    val canonical = flagged.where(col("canon")).select("doc_id", "text")
    val dropB = minhashPairsFor(s, dir, "canonical")(canonical)
      .select(col("doc_b").as("doc_id")).distinct()
    flagged.select(col("doc_id"), col("canon"))
      .join(dropB.withColumn("neardup", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"),
        (col("canon") && !coalesce(col("neardup"), lit(false))).as("keep"))
  }

  private[operators] val d6Sql =
    """WITH canon AS (
      |  SELECT doc_id, text FROM (
      |    SELECT doc_id, text,
      |      doc_id = min(doc_id) OVER (PARTITION BY text) AS is_c
      |    FROM documents) WHERE is_c),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM canon),
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
      |  GROUP BY 1, 2),
      |drops AS (
      |  SELECT DISTINCT db AS doc_id
      |  FROM inter
      |  JOIN sz sa ON da = sa.doc_id
      |  JOIN sz sb ON db = sb.doc_id
      |  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8)
      |SELECT d.doc_id,
      |  (c.doc_id IS NOT NULL AND dr.doc_id IS NULL) AS keep
      |FROM documents d
      |LEFT JOIN canon c ON d.doc_id = c.doc_id
      |LEFT JOIN drops dr ON d.doc_id = dr.doc_id""".stripMargin

  // ------------------------------------- connected-components clustering

  /** Iterative min-label propagation over an undirected edge list —
    * GraphFrames-free connected components. Returns (node, cluster) for
    * every node that appears in an edge; cluster = the component's min
    * node id. Each iteration is one equi-join + min-aggregate, with the
    * label relation persisted and the previous one unpersisted so the
    * lineage cannot snowball; convergence is detected by counting changed
    * labels (min-labels decrease monotonically, so termination is
    * guaranteed in ≤ diameter iterations).
    *
    * Scale: per-iteration cost is one shuffle of (edge endpoints ×
    * labels) — linear. Iteration COUNT is the graph diameter; near-dup
    * clusters are shallow (a handful of hops), so propagation wins on
    * constant factors. For adversarially deep graphs (million-link
    * chains) the known fix is alternating large-star/small-star rounds
    * (O(log n) rounds, same join primitive); this corpus never gets
    * close, so the simple kernel is the shipped plan. */
  /** Observation names must be session-unique; d7 runs many rounds per
    * call and Bench/specs invoke it repeatedly in one JVM. */
  private val ccObsId = new java.util.concurrent.atomic.AtomicLong(0)

  private[graft] def connectedComponents(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val sym = edges
      .select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(edges.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist(lvl)
    // Eager localCheckpoint, NOT persist: each round references the label
    // relation twice (directly + under the neighbor join), so a cached-but-
    // lineage-carrying plan DOUBLES per round — an exponential Catalyst
    // tree by round ~15 (OOMs the planner; found by the random-graph
    // property spec). Checkpointing truncates the logical plan to the
    // materialized rows; superseded checkpoint blocks are released by the
    // ContextCleaner once the old DataFrame is unreferenced. On a real
    // cluster prefer `checkpoint()` to a reliable dir for fault tolerance.
    // ONE job per round: the convergence signal rides the checkpoint
    // materialization as an observed metric (`Dataset.observe` collects
    // aggregates during the action that materializes the plan — codegen-
    // friendly, no second scan, no separate count job; previously each
    // round paid label-materialize + count = 2 jobs of scheduler
    // overhead, the dominant cost of this operator at sf0.1).
    def observed(df: DataFrame, metric: org.apache.spark.sql.Column): (DataFrame, Long) = {
      val obs = org.apache.spark.sql.Observation(
        s"graft_cc_${ccObsId.incrementAndGet()}")
      val out = df.observe(obs, metric.as("m")).localCheckpoint(true)
      (out, obs.get.apply("m").asInstanceOf[Long])
    }
    var (labels, changed) = observed(
      sym.groupBy(col("src").as("node")).agg(min(col("dst")).as("nbl"))
        .select(col("node"), least(col("node"), col("nbl")).as("lbl")),
      count(lit(1))) // row count: 0 on an empty graph — skip the loop
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val nbr = sym.join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node")).agg(min(col("lbl")).as("nbl"))
      val (next, c) = observed(
        labels.withColumnRenamed("lbl", "old")
          .join(nbr, Seq("node"), "left")
          .select(col("node"), col("old"),
            least(col("old"), coalesce(col("nbl"), col("old"))).as("lbl")),
        count(when(col("lbl") =!= col("old"), lit(1))))
      changed = c
      labels = next.select(col("node"), col("lbl"))
      iter += 1
    }
    // unpersist BEFORE the convergence check: a require-throw must not
    // leave the 2×edges relation pinned in the executor store (callers
    // like Bench catch and retry — each leaked copy would accumulate)
    sym.unpersist()
    require(changed == 0,
      s"connectedComponents: not converged after $maxIter iterations " +
        "(graph deeper than expected — switch to large-star/small-star)")
    labels
  }

  /** The deep-graph switch for [[connectedComponents]]: alternating
    * large-star/small-star rounds (Kiveris et al., "Connected Components
    * in MapReduce and Beyond") — O(log n) ROUNDS instead of O(diameter)
    * iterations, same join primitive, SAME output (DedupOpsSpec asserts
    * equality on random graphs incl. self-loops and runs a 120-node
    * diameter-119 path the propagation kernel's iteration cap cannot
    * cross). Each round:
    *
    *  - large-star: every node u links its LARGER neighbors to
    *    m = min(Γ(u) ∪ u) — long chains contract toward small ids;
    *  - small-star: every node links its smaller neighbors and itself to
    *    the minimum of that set — stars flatten.
    *
    * Edges are kept canonical (hi > lo), deduped, and localCheckpoint'ed
    * per round (same lineage discipline as the propagation kernel);
    * convergence = the edge relation reaching a fixpoint, detected by a
    * (count, order-free hash-sum) signature — at fixpoint every edge is
    * (node, component-min), which is exactly the label set. Like
    * [[d4PrefixJaccard]], this is the measured-switch variant: shallow
    * near-dup graphs favor the propagation kernel's constants; true
    * million-link chains need this one. */
  private[graft] def connectedComponentsStar(edges: DataFrame, maxRounds: Int = 50): DataFrame = {
    // every node appearing in the input — preserved to the output even if
    // its only edges are self-loops (which the canonical edge set drops),
    // keeping the output contract identical to [[connectedComponents]]
    val nodes = edges
      .select(explode(array(col("doc_a"), col("doc_b"))).as("node"))
      .distinct()
    // checkpoint + fixpoint signature in ONE job (same Observation device
    // as the propagation kernel): bit_xor is order-free and overflow-free
    // (a SUM of hashes overflows long under ANSI mode)
    def checkpointed(df: DataFrame): (DataFrame, (Long, Long)) = {
      val obs = org.apache.spark.sql.Observation(
        s"graft_cc_${ccObsId.incrementAndGet()}")
      val out = df.observe(obs, count(lit(1)).as("n"),
        expr("bit_xor(xxhash64(hi, lo))").as("h")).localCheckpoint(true)
      val m = obs.get
      (out, (m("n").asInstanceOf[Long],
        m.get("h").collect { case h: Long => h }.getOrElse(0L)))
    }
    var (e, sig) = checkpointed(edges
      .select(greatest(col("doc_a"), col("doc_b")).as("hi"),
        least(col("doc_a"), col("doc_b")).as("lo"))
      .where(col("hi") =!= col("lo"))
      .dropDuplicates("hi", "lo"))
    var rounds = 0
    var converged = sig._1 == 0
    while (!converged && rounds < maxRounds) {
      val sym = e.select(col("hi").as("u"), col("lo").as("v"))
        .union(e.select(col("lo").as("u"), col("hi").as("v")))
      val mins = sym.groupBy(col("u"))
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      // large-star: (v, m_u) for every neighbor v > u. Checkpointed —
      // it feeds BOTH the small-star min aggregate and its join; without
      // materialization the shuffle join below would execute twice.
      val ls = sym.join(mins, Seq("u"))
        .where(col("v") > col("u"))
        .select(col("v").as("hi"), col("m").as("lo"))
        .dropDuplicates("hi", "lo")
        .localCheckpoint(true)
      // small-star over the canonical (child > parent) edges of ls:
      // every node's smaller neighbors AND itself link to their minimum
      val minsS = ls.groupBy(col("hi")).agg(min(col("lo")).as("m"))
      val (ss, nextSig) = checkpointed(ls.join(minsS, Seq("hi"))
        .select(explode(array(
          struct(col("lo").as("c"), col("m")),
          struct(col("hi").as("c"), col("m")))).as("p"))
        .select(col("p.c").as("hi"), col("p.m").as("lo"))
        .where(col("hi") =!= col("lo"))
        .dropDuplicates("hi", "lo"))
      converged = nextSig == sig
      sig = nextSig
      e = ss
      rounds += 1
    }
    require(converged || sig._1 == 0,
      s"connectedComponentsStar: no fixpoint after $maxRounds rounds")
    // fixpoint edges are stars (node, component-min): the label set is
    // children plus the roots themselves; self-loop-only nodes (absent
    // from the canonical edges) label to themselves
    val star = e.select(col("hi").as("node"), col("lo").as("lbl"))
      .union(e.select(col("lo").as("node"), col("lo").as("lbl")))
      .groupBy(col("node")).agg(min(col("lbl")).as("lbl"))
    nodes.join(star, Seq("node"), "left")
      .select(col("node"), coalesce(col("lbl"), col("node")).as("lbl"))
  }

  /** d7: transitive-closure dedup clustering — the case d6's greedy rule
    * deliberately skips. Exact-dup groups collapse to their canonical,
    * verified near-dup pairs among canonicals (d2 machinery) form the
    * edge list, and [[connectedComponents]] labels every component with
    * its min doc_id. Output: every document with its cluster id (via its
    * canonical) and the transitive keep bit — keep exactly the cluster
    * root, so A~B, B~C drops BOTH B and C even when A~C was never
    * observed as a pair. */
  def d7CcDedup(s: SparkSession, dir: String): DataFrame = {
    val flagged = withCanonId(Tables.documents(s, dir))
    val canonical = flagged.where(col("doc_id") === col("canon_id"))
      .select("doc_id", "text")
    // the canonical pair set is d6's — one shared memoized relation
    val labels = ccLabelsFor(s, dir, "documents", "canonical-minhash")(
      minhashPairsFor(s, dir, "canonical")(canonical))
    flagged.select(col("doc_id"), col("canon_id"))
      .join(labels.withColumnRenamed("node", "canon_id"), Seq("canon_id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("canon_id")).as("cluster_id"))
      .withColumn("keep", col("doc_id") === col("cluster_id"))
  }

  /** Oracle: recursive-CTE transitive closure over the brute-force
    * verified pair list (the oracle may brute-force; the engine must
    * not). Cluster = min over the reachable set ∪ self. */
  private val d7Sql =
    """WITH RECURSIVE
      |canonmap AS (
      |  SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS canon_id
      |  FROM documents),
      |canon AS (
      |  SELECT d.doc_id, d.text FROM documents d
      |  JOIN canonmap m ON d.doc_id = m.doc_id AND m.doc_id = m.canon_id),
      |toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM canon),
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
      |  GROUP BY 1, 2),
      |edges AS (
      |  SELECT da, db FROM inter
      |  JOIN sz sa ON da = sa.doc_id
      |  JOIN sz sb ON db = sb.doc_id
      |  WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.8),
      |sym AS (SELECT da AS a, db AS b FROM edges
      |        UNION SELECT db, da FROM edges),
      |reach AS (
      |  SELECT a, b FROM sym
      |  UNION
      |  SELECT r.a, s.b FROM reach r JOIN sym s ON r.b = s.a
      |  WHERE s.b <> r.a),
      |comp AS (SELECT a AS node, least(a, min(b)) AS cluster
      |         FROM reach GROUP BY a)
      |SELECT m.doc_id,
      |  COALESCE(c.cluster, m.canon_id) AS cluster_id,
      |  m.doc_id = COALESCE(c.cluster, m.canon_id) AS keep
      |FROM canonmap m
      |LEFT JOIN comp c ON m.canon_id = c.node""".stripMargin

  // ------------------------------------------------- d13 priority dedup

  /** d13: SOURCE-PRIORITY dedup — the production survivor policy d6/d7
    * deliberately don't encode: when a document exists in several
    * sources, keep the copy from the most TRUSTED source, not the one
    * with the smallest id (the Pile/Dolma posture: curated beats web;
    * dedup order is a curation decision, not an accident of ingest ids).
    * Clusters are d7's (exact-canonical mapping + verified-near-dup
    * transitive closure, one shared memoized relation); within each
    * cluster the survivor is the argmin of (src_rank, doc_id) — rank
    * first, id only as the deterministic tie-break within a rank.
    *
    * The priority table is a driver-known policy: here rank = the
    * source's numeric suffix (src0 most trusted … src19 least — the
    * fixture's stand-in for "wikipedia > books > web"); production
    * supplies its own (source → rank) relation through the same argmin.
    * A source OUTSIDE the policy (no parseable suffix) ranks at the
    * explicit sentinel [[UnrankedSrc]] — least trusted — in BOTH
    * spellings: without the coalesce, Spark's NULL-first ascending sort
    * would crown an unknown source most trusted while DuckDB's
    * NULL-last sort buries it, silently diverging survivors the moment
    * a non-`srcN` source appears (ADVICE r13).
    *
    * Scale shape: d7's machinery planned ONCE (bucketed candidates, CC
    * over (id, label) pairs) plus one narrow (doc_id, source→rank) scan
    * and ONE cluster-keyed rank window over 20-byte rows — clusters are
    * overwhelmingly singletons, so the window's partitions number ~docs
    * and stay balanced (the d12 per-class shape, never a few-partition
    * giant). A first draft spelled the argmin as aggregate + self-join,
    * which planned the whole d7 subtree twice — the window spelling is
    * both cheaper and exactly the oracle's. */
  def d13PriorityDedup(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val clusters = d7CcDedup(s, dir).select(col("doc_id"), col("cluster_id"))
    val ranked = clusters.join(
      Tables.documents(s, dir).select(col("doc_id"),
        coalesce(expr("CAST(substring(source, 4) AS INT)"),
          lit(UnrankedSrc)).as("src_rank")),
      Seq("doc_id"))
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("src_rank"), col("doc_id"))
    ranked.withColumn("keep", row_number().over(w) === 1)
      .select(col("doc_id"), col("cluster_id"), col("src_rank"), col("keep"))
  }

  /** Rank of a source the suffix policy can't parse: explicit max —
    * least trusted — so NULL ordering never enters either engine's
    * sort. */
  private[graft] val UnrankedSrc = Int.MaxValue

  /** Oracle: d7's closure CTE + the suffix rank + a row_number argmin
    * (ORDER BY src_rank, doc_id — identical total order). TRY_CAST
    * mirrors Spark's non-ANSI CAST (NULL on garbage, never a throw);
    * the shared [[UnrankedSrc]] coalesce keeps the order total. */
  private val d13Sql =
    s"""WITH d7 AS (${d7Sql}),
       |ranked AS (
       |  SELECT d7.doc_id, d7.cluster_id,
       |    COALESCE(TRY_CAST(substr(d.source, 4) AS INT), $UnrankedSrc)
       |      AS src_rank
       |  FROM d7 JOIN documents d ON d7.doc_id = d.doc_id),
       |rk AS (
       |  SELECT doc_id, cluster_id, src_rank,
       |    row_number() OVER (PARTITION BY cluster_id
       |      ORDER BY src_rank, doc_id) AS r
       |  FROM ranked)
       |SELECT doc_id, cluster_id, src_rank, r = 1 AS keep FROM rk""".stripMargin

  // ------------------------------------------------ d8 incremental ingest

  /** The deterministic "today's ingest" slice: doc_id % [[IngestMod]] ==
    * [[IngestRem]] plays the incoming batch; the rest is the standing
    * corpus. */
  private[graft] val IngestMod = 10
  private[graft] val IngestRem = 7

  /** Path of the PERSISTED dedup index: the standing corpus's (doc_id,
    * band, key) MinHash band keys, written once per (dir, JVM),
    * partitioned by band — the structure a production dedup service
    * maintains between ingests so each new batch probes an index instead
    * of re-scanning the corpus. Deterministic content (seeded minhash),
    * so the write-once reuse mirrors the standing index it stands for. */
  /** (doc_id, band, key) MinHash band keys of `docs` — the rows the
    * persisted index stores and an incoming batch computes fresh. */
  private[graft] def bandKeysOf(docs: DataFrame): DataFrame =
    withShingleHashes(docs).select(col("doc_id"),
      posexplode(graft.functions.minhashBandKeys(
        col("hs"), MinHash.NumHashes, MinHash.Rows)).as(Seq("band", "key")))

  private[graft] def dedupIndexKeys(s: SparkSession, dir: String): String =
    graft.sources.Layouts.writeOncePartitioned(
      "graft_dedup_index_keys", dir, "band") {
      bandKeysOf(Tables.documents(s, dir)
        .where(!(col("doc_id") % IngestMod === IngestRem)))
    }

  /** Fold a screened batch's band keys into the PERSISTED index at
    * `path` — the st8 upsert device applied to the band-key store,
    * closing d8's maintenance loop (before this the index was built once
    * and never grew; a daily pipeline must fold each accepted batch back
    * in so tomorrow's batch screens against today's corpus).
    *
    * ATOMIC via the shared generational store
    * ([[graft.sources.GenStore]]): immutable band partitions, latest-wins
    * replace of re-ingested doc_ids (the q23 discipline — a re-screened
    * doc REPLACES its signature), hard-linked carry-over of untouched
    * bands, and a pointer-swap commit, so a fold killed mid-write leaves
    * readers fully pre-fold (spec-proven). Touched bands are bounded by
    * [[MinHash.Bands]] = 32 — a layout constant, never data; every doc
    * emits one key per band, so the partition bound is the REWRITE-side
    * bound: each fold rewrites 1/32 of the index per band and links the
    * rest. Idempotent per batch (re-folding the same keys commits
    * identical content — the at-least-once guarantee the streaming front
    * door st7/st9 needs). */
  private[graft] def indexUpsert(s: SparkSession, path: String,
      batchKeys: DataFrame): Unit =
    graft.sources.GenStore.fold(s, path,
      batchKeys.select(col("doc_id"), col("band"), col("key")),
      partCol = "band", idCol = "doc_id")

  /** The committed view of an [[indexUpsert]]-maintained index. */
  private[graft] def loadIndex(s: SparkSession, path: String): DataFrame =
    graft.sources.GenStore.load(s, path)

  /** Path of the PERSISTED corpus shingle sets (doc_id, hs) — the verify
    * side of the standing index: candidates found via [[dedupIndexKeys]]
    * pay the exact-Jaccard check against these stored sets instead of
    * re-shingling corpus text. Same write-once discipline as the keys. */
  private[graft] def dedupIndexShingles(s: SparkSession, dir: String): String =
    graft.sources.Layouts.writeOnce("graft_dedup_index_shingles", dir) {
      withShingleHashes(Tables.documents(s, dir)
        .where(!(col("doc_id") % IngestMod === IngestRem)))
        .select(col("doc_id"), col("hs"))
    }

  /** Verified near-dup HITS of `batch` (doc_id, text) against the
    * persisted index: band keys computed per row, candidates from the
    * (band, key) equi-join, exact Jaccard against the STORED corpus
    * shingle sets, threshold filter. Every step is a narrow per-row map
    * or an equi-join against a static relation — no aggregation, no
    * window — so the IDENTICAL plan runs in append-mode Structured
    * Streaming with NO state store and no watermark (the st9 front
    * door). May emit the same (doc_id, doc_b) pair once per colliding
    * band: collapsing in-stream would need exactly the stateful
    * aggregation this screen exists to avoid, so batch callers
    * `dropDuplicates` after (identical jaccard on every copy) and the
    * stream spec compares sets. */
  private[graft] def nearDupHits(batch: DataFrame, indexKeys: DataFrame,
      corpusShingles: DataFrame, threshold: Double): DataFrame = {
    val keyed = withShingleHashes(batch).select(col("doc_id"), col("hs"),
      posexplode(graft.functions.minhashBandKeys(
        col("hs"), MinHash.NumHashes, MinHash.Rows)).as(Seq("band", "key")))
    val inter = size(array_intersect(col("hs"), col("hs_b")))
    keyed
      .join(indexKeys.select(col("doc_id").as("doc_b"), col("band"), col("key")),
        Seq("band", "key"))
      .join(corpusShingles.select(col("doc_id").as("doc_b"), col("hs").as("hs_b")),
        Seq("doc_b"))
      .withColumn("jaccard",
        inter.cast("double") / (size(col("hs")) + size(col("hs_b")) - inter))
      .where(col("jaccard") >= threshold)
      .select(col("doc_id"), col("doc_b"), col("jaccard"))
  }

  /** d8: incremental-ingest dedup — screen the incoming batch against the
    * standing corpus WITHOUT re-running corpus×corpus dedup: this is the
    * shape every production pipeline actually runs daily (d2 is the
    * one-time backfill; d8 is the steady state). Per batch doc:
    * `dup_exact` (its digest exists in the corpus) and `dup_near`
    * (exact-verified Jaccard ≥ 0.8 against some corpus doc; includes
    * exact dups at j = 1). Within-batch duplicates are deliberately NOT
    * flagged — that is d1/d2's job run on the batch alone.
    *
    * Scale shape: the corpus side is touched only through its PERSISTED
    * band-key index ([[dedupIndexKeys]]) and the digest set; the batch
    * (orders of magnitude smaller) computes signatures fresh; candidates
    * come from the (band, key) equi-join — batch keys vs index keys, so
    * join volume is batch-sized, never corpus× — and only candidates pay
    * the exact verify (which re-reads text for candidate IDS only, the
    * d2 discipline). Exact membership joins 32-byte digests, not text. */
  def d8IncrementalDedup(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val isBatch = col("doc_id") % IngestMod === IngestRem
    screenBatch(docs, docs.where(isBatch),
      docs.where(!isBatch).select(sha2(col("text"), 256).as("h")).distinct(),
      s.read.parquet(dedupIndexKeys(s, dir)))
  }

  /** d8's screen core against an EXPLICIT index — factored out so the
    * maintenance loop can be proven: the spec screens a second batch
    * against an [[indexUpsert]]-updated index and against a rebuilt-from-
    * scratch one and asserts identical flags. `docs` must carry text for
    * every id the verify step may read (batch and corpus);
    * `corpusDigests` is the standing digest set (column `h`). */
  private[graft] def screenBatch(docs: DataFrame, batch: DataFrame,
      corpusDigests: DataFrame, indexKeys: DataFrame): DataFrame = {
    val exactHits = batch.select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .join(corpusDigests, Seq("h"), "left_semi")
      .select(col("doc_id")).withColumn("dup_exact", lit(true))

    val candidates = bandKeysOf(batch)
      .join(indexKeys.select(col("doc_id").as("doc_b"), col("band"), col("key")),
        Seq("band", "key"))
      .select(col("doc_id").as("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
    val nearHits = verifyPairs(docs, candidates, 0.8)
      .select(col("doc_a").as("doc_id")).distinct()
      .withColumn("dup_near", lit(true))

    batch.select(col("doc_id"))
      .join(exactHits, Seq("doc_id"), "left")
      .join(nearHits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("dup_exact"), lit(false)).as("dup_exact"),
        coalesce(col("dup_near"), lit(false)).as("dup_near"))
  }

  /** Oracle: brute-force cross-relation screen — exact via text equality,
    * near via the shared all-pairs Jaccard relation restricted to
    * batch×corpus pairs. */
  private val d8Sql =
    s"""WITH pairs AS (SELECT * FROM (${jaccardPairsSql(0.8)})),
       |cross_near AS (
       |  SELECT DISTINCT CASE WHEN doc_a % $IngestMod = $IngestRem
       |                       THEN doc_a ELSE doc_b END AS doc_id
       |  FROM pairs
       |  WHERE (doc_a % $IngestMod = $IngestRem)
       |     <> (doc_b % $IngestMod = $IngestRem)),
       |exact AS (
       |  SELECT DISTINCT b.doc_id
       |  FROM documents b JOIN documents i ON b.text = i.text
       |  WHERE b.doc_id % $IngestMod = $IngestRem
       |    AND i.doc_id % $IngestMod <> $IngestRem)
       |SELECT b.doc_id,
       |  e.doc_id IS NOT NULL AS dup_exact,
       |  n.doc_id IS NOT NULL AS dup_near
       |FROM (SELECT doc_id FROM documents
       |      WHERE doc_id % $IngestMod = $IngestRem) b
       |LEFT JOIN exact e ON b.doc_id = e.doc_id
       |LEFT JOIN cross_near n ON b.doc_id = n.doc_id""".stripMargin

  // ------------------------------------------ d10 substring-level dedup

  /** Window length for substring-level exact dedup — the "repeated
    * 50-token span" pass of the Lee et al. 2022 recipe (the reference
    * point every major curation pipeline runs after document-level
    * dedup: d1–d9 are document-granular, so verbatim spans repeated
    * INSIDE surviving documents — licence blocks, templated intros,
    * quoted passages — pass every one of them untouched). */
  private[graft] val SpanN = 50

  /** Positional `n`-token window HASHES of `text`: for every start
    * position IN ORDER (so `posexplode` yields the 0-based start token
    * index), the xxhash64 of that window's token-array slice —
    * duplicates within a doc retained, the non-distinct sibling of
    * [[shingles]], because span dedup must count and locate every
    * occurrence, not membership. Hashing the SLICE rather than a joined
    * string skips materializing an ~n·word_len char string per window
    * (the dominant narrow-scan cost at n = 50); since split tokens
    * cannot contain the separator, array equality and joined-string
    * equality define the SAME window classes, so the oracle's
    * string-replay discipline is unchanged. Whole-text fallback below
    * `n` words (a short doc is one window — exact-dup short docs still
    * flag; a single-element fallback array can never share a class with
    * a true n-token window). */
  private[graft] def spanHashes(text: Column, n: Int): Column = {
    val w = split(text, " ")
    val hs = transform(sequence(lit(0), size(w) - lit(n)),
      i => xxhash64(slice(w, i + lit(1), lit(n))))
    when(size(w) >= n, hs).otherwise(array(xxhash64(text)))
  }

  /** d10: substring-level exact dedup — flag, per document, every
    * [[SpanN]]-token window whose exact token sequence occurs at least
    * twice ANYWHERE in the corpus (other documents or elsewhere in the
    * same one), with the char offset of the first such span. Flag-only
    * output (the d3 discipline): the span cut itself is a trivial
    * downstream substring once offsets are known, and flags keep the
    * operator SQL-oracle-expressible.
    *
    * Scale shape: windows are hashed to 8 bytes at the scan
    * ([[org.apache.spark.sql.functions.xxhash64]] — the t12 device; the
    * oracle replays on strings, proving the hashed plan faithful, and a
    * birthday collision at 10¹⁰ grams is ~10⁻² expected extra flags on a
    * KEEP/DROP screen), so the occurrence-count aggregate and the join
    * back both move (gh, pos) longs, map-side combined, never span
    * text. The duplicated-hash relation broadcasts while it fits and
    * degrades to a hash join on the 8-byte key past that. The one
    * text-width exchange is the final doc_id join that converts the
    * first dup window's token index into a char offset against the
    * words array — the same class of exchange as d1's content-hash
    * window; a deployment that accepts token offsets can skip it
    * entirely. */
  def d10SpanDedup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val sh = docs
      .select($"doc_id", posexplode(spanHashes($"text", SpanN)))
      .select($"doc_id", $"pos", $"col".as("gh"))
    val dup = sh.groupBy($"gh").agg(count(lit(1)).as("c"))
      .where($"c" >= 2).select($"gh", lit(true).as("dup"))
    val perDoc = sh.join(dup, Seq("gh"), "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_windows"),
        sum(when($"dup", 1L).otherwise(0L)).as("n_dup"),
        min(when($"dup", $"pos")).as("first_start"))
    docs.select($"doc_id", split($"text", " ").as("w"))
      .join(perDoc, Seq("doc_id"))
      .select($"doc_id", $"n_windows", $"n_dup",
        when($"first_start".isNull, -1)
          .when($"first_start" === 0, 0)
          .otherwise(
            length(concat_ws(" ", slice($"w", lit(1), $"first_start"))) + 1)
          .cast("int").as("first_dup_off"),
        ($"n_dup" > 0).as("has_dup"))
  }

  /** DuckDB replays the windows on STRINGS with explicit positions (the
    * t10/t12 oracle discipline); equal counts and offsets prove the
    * hashed Spark plan faithful. */
  private[operators] val d10Sql =
    s"""WITH base AS (
       |  SELECT doc_id, string_split(text, ' ') AS w, text FROM documents),
       |sh AS (
       |  SELECT doc_id, (s).p AS pos, (s).g AS gram FROM (
       |    SELECT doc_id, unnest(
       |      CASE WHEN len(w) >= $SpanN
       |        THEN [{'p': i - 1, 'g': array_to_string(w[i:i+${SpanN - 1}], ' ')}
       |              for i in range(1, len(w) - ${SpanN - 2})]
       |        ELSE [{'p': 0, 'g': text}] END) AS s
       |    FROM base)),
       |dup AS (
       |  SELECT gram FROM (SELECT gram, count(*) AS c FROM sh GROUP BY 1)
       |  WHERE c >= 2),
       |perdoc AS (
       |  SELECT sh.doc_id,
       |    CAST(count(*) AS BIGINT) AS n_windows,
       |    CAST(SUM(CASE WHEN d.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_dup,
       |    MIN(CASE WHEN d.gram IS NOT NULL THEN sh.pos END) AS first_start
       |  FROM sh LEFT JOIN dup d ON sh.gram = d.gram
       |  GROUP BY 1)
       |SELECT b.doc_id, p.n_windows, p.n_dup,
       |  CAST(CASE WHEN p.first_start IS NULL THEN -1
       |            WHEN p.first_start = 0 THEN 0
       |            ELSE length(array_to_string(b.w[1:p.first_start], ' ')) + 1
       |       END AS INT) AS first_dup_off,
       |  p.n_dup > 0 AS has_dup
       |FROM base b JOIN perdoc p ON b.doc_id = p.doc_id""".stripMargin

  /** d11: the CUT LIST d10's summary points at — per document, the
    * maximal duplicated regions: overlapping-or-touching duplicated
    * [[SpanN]]-token windows merged into disjoint intervals (classic
    * gaps-and-islands: a window opens a new island exactly when its
    * start lies past the running max end of everything before it), each
    * emitted with its char [start_off, end_off) and token length — the
    * relation a span-removal pass consumes directly (substring cuts),
    * where d10 only says "this doc has spans". Restricted to docs with
    * ≥ [[SpanN]] tokens: a shorter doc has no sub-spans to cut — a
    * duplicated short doc is WHOLLY a duplicate, which is d1/d10's
    * whole-doc verdict (and its fallback pseudo-window can never equal
    * a true 50-token window's class, so the duplicated-window set here
    * is identical to d10's over these docs).
    *
    * Scale shape: the window/df machinery is d10's (8-byte hashes at
    * the scan, map-side-combined count, dup relation broadcast while it
    * fits); the islands pass sorts DUPLICATED windows only — (doc_id,
    * pos) pairs, a relation the df ≥ 2 filter has already collapsed to
    * a sliver of the corpus — and the interval aggregate reuses the
    * same doc_id partitioning (no extra exchange). The final doc_id
    * join against the words array prices the char conversion exactly
    * like d10's. */
  def d11SpanIntervals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, dir)
      .where(size(split($"text", " ")) >= SpanN)
    val sh = docs
      .select($"doc_id", posexplode(spanHashes($"text", SpanN)))
      .select($"doc_id", $"pos", $"col".as("gh"))
    val dup = sh.groupBy($"gh").agg(count(lit(1)).as("c"))
      .where($"c" >= 2).select($"gh")
    val dw = sh.join(dup, Seq("gh"), "left_semi")
    val byPos = Window.partitionBy($"doc_id").orderBy($"pos")
    val runEnd = max($"pos" + SpanN)
      .over(byPos.rowsBetween(Window.unboundedPreceding, -1))
    val isl = dw
      .withColumn("brk",
        when(runEnd.isNull || $"pos" > runEnd, 1).otherwise(0))
      .withColumn("island", sum($"brk").over(byPos))
      .groupBy($"doc_id", $"island")
      .agg(min($"pos").as("st"), (max($"pos") + SpanN).as("en"))
    docs.select($"doc_id", split($"text", " ").as("w"))
      .join(isl, Seq("doc_id"))
      .select($"doc_id",
        row_number().over(
          Window.partitionBy($"doc_id").orderBy($"st")).as("span_id"),
        when($"st" === 0, 0)
          .otherwise(length(concat_ws(" ", slice($"w", lit(1), $"st"))) + 1)
          .cast("int").as("start_off"),
        length(concat_ws(" ", slice($"w", lit(1), $"en")))
          .cast("int").as("end_off"),
        ($"en" - $"st").cast("int").as("n_tokens"))
  }

  private val d11Sql =
    s"""WITH long AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |  WHERE len(string_split(text, ' ')) >= $SpanN),
       |sh AS (
       |  SELECT doc_id, (s).p AS pos, (s).g AS gram FROM (
       |    SELECT doc_id, unnest(
       |      [{'p': i - 1, 'g': array_to_string(w[i:i+${SpanN - 1}], ' ')}
       |       for i in range(1, len(w) - ${SpanN - 2})]) AS s
       |    FROM long)),
       |dup AS (
       |  SELECT gram FROM (SELECT gram, count(*) AS c FROM sh GROUP BY 1)
       |  WHERE c >= 2),
       |dw AS (SELECT sh.doc_id, sh.pos FROM sh JOIN dup d ON sh.gram = d.gram),
       |isl AS (
       |  SELECT doc_id, pos, CASE WHEN
       |      max(pos + $SpanN) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |      OR pos > max(pos + $SpanN) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |    THEN 1 ELSE 0 END AS brk
       |  FROM dw),
       |isl2 AS (
       |  SELECT doc_id, pos,
       |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM isl),
       |iv AS (
       |  SELECT doc_id, island, MIN(pos) AS st, MAX(pos) + $SpanN AS en
       |  FROM isl2 GROUP BY 1, 2)
       |SELECT b.doc_id,
       |  CAST(row_number() OVER (PARTITION BY b.doc_id ORDER BY iv.st) AS INT)
       |    AS span_id,
       |  CAST(CASE WHEN iv.st = 0 THEN 0
       |            ELSE length(array_to_string(b.w[1:iv.st], ' ')) + 1
       |       END AS INT) AS start_off,
       |  CAST(length(array_to_string(b.w[1:iv.en], ' ')) AS INT) AS end_off,
       |  CAST(iv.en - iv.st AS INT) AS n_tokens
       |FROM iv JOIN long b ON iv.doc_id = b.doc_id""".stripMargin

  /** d12: APPLY the cut list — keep-first span removal, the pass that
    * closes the d10→d11 story (d10 flags duplicated-span mass, d11 emits
    * the intervals, d12 emits the cleaned corpus). Per duplicated
    * [[SpanN]]-token window CLASS (exact token sequence), the globally
    * FIRST occurrence — ordered by (doc_id, pos) — is kept and every
    * later occurrence is cut (the Lee et al. 2022 discipline: exactly
    * one copy of every repeated span survives the corpus; cutting ALL
    * occurrences would destroy the only copy). Cut windows island-merge
    * per doc exactly as d11, the merged token ranges are dropped, and
    * `clean_text` is the surviving tokens re-joined — every document
    * appears exactly once, untouched docs (short, or no late
    * occurrences) pass through verbatim with zero counts. A doc whose
    * whole text is a later copy cleans to '' (its first-occurrence twin
    * keeps the content).
    *
    * Scale shape: d10/d11's machinery end-to-end (windows hashed to 8
    * bytes at the scan, map-side-combined class counts, dup relation
    * broadcast while it fits), plus the one thing keep-first adds: a
    * rank window keyed on the window class — taken over the SEMI-JOINED
    * sliver only (occurrences of duplicated classes), never the full
    * corpus window stream. Interval collection per doc is bounded by
    * doc length; the final doc_id join prices the text rewrite exactly
    * like d10/d11's char conversion, and the cleaned corpus streams out
    * with no further exchange. The oracle replays the identical
    * keep-first rule on gram STRINGS (ranking needs only class identity
    * and (doc_id, pos) order, both hash-faithful — the d10 argument). */
  def d12SpanRemoval(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val all = Tables.documents(s, dir).select($"doc_id", $"text")
    val docs = all.where(size(split($"text", " ")) >= SpanN)
    val sh = docs
      .select($"doc_id", posexplode(spanHashes($"text", SpanN)))
      .select($"doc_id", $"pos", $"col".as("gh"))
    val dup = sh.groupBy($"gh").agg(count(lit(1)).as("c"))
      .where($"c" >= 2).select($"gh")
    val cw = sh.join(dup, Seq("gh"), "left_semi")
      .withColumn("rk", row_number().over(
        Window.partitionBy($"gh").orderBy($"doc_id", $"pos")))
      .where($"rk" >= 2)
      .select($"doc_id", $"pos")
    val byPos = Window.partitionBy($"doc_id").orderBy($"pos")
    val runEnd = max($"pos" + SpanN)
      .over(byPos.rowsBetween(Window.unboundedPreceding, -1))
    val iv = cw
      .withColumn("brk",
        when(runEnd.isNull || $"pos" > runEnd, 1).otherwise(0))
      .withColumn("island", sum($"brk").over(byPos))
      .groupBy($"doc_id", $"island")
      .agg(min($"pos").as("st"), (max($"pos") + SpanN).as("en"))
    val ivd = iv.groupBy($"doc_id")
      .agg(collect_list(struct($"st", $"en")).as("ivs"),
        count(lit(1)).cast("int").as("n_spans_cut"),
        sum($"en" - $"st").cast("int").as("n_tokens_cut"))
    all
      .join(ivd, Seq("doc_id"), "left")
      .select($"doc_id",
        when($"ivs".isNull, $"text").otherwise(
          concat_ws(" ", filter(split($"text", " "), (t, i) =>
            !exists($"ivs", v =>
              i >= v.getField("st") && i < v.getField("en")))))
          .as("clean_text"),
        coalesce($"n_spans_cut", lit(0)).as("n_spans_cut"),
        coalesce($"n_tokens_cut", lit(0)).as("n_tokens_cut"),
        (size(split($"text", " ")) - coalesce($"n_tokens_cut", lit(0)))
          .cast("int").as("n_tokens_kept"))
  }

  private[operators] val d12Sql =
    s"""WITH long AS (
       |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |  WHERE len(string_split(text, ' ')) >= $SpanN),
       |sh AS (
       |  SELECT doc_id, (s).p AS pos, (s).g AS gram FROM (
       |    SELECT doc_id, unnest(
       |      [{'p': i - 1, 'g': array_to_string(w[i:i+${SpanN - 1}], ' ')}
       |       for i in range(1, len(w) - ${SpanN - 2})]) AS s
       |    FROM long)),
       |dup AS (
       |  SELECT gram FROM (SELECT gram, count(*) AS c FROM sh GROUP BY 1)
       |  WHERE c >= 2),
       |rk AS (
       |  SELECT sh.doc_id, sh.pos,
       |    row_number() OVER (PARTITION BY sh.gram ORDER BY sh.doc_id, sh.pos)
       |      AS rk
       |  FROM sh JOIN dup d ON (sh.gram = d.gram)),
       |cw AS (SELECT doc_id, pos FROM rk WHERE (rk >= 2)),
       |isl AS (
       |  SELECT doc_id, pos, CASE WHEN
       |      max(pos + $SpanN) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
       |      OR pos > max(pos + $SpanN) OVER (PARTITION BY doc_id ORDER BY pos
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |    THEN 1 ELSE 0 END AS brk
       |  FROM cw),
       |isl2 AS (
       |  SELECT doc_id, pos,
       |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS island
       |  FROM isl),
       |iv AS (
       |  SELECT doc_id, island, MIN(pos) AS st, MAX(pos) + $SpanN AS en
       |  FROM isl2 GROUP BY 1, 2),
       |ivd AS (
       |  SELECT doc_id, COUNT(*) AS nspans, SUM(en - st) AS ncut
       |  FROM iv GROUP BY 1),
       |tok AS (
       |  SELECT l.doc_id, (s).i AS i, (s).t AS t FROM (
       |    SELECT doc_id, unnest(
       |      [{'i': i - 1, 't': w[i]} for i in range(1, len(w) + 1)]) AS s
       |    FROM long) l),
       |kept AS (
       |  SELECT t.doc_id, string_agg(t.t, ' ' ORDER BY t.i) AS clean
       |  FROM tok t LEFT JOIN iv
       |    ON ((t.doc_id = iv.doc_id) AND (t.i >= iv.st) AND (t.i < iv.en))
       |  WHERE iv.doc_id IS NULL
       |  GROUP BY 1)
       |SELECT d.doc_id,
       |  CASE WHEN ivd.doc_id IS NOT NULL THEN COALESCE(k.clean, '')
       |       ELSE d.text END AS clean_text,
       |  CAST(COALESCE(ivd.nspans, 0) AS INT) AS n_spans_cut,
       |  CAST(COALESCE(ivd.ncut, 0) AS INT) AS n_tokens_cut,
       |  CAST(len(string_split(d.text, ' ')) - COALESCE(ivd.ncut, 0) AS INT)
       |    AS n_tokens_kept
       |FROM documents d
       |LEFT JOIN ivd ON (d.doc_id = ivd.doc_id)
       |LEFT JOIN kept k ON (d.doc_id = k.doc_id)""".stripMargin

  // ------------------------------------- d14 segment boilerplate removal

  /** Content-defined segment boundary modulus: token t closes a segment
    * iff (len(t)·31 + code of its first char) % [[SegMod]] == 0 — a
    * deterministic per-token rule BOTH engines can spell (no engine-
    * specific hash enters the contract). Content-defined, so a repeated
    * passage segments IDENTICALLY wherever it appears — the property
    * that makes segment-granular dedup alignment-free where d10–d12's
    * fixed 50-token windows are not (the LBFS/rsync content-defined-
    * chunking argument, applied at token granularity). On the fixture
    * vocabulary the rule fires on ~1/5 of tokens → ~5-token expected
    * segments, the "line" granularity of CCNet's paragraph hash. */
  private[graft] val SegMod = 6
  /** Segments shorter than this are never removal candidates — CCNet's
    * minimum-paragraph-length guard: a 1–2-token segment repeats by
    * vocabulary chance, not because it is boilerplate. */
  private[graft] val SegMinTokens = 3
  /** A candidate segment present in at least this many DISTINCT docs is
    * boilerplate (calibrated like t12's CommonDf: the sf0.01 natural df
    * tail ends at 4 with planted repeated passages at 3–4; production
    * corpora with real vocabularies run this at 2 = CCNet's any-repeat
    * rule — the CONTRACT is the df machinery, not the constant). */
  private[graft] val SegDfMin = 3

  /** The document's content-defined segments, in order — ONE codegen'd
    * fold over the token array (no explode, no shuffle): tokens
    * accumulate into `cur` until a [[SegMod]]-breaker closes the
    * segment; a trailing unterminated run is a segment too, so every
    * token belongs to exactly one segment and re-joining the array
    * reproduces the text. */
  private[graft] def segmentsOf(text: Column): Column = {
    def isBrk(t: Column): Column =
      (length(t) * lit(31) + ascii(substring(t, 1, 1))) % SegMod === 0
    aggregate(
      split(text, " "),
      struct(lit(Array.empty[String]).as("segs"), lit("").as("cur")),
      (acc, t) => {
        val cur2 = when(acc.getField("cur") === "", t)
          .otherwise(concat(acc.getField("cur"), lit(" "), t))
        struct(
          when(isBrk(t), array_append(acc.getField("segs"), cur2))
            .otherwise(acc.getField("segs")).as("segs"),
          when(isBrk(t), lit("")).otherwise(cur2).as("cur"))
      },
      acc => when(acc.getField("cur") === "", acc.getField("segs"))
        .otherwise(array_append(acc.getField("segs"), acc.getField("cur"))))
  }

  /** d14: segment-granular boilerplate REMOVAL — the CCNet paragraph-
    * hash pass (Wenzek et al. 2020 dedup paragraphs by hash across
    * shards) at the granularity the library lacked: t12 only FLAGS
    * boilerplate-heavy docs and d10–d12 cut fixed [[SpanN]]-token
    * windows, so a repeated 12-token footer or nav line that doesn't
    * align to a window survives both. Docs split into [[segmentsOf]]'s
    * content-defined segments; every candidate segment (≥
    * [[SegMinTokens]] tokens) is hashed and its corpus-wide document
    * frequency computed; segments in ≥ [[SegDfMin]] docs are REMOVED
    * from every document (boilerplate has no "first copy" worth keeping
    * — the deliberate divergence from d12's keep-first: a footer is
    * noise in all its occurrences). Emits the cleaned corpus with
    * per-doc cut counts; a unique segment containing the same WORDS in
    * different order survives (segment identity is the exact token
    * sequence).
    *
    * Scale shape: segmentation is a pure narrow fold computed at the
    * scan and deliberately RECOMPUTED per consumer — df side, probe
    * side, rebuild side; three narrow corpus scans (t12's
    * recompute-beats-sort argument: a window count over gh would sort
    * the whole exploded segment stream, and caching exploded
    * corpus-scale rows is worse than re-reading pruned parquet at
    * 100 TB); the only corpus-granular exchanges
    * move (gh, doc_id) 16-byte rows — the df aggregate is map-side
    * combined and distinct-per-doc, the boiler relation (df ≥ threshold
    * survivors only) semi-joins back BROADCAST while it fits, and the
    * final doc_id join carries each doc's bounded cut-index list. Text
    * never shuffles; the cleaned corpus streams out of the narrow
    * rebuild. */
  def d14BoilerplateRemoval(s: SparkSession, dir: String): DataFrame =
    boilerplateRemovalOf(Tables.documents(s, dir).select(
      col("doc_id"), col("text")))

  /** The d14 kernel over any (doc_id, text) relation — d14 binds the
    * corpus; the spec drives planted footers and the brute-force
    * replay. */
  private[graft] def boilerplateRemovalOf(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val segs = docs
      .select($"doc_id", posexplode(segmentsOf($"text")).as(Seq("seg_id", "seg")))
      .where(size(split($"seg", " ")) >= SegMinTokens)
      .select($"doc_id", $"seg_id",
        size(split($"seg", " ")).as("ntok"), xxhash64($"seg").as("gh"))
    val boiler = segs.select($"gh", $"doc_id").distinct()
      .groupBy($"gh").agg(count(lit(1)).as("df"))
      .where($"df" >= SegDfMin).select($"gh")
    val cut = segs.join(boiler, Seq("gh"), "left_semi")
    val ivd = cut.groupBy($"doc_id")
      .agg(collect_list($"seg_id").as("cut_ids"),
        count(lit(1)).cast("int").as("n_segs_cut"),
        sum($"ntok").cast("int").as("n_tokens_cut"))
    docs
      .join(ivd, Seq("doc_id"), "left")
      .select($"doc_id", $"text", segmentsOf($"text").as("segs"),
        $"cut_ids", $"n_segs_cut", $"n_tokens_cut")
      .select($"doc_id",
        when($"cut_ids".isNull, concat_ws(" ", $"segs"))
          .otherwise(concat_ws(" ",
            filter($"segs", (_, i) => !exists($"cut_ids", c => c === i))))
          .as("clean_text"),
        coalesce($"n_segs_cut", lit(0)).as("n_segs_cut"),
        coalesce($"n_tokens_cut", lit(0)).as("n_tokens_cut"),
        (size(split($"text", " ")) - coalesce($"n_tokens_cut", lit(0)))
          .cast("int").as("n_tokens_kept"))
  }

  // The breaker-rule segmentation CTEs ([[segmentsOf]]'s SQL half:
  // identical rule on (length, first-char code), seg_id = breakers among
  // strictly-preceding tokens, segment string + token count per
  // (doc, seg)) — shared verbatim by the d14 and t22 oracles, ONE SQL
  // spelling of the segmenter to match the ONE Column spelling.
  private[operators] lazy val segmentCtesSql =
    s"""tok AS (
       |  SELECT doc_id, (s).i AS i, (s).t AS t FROM (
       |    SELECT doc_id, unnest(
       |      [{'i': i - 1, 't': w[i]} for i in range(1, len(w) + 1)]) AS s
       |    FROM (SELECT doc_id, string_split(text, ' ') AS w
       |          FROM documents)) u),
       |seg AS (
       |  SELECT doc_id, i, t,
       |    COALESCE(SUM(CASE WHEN (length(t) * 31 + ascii(substr(t, 1, 1)))
       |        % $SegMod = 0 THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY i
       |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS seg_id
       |  FROM tok),
       |segs AS (
       |  SELECT doc_id, seg_id, string_agg(t, ' ' ORDER BY i) AS s,
       |    COUNT(*) AS ntok
       |  FROM seg GROUP BY 1, 2)""".stripMargin

  // d14's oracle: the shared segment CTEs, df over segment STRINGS
  // (hash-faithful — the d10 argument), rebuild = ordered string_agg of
  // surviving segments.
  private lazy val d14Sql =
    s"WITH $segmentCtesSql,\n" +
    s"""boiler AS (
       |  SELECT s FROM (
       |    SELECT s, COUNT(DISTINCT doc_id) AS df FROM segs
       |    WHERE ntok >= $SegMinTokens GROUP BY 1)
       |  WHERE df >= $SegDfMin),
       |cut AS (
       |  SELECT g.doc_id, g.seg_id, g.ntok
       |  FROM segs g JOIN boiler b ON g.s = b.s
       |  WHERE g.ntok >= $SegMinTokens),
       |ivd AS (
       |  SELECT doc_id, COUNT(*) AS nsegs, SUM(ntok) AS ncut
       |  FROM cut GROUP BY 1),
       |kept AS (
       |  SELECT g.doc_id, string_agg(g.s, ' ' ORDER BY g.seg_id) AS clean
       |  FROM segs g LEFT JOIN cut c
       |    ON g.doc_id = c.doc_id AND g.seg_id = c.seg_id
       |  WHERE c.doc_id IS NULL
       |  GROUP BY 1)
       |SELECT d.doc_id, COALESCE(k.clean, '') AS clean_text,
       |  CAST(COALESCE(ivd.nsegs, 0) AS INT) AS n_segs_cut,
       |  CAST(COALESCE(ivd.ncut, 0) AS INT) AS n_tokens_cut,
       |  CAST(len(string_split(d.text, ' ')) - COALESCE(ivd.ncut, 0) AS INT)
       |    AS n_tokens_kept
       |FROM documents d
       |LEFT JOIN ivd ON d.doc_id = ivd.doc_id
       |LEFT JOIN kept k ON d.doc_id = k.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d14_boilerplate_removal" -> d14BoilerplateRemoval _,
    "d10_span_dedup" -> d10SpanDedup _,
    "d11_span_intervals" -> d11SpanIntervals _,
    "d12_span_removal" -> d12SpanRemoval _,
    "d1_exact_dedup" -> d1ExactDedup _,
    "d1n_normalized_dedup" -> d1nNormalizedDedup _,
    "d2_minhash_lsh" -> d2MinhashLsh _,
    "d3_simhash_neardup" -> d3SimhashNeardup _,
    "d4_ngram_jaccard" -> d4NgramJaccard _,
    "d5_embedding_neardup" -> d5EmbeddingNeardup _,
    "d6_dedup_keep" -> d6DedupKeep _,
    "d7_cc_dedup" -> d7CcDedup _,
    "d8_incremental_dedup" -> d8IncrementalDedup _,
    "d9_embedding_cluster_dedup" -> d9EmbeddingClusterDedup _,
    "d13_priority_dedup" -> d13PriorityDedup _,
    "d15_containment" -> d15Containment _)

  val oracleSql: Map[String, String] = Map(
    "d14_boilerplate_removal" -> d14Sql,
    "d10_span_dedup" -> d10Sql,
    "d11_span_intervals" -> d11Sql,
    "d12_span_removal" -> d12Sql,
    "d1_exact_dedup" -> d1Sql,
    "d1n_normalized_dedup" -> d1nSql,
    "d2_minhash_lsh" -> jaccardPairsSql(0.8),
    "d3_simhash_neardup" -> simhashSql(0.8),
    "d4_ngram_jaccard" -> jaccardPairsSql(0.5),
    "d5_embedding_neardup" -> d5Sql,
    "d6_dedup_keep" -> d6Sql,
    "d7_cc_dedup" -> d7Sql,
    "d8_incremental_dedup" -> d8Sql,
    "d9_embedding_cluster_dedup" -> d9Sql,
    "d13_priority_dedup" -> d13Sql,
    "d15_containment" -> containmentPairsSql(ContainTau))
}
