package graft.operators

import graft.sources.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling tier — the draw-a-subset operators every training-data
  * pipeline runs before anything expensive (labeling, human eval, ablation
  * corpora). The reference has no sampling (its users would `rand()` inside
  * mapper closures — nondeterministic and irreproducible); here every
  * sample is a pure function of document identity:
  *
  *  - keyed on a salted md5 of doc_id, never on `rand()`: the same doc is
  *    in the same sample on every run, every engine, every cluster size,
  *    and adding documents never reshuffles existing members (the same
  *    growth-stability argument as [[TextOps.t6HashSplit]]);
  *  - each sampling channel gets its OWN salt so e.g. the eval sample is
  *    statistically independent of the train/val/test split — reusing one
  *    hash for both would correlate them (the classic leakage bug);
  *  - everything is DuckDB-expressible, so both operators carry exact
  *    oracles.
  */
object SamplingOps {

  /** Deterministic uniform rank in [0, 2^60) from a salted doc id — the
    * md5-prefix-as-BIGINT device of [[TextOps.t6HashSplit]], with a salt
    * prefix so distinct sampling channels draw independent hashes. */
  private def hashRank(docId: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), docId.cast("string"))), 1, 15), 16, 10)
      .cast("long")

  private def hashRankSql(salt: String): String =
    s"('0x' || substr(md5('$salt' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"

  private[graft] val TopK = 20

  /** p1: exact deterministic top-k-per-key sample — the k docs with the
    * smallest salted hash per source (a reproducible "random" k-per-source
    * draw; rank = hash order, ties by doc_id).
    *
    * Scale shape: the scan reads ONLY (doc_id, source) — text is pruned
    * away, so at 100 TB this touches a few GB of columns, not the corpus.
    * A single `row_number` over `partitionBy(source)` would sort one
    * reducer per source — a billion-row sort on a skewed source. Instead
    * the classic two-stage exact top-k: stage 1 ranks within
    * (source, physical-partition) — group size is bounded by the scan
    * partition size whatever the key skew — and keeps k; stage 2 ranks the
    * ≤ k×partitions survivors per source. Any row in the global top-k is
    * in its partition's local top-k, so the result is exact and
    * independent of the physical partitioning (SamplingOpsSpec asserts
    * both). */
  def p1SampleTopk(s: SparkSession, dir: String): DataFrame =
    topkPerKey(Tables.documents(s, dir), TopK)

  /** The reusable two-stage kernel over any (doc_id, source) relation —
    * [[p1SampleTopk]] binds it to the corpus; SamplingOpsSpec feeds it
    * adversarial partitionings and checks it against the one-window
    * formulation. */
  private[graft] def topkPerKey(documents: DataFrame, k: Int): DataFrame = {
    val docs = documents
      .select(col("doc_id"), col("source"), hashRank(col("doc_id"), "p1:").as("rk"))
    val local = docs
      .withColumn("pid", spark_partition_id())
      .withColumn("lrnk", row_number().over(
        Window.partitionBy(col("source"), col("pid")).orderBy(col("rk"), col("doc_id"))))
      .where(col("lrnk") <= k)
    local
      .withColumn("rnk", row_number().over(
        Window.partitionBy(col("source")).orderBy(col("rk"), col("doc_id"))).cast("int"))
      .where(col("rnk") <= k)
      .select(col("source"), col("doc_id"), col("rnk"))
  }

  private val p1Sql =
    s"""SELECT source, doc_id, rnk FROM (
       |  SELECT source, doc_id,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY ${hashRankSql("p1:")}, doc_id) AS INT) AS rnk
       |  FROM documents)
       |WHERE rnk <= $TopK""".stripMargin

  /** Per-language sampling rates in permille — the mixture-shaping story:
    * downsample the dominant language, keep more of the rare ones. */
  private[graft] val RatePermille: Seq[(String, Int)] =
    Seq("en" -> 100, "zh" -> 500)
  private[graft] val DefaultPermille = 300

  /** p2: stratified hash sampling — per-language keep rates applied as a
    * deterministic hash-bucket threshold (bucket = salted md5 % 1000 <
    * rate‰). A pure narrow map + filter: no shuffle at any scale, and the
    * scan reads only the three id/routing columns. Emits the sampled rows
    * with their bucket so the draw is auditable; different salt than p1 —
    * the two samples are independent draws. */
  def p2StratifiedSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bucket = pmod(hashRank($"doc_id", "p2:"), lit(1000))
    val rate = RatePermille.foldRight(lit(DefaultPermille): Column) {
      case ((l, r), e) => when($"lang" === l, r).otherwise(e)
    }
    Tables.documents(s, dir)
      .select($"doc_id", $"source", $"lang", bucket.as("bucket"))
      .where($"bucket" < rate)
  }

  private val p2Sql = {
    val rate = RatePermille.foldRight(DefaultPermille.toString) {
      case ((l, r), e) => s"CASE WHEN lang = '$l' THEN $r ELSE $e END"
    }
    s"""SELECT doc_id, source, lang, bucket FROM (
       |  SELECT doc_id, source, lang,
       |    ${hashRankSql("p2:")} % 1000 AS bucket
       |  FROM documents)
       |WHERE bucket < $rate""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "p1_sample_topk" -> p1SampleTopk _,
    "p2_stratified_sample" -> p2StratifiedSample _)

  val oracleSql: Map[String, String] = Map(
    "p1_sample_topk" -> p1Sql,
    "p2_stratified_sample" -> p2Sql)
}
