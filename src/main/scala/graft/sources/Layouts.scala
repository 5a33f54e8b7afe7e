package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Partitioned storage layouts as a first-class, oracle-checked query
  * surface (SourcesSinksSpec proves the same levers at plan level; this
  * makes one visible to the driver's end-to-end gate).
  *
  * At 100 TB the corpus isn't one flat parquet: it's written once
  * partitioned by a routing column (source/date/language) so that
  * single-slice queries read only their slice — the scan's
  * `PartitionFilters` replace a full-corpus filter. [[documentsBySource]]
  * materializes that layout once per JVM (like a real deployment's
  * one-time ETL); [[src1PartitionPrune]] then answers a two-source
  * question against it with a pruned scan (2 of 20 directories read —
  * asserted in LayoutsSpec).
  */
object Layouts {

  private val written = scala.collection.concurrent.TrieMap.empty[String, String]

  /** Write-once partitioned layout: materializes `df` partitioned by
    * `partCol` under target/ (keeping all writes inside the repo working
    * directory) on FIRST use per (name, source dir, JVM) and returns the
    * path. `name` must encode every parameter that changes the file
    * contents (e.g. the quantizer's k) — the cache key is (name, dir).
    * Deterministic producers only: rewriting must give identical rows, so
    * reuse across queries/bench passes mirrors the write-once table this
    * stands in for. */
  def writeOncePartitioned(name: String, dir: String, partCol: String)
      (df: => DataFrame): String =
    written.getOrElseUpdate(s"$name#$dir", {
      val out = java.nio.file.Paths.get("target",
        name + "_" + Integer.toHexString(dir.hashCode))
        .toAbsolutePath.toString
      df.write.mode("overwrite").partitionBy(partCol).parquet(out)
      out
    })

  /** Path of the by-source partitioned copy of `documents`. */
  def documentsBySource(s: SparkSession, dir: String): String =
    writeOncePartitioned("graft_docs_by_source", dir, "source") {
      Tables.documents(s, dir)
    }

  /** src1: single-slice stats off the partitioned layout. The
    * `source IN (...)` predicate becomes a scan PartitionFilter — only
    * the two named directories are listed and read; at 100 TB that is
    * the difference between scanning ~10% and 100% of the corpus. */
  def src1PartitionPrune(s: SparkSession, dir: String): DataFrame = {
    val part = s.read.parquet(documentsBySource(s, dir))
    part.where(col("source").isInCollection(Seq("src3", "src7")))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(length(col("text"))).as("total_chars"),
        min(col("doc_id")).as("min_doc_id"))
  }

  private val src1Sql =
    """SELECT source,
      |  COUNT(*) AS docs,
      |  CAST(SUM(length(text)) AS BIGINT) AS total_chars,
      |  min(doc_id) AS min_doc_id
      |FROM documents
      |WHERE source IN ('src3', 'src7')
      |GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src1_partition_prune" -> src1PartitionPrune _)

  val oracleSql: Map[String, String] = Map(
    "src1_partition_prune" -> src1Sql)
}
