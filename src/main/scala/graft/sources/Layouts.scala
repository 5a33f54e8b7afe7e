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
      // md5 prefix, not String.hashCode: distinct source dirs must never
      // alias the same on-disk layout (same rule as bucketedTable)
      val out = java.nio.file.Paths.get("target",
        name + "_" + dirTag(dir)).toAbsolutePath.toString
      df.write.mode("overwrite").partitionBy(partCol).parquet(out)
      out
    })

  /** Unpartitioned write-once layout — same contract as
    * [[writeOncePartitioned]] for tables with no routing column (e.g. the
    * PQ code table, keyed only by vec_id). */
  def writeOnce(name: String, dir: String)(df: => DataFrame): String =
    written.getOrElseUpdate(s"$name#$dir", {
      val out = java.nio.file.Paths.get("target",
        name + "_" + dirTag(dir)).toAbsolutePath.toString
      df.write.mode("overwrite").parquet(out)
      out
    })

  /** 64-bit md5-prefix tag of a source dir for on-disk layout names.
    * Distinct dirs colliding is possible in principle (any finite tag) but
    * at 2^-64 per pair it is ignorable; the point of md5 over
    * String.hashCode is distribution quality — hashCode's 32 bits over
    * similar path strings collide in practice. */
  private[sources] def dirTag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(8).map(b => f"$b%02x").mkString

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

  /** Write-once bucketed copy of a testdata table, registered in the
    * session catalog (bucket metadata only exists through the catalog, so
    * this is `saveAsTable` with an explicit external path under target/).
    * The table name encodes EVERY layout parameter — (table, bucket key,
    * bucket count, source dir) — so a second identical call is a
    * metadata hit while any differing parameter is a different table
    * (same-table-different-key must never alias; the dir tag is a 64-bit
    * md5 prefix — see [[dirTag]]). Concurrent first callers are
    * serialized through the same TrieMap device as
    * [[writeOncePartitioned]] — a bare check-then-saveAsTable would race
    * two writers onto one path. */
  def bucketedTable(s: SparkSession, dir: String, table: String,
                    key: String, buckets: Int): String = {
    val tname = s"graft_${table}_${key}_bk${buckets}_${dirTag(dir)}"
    written.getOrElseUpdate(tname, {
      if (!s.catalog.tableExists(tname)) {
        val path = java.nio.file.Paths.get("target", tname)
          .toAbsolutePath.toString
        Tables.load(s, dir, table).write
          .mode("overwrite")
          .bucketBy(buckets, key)
          .sortBy(key)
          .option("path", path)
          .format("parquet")
          .saveAsTable(tname)
      }
      tname
    })
  }

  /** src2: shuffle-free fact-fact join off co-bucketed layouts — lineitem
    * and orders both bucketed (and sorted) on orderkey. The join consumes
    * the tables' bucket partitioning directly: NO exchange on either side
    * (LayoutsSpec asserts it), the per-bucket sort order feeds the merge.
    * At 100 TB this is THE lever for a recurring fact-fact join: the
    * orderkey shuffle of both tables is paid once at write time, then
    * every subsequent join/aggregation on that key is exchange-free.
    * `MERGE` hint pins sort-merge so the proof doesn't silently degrade
    * into a broadcast at small SF. */
  def src2BucketedJoin(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val d182 = DecimalType(18, 2)
    val l = s.table(bucketedTable(s, dir, "lineitem", "l_orderkey", 8))
    val o = s.table(bucketedTable(s, dir, "orders", "o_orderkey", 8))
    val revenue = col("l_extendedprice").cast(d182) *
      (lit(1).cast(d182) - col("l_discount").cast(d182))
    l.hint("MERGE").join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("line_cnt"),
        sum(revenue).cast("double").as("revenue"))
  }

  private val src2Sql =
    """SELECT o_orderpriority,
      |  COUNT(*) AS line_cnt,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src1_partition_prune" -> src1PartitionPrune _,
    "src2_bucketed_join" -> src2BucketedJoin _)

  val oracleSql: Map[String, String] = Map(
    "src1_partition_prune" -> src1Sql,
    "src2_bucketed_join" -> src2Sql)
}
