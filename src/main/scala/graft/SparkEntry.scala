package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers a query here; those with an
  * ANSI-SQL-expressible semantics also register a DuckDB oracle in
  * [[oracleSql]] under the same key with identical column names.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ReferenceQueries.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ReferenceQueries.queries ++ RelationalQueries.queries ++ DedupOps.queries ++
      TextOps.queries ++ SamplingOps.queries ++ SimilarityOps.queries ++ SketchOps.queries ++
      MultimodalOps.queries ++ graft.streaming.StreamingOps.queries ++
      graft.sources.Layouts.queries ++ PipelineOps.queries ++ UrlOps.queries ++
      HtmlOps.queries ++
      Map("sys_server_spec" -> ((s, _) => ClusterInfo.serverSpec(s)))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ReferenceQueries.oracleSql ++ RelationalQueries.oracleSql ++ DedupOps.oracleSql ++
      TextOps.oracleSql ++ SamplingOps.oracleSql ++ SimilarityOps.oracleSql ++ SketchOps.oracleSql ++
      MultimodalOps.oracleSql ++ graft.streaming.StreamingOps.oracleSql ++
      graft.sources.Layouts.oracleSql ++ PipelineOps.oracleSql ++ UrlOps.oracleSql ++
      HtmlOps.oracleSql
}
