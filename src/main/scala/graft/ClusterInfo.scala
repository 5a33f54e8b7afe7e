package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Spark-native `check_server_spec` analog
  * (`/root/reference/lib/MapReduce/Framework/Simple.pm:457-474`): the
  * reference POSTs to every worker's `/server_spec` endpoint and collects a
  * `{url => {cores, clock, mem, worker_num, ...}}` map, silently skipping
  * unreachable servers. On Spark the cluster already self-reports through
  * the status tracker, so the analog is a thin wrapper — one row per
  * executor (the driver appears as an executor in local mode), plus the
  * session-level capability fields the reference exposed per worker.
  */
object ClusterInfo {

  /** One row per live executor — host, port, running tasks — plus the
    * session's core count and Spark version in every row (the reference
    * reported capability per worker the same way). */
  def serverSpec(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val sc = spark.sparkContext
    sc.statusTracker.getExecutorInfos.toSeq
      .map(e => (e.host, e.port, e.numRunningTasks,
        sc.defaultParallelism, sc.version, sc.master))
      .toDF("host", "port", "running_tasks", "total_cores", "spark_version", "master")
  }
}
