package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, TimestampNTZType, TimestampType}

/** Parquet scan helpers over the driver testdata (TESTDATA.md).
  *
  * Reading through `spark.read.parquet` keeps the scan declarative so
  * Catalyst pushes filters and prunes columns down to the parquet reader —
  * check `PushedFilters:` / `ReadSchema:` in `.explain("formatted")`. At
  * 100 TB this (plus partition pruning on a partitioned layout) is the
  * difference between scanning terabytes and scanning gigabytes.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  /** `events.ts` has shipped under two parquet encodings across testdata
    * generations: TIMESTAMP(NANOS) (loaded as raw INT64 via
    * `spark.sql.legacy.parquet.nanosAsLong`, which Spark's vectorized
    * reader otherwise rejects) and TIMESTAMP(MICROS) with
    * isAdjustedToUTC=false (loaded as TIMESTAMP_NTZ). Rather than hardcode
    * either, [[normalizeTs]] dispatches on the type the scan actually
    * produced, so a driver-side re-encode can't break every events query.
    * All variants normalize to the same session-TZ TIMESTAMP values: the
    * session TZ is pinned UTC everywhere (Bench/Verify/tests), so an NTZ
    * wall-clock cast and DuckDB's naive micros read agree exactly.
    *
    * The conf set here is session-global and sticky (the engine's session
    * builders — Bench, Verify, test harness — also set it at construction
    * so behavior never depends on which query ran first); its only effect
    * is on TIMESTAMP(NANOS) columns, which no other table has. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeTs(load(s, d, "events"))
  }

  /** Normalize an `events`-shaped frame's `ts` column to session-TZ
    * TIMESTAMP regardless of how the scan surfaced it: INT64 nanos →
    * truncate to micros (the conversion DuckDB applies loading the same
    * nanos file); TIMESTAMP_NTZ → reinterpret the wall clock in the (UTC)
    * session TZ; TIMESTAMP → already canonical. */
  def normalizeTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
    case TimestampType    => df
    case other =>
      throw new IllegalStateException(s"unsupported events.ts encoding: $other")
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** The one home of the md5-prefix-60-bit-BIGINT device: a deterministic,
  * engine-portable uniform hash (first 15 hex chars of md5 parsed base-16
  * — 60 bits keeps the value positive in a signed BIGINT in both
  * engines). Used wherever a hash must be REPRODUCED by the DuckDB
  * oracle — sampling ranks, split buckets, n-gram join keys (xxhash64
  * does not exist in DuckDB). Column form and SQL fragment live together
  * so the two spellings cannot drift. */
object Hash60 {
  def col60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** DuckDB twin of [[col60]] over a SQL expression string. */
  def sql60(expr: String): String =
    s"('0x' || substr(md5($expr), 1, 15))::BIGINT"
}

/** Oracle-determinism helpers.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * same SQL. Floating-point SUMs are order-dependent, and Spark's partition
  * order differs from DuckDB's scan order — so a raw `sum(double)` can
  * differ in the last ulps and flip a hash. Money columns in the testdata
  * carry exactly 2 decimals, so summing them as DECIMAL is exact integer
  * arithmetic in both engines; casting the exact sum back to DOUBLE is then
  * deterministic. Mirror on the DuckDB side:
  * `CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE)`.
  */
object Det {
  /** Order-insensitive exact sum of a fixed-scale decimal-valued double. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Deterministic average: exact decimal sum / count, divided in double —
    * both engines perform the identical final division. */
  def davg(c: Column, scale: Int = 2): Column =
    dsum(c, scale) / count(lit(1))

  /** DuckDB-side fragment equivalent of [[dsum]]. */
  def dsumSql(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  def davgSql(expr: String, scale: Int = 2): String =
    s"(${dsumSql(expr, scale)} / COUNT(*))"
}
