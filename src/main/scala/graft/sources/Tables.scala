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

  /** Total bytes under a table path (file or part-file directory),
    * memoized — the testdata never changes size mid-process, and the
    * listing is one FS metadata call. */
  private val bytesMemo = scala.collection.concurrent.TrieMap.empty[String, Long]
  private def tableBytes(s: SparkSession, path: String): Long =
    bytesMemo.getOrElseUpdate(path, {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.getContentSummary(p).getLength else 0L
    })

  /** Scale-adaptive scan-parallelism floor — guide §2.5's unsplittable-
    * input remedy ("one huge unsplittable file … repartition immediately
    * after the read"), made conditional on input size so it can never
    * fire at production scale.
    *
    * The testdata tables are single-file, SINGLE-ROW-GROUP parquet, so
    * however many cores the session has, the scan yields exactly one
    * non-empty partition (`minPartitionNum` cannot help: rows live in
    * whichever split holds the row group's midpoint). Every narrow
    * kernel pipelined on the scan — trigram/shingle explodes, window
    * hashing, map-side partial aggregation — then runs as ONE task while
    * n−1 cores idle: measured round 18 on t24 at sf0.1, a 1.9 s
    * single-task stage inside a 2.6 s query on local[32]. A hash
    * repartition on the table's id to `defaultParallelism` right after
    * the read restores parallelism for the price of shuffling an input
    * the guard has already proven small.
    *
    * Two measured design points (round 18, full-bench A/B at sf0.1):
    *
    *  - HASH repartition on the id, not round-robin: a keyless
    *    `repartition(n)` first pays `sortBeforeRepartition`'s local sort
    *    of EVERY column (guide §2.5) — one task sorting full text/blob
    *    rows per scan site, which erased the kernel wins (q1 +0.5 s,
    *    m10 +0.7 s in the round-robin A/B). Hash on the id is sort-free,
    *    deterministic across runs and task retries, and the id is
    *    ~100–200× more distinct than the partition count (the §2.5
    *    spread rule).
    *  - DOCUMENTS ONLY: the floor is applied where the A/B showed wins —
    *    the text-kernel table, whose per-byte work (trigram/shingle
    *    explodes, window hashing) dwarfs the exchange. Blanket
    *    application to every table cost more in added exchanges + AQE
    *    stage scheduling than the cheap scans gained (q/m/k/st families
    *    regressed +0.4–0.7 s each).
    *
    * The guard derives from input size, not from the local core count:
    * it fires only when the file layout yields fewer estimated splits
    * (bytes / `spark.sql.files.maxPartitionBytes`) than
    * `defaultParallelism` AND the table is big enough for the shuffle to
    * pay (≥ `spark.graft.scan.fillCores.minBytes`, default 256 KB) — at
    * 100 TB a table has ~10⁶ splits and the scan shape is byte-identical
    * to before. Gated by `spark.graft.scan.fillCores` (default on); the
    * plan-pinning specs turn it off so they keep auditing the at-scale
    * plan shape. Catalyst still prunes columns and pushes filters below
    * the added RepartitionByExpression (TablesFillCoresSpec pins
    * ReadSchema staying narrow), and results cannot change: no
    * registered query depends on physical partitioning (p1's two-stage
    * top-k is partition-independent by spec). */
  private[graft] def fillCores(s: SparkSession, df: DataFrame,
      path: String, key: String): DataFrame = {
    if (!s.conf.get("spark.graft.scan.fillCores", "true").toBoolean) df
    else {
      val minBytes =
        s.conf.get("spark.graft.scan.fillCores.minBytes", "262144").toLong
      val cores = s.sparkContext.defaultParallelism
      val maxSplit = s.sessionState.conf.filesMaxPartitionBytes
      val bytes = tableBytes(s, path)
      val splits = math.max(1L, (bytes + maxSplit - 1) / maxSplit)
      if (bytes >= minBytes && splits < cores) {
        // A/B'd and rejected: persist()ing the repartitioned scan so a
        // composition query's 20–30 documents subtrees share one
        // materialization. The InMemoryRelation's stats are the
        // DECOMPRESSED batch bytes, so every downstream join that
        // broadcast its (doc_id, flag) side under the parquet scan's
        // 584 KB estimate re-planned as a 32-partition sort-merge join —
        // e9 went 6.8 → 11.5 s and its summed task time 10×. The floor
        // keeps the parquet scan's stats untouched.
        // Partition count derives from input size (guide §2: scale-
        // adaptive, never a local-core constant): one floor partition
        // per targetPartitionBytes of input, clamped to the machine.
        // 32 KB/partition reflects the text kernels' work-per-byte —
        // the parts sweep at sf0.1 (8/16/32 on t24/e5/e9/d6) put the
        // knee at ~16 of the 584 KB table, and bytes-derived sizing
        // keeps the driver's lower-core scaling runs meaningful.
        val target = s.conf.get(
          "spark.graft.scan.fillCores.targetPartitionBytes", "32768").toLong
        val parts = math.max(2L, math.min(cores.toLong, bytes / target)).toInt
        df.repartition(parts, col(key))
      } else df
    }
  }

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
  def documents(s: SparkSession, d: String): DataFrame =
    fillCores(s, load(s, d, "documents"), s"$d/documents.parquet", "doc_id")
  /** embeddings stays UNfloored — A/B'd separately in round 19 per the
    * r18 verdict (a vec_id-keyed bytes-derived floor, the documents
    * recipe verbatim): the serve-path family regressed hard (s7 0.66 →
    * 1.51 s, s8 0.67 → 0.95, s5 0.61 → 0.82, s2 0.51 → 0.67, s3 0.39 →
    * 0.52 exec at sf0.1/32c — their kernels are bound by the persisted
    * index tables, and the floor's exchange ships every full embedding
    * vector for nothing) while the narrow winners (m7 0.33 → 0.14, t21
    * 0.27 → 0.13, s4 1.24 → 0.95, e8 0.54 → 0.40) don't offset it: family
    * exec 6.9 → 7.7 s net. Record:
    * dev/records/qprof_embeddings_floor_ab_r19.md. */
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
