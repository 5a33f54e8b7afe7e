package graft.operators

import graft.sources.{Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** M2 relational tier (SURVEY.md §7.2): the full relational surface over the
  * star-schema testdata — joins (broadcast, sort-merge, semi/anti), window
  * functions, top-k, rollup, distinct aggregates, set operations, and the
  * scalar-function battery (json/date/string/math). The reference has none
  * of these (SURVEY §2.3 — users wrote them by hand inside mapper closures);
  * here each is a declarative Catalyst plan with a DuckDB oracle.
  *
  * Scale discipline:
  *  - dimension tables (`region`, `nation`) are `broadcast()` — fixed-size
  *    at any scale factor, so the join never shuffles the fact table;
  *  - fact-fact joins shuffle on their keys once (sort-merge under AQE);
  *  - every aggregate is partial+final (map-side combine) automatically;
  *  - floating-point aggregates go through [[Det]] decimal casts so results
  *    are order-insensitive — required both for the DuckDB hash-compare and
  *    for run-to-run determinism on a real cluster.
  */
object RelationalQueries {

  /** q5: broadcast-join rollup of customers over the nation→region
    * dimensions. nation (25 rows) and region (5 rows) stay fixed-size at
    * 100 TB, so both sides are broadcast — the plan must show
    * BroadcastHashJoin, no shuffle of `customer`. */
  def q5JoinBroadcast(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, dir)), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name", $"n_name")
      .agg(count(lit(1)).as("cust_cnt"), Det.dsum($"c_acctbal").as("acctbal_sum"))
  }

  private val q5Sql =
    s"""SELECT r_name, n_name, COUNT(*) AS cust_cnt,
       |  ${Det.dsumSql("c_acctbal")} AS acctbal_sum
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY 1, 2""".stripMargin

  /** q6: the fact-side multi-join — lineitem ⋈ orders ⋈ customer, revenue
    * by market segment over recent orders. The o_orderdate filter is pushed
    * to the parquet scan; at 100 TB both joins are shuffle sort-merge on
    * their keys (the shape the name records), while at fixture scale AQE
    * correctly flips both to broadcast (the filtered orders side and
    * customer are small — plan verified in the round-7 q6 diagnosis,
    * SCALING.md). Revenue is computed in
    * DECIMAL so the sum is exact and order-insensitive — at 1000 executors
    * a double sum would differ run to run. */
  def q6JoinSortMerge(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d182 = DecimalType(18, 2)
    val revenue = $"l_extendedprice".cast(d182) *
      (lit(1).cast(d182) - $"l_discount".cast(d182))
    Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).where($"o_orderdate" >= lit("1997-01-01").cast("timestamp")),
        $"l_orderkey" === $"o_orderkey")
      .join(Tables.customer(s, dir), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        sum(revenue).cast("double").as("revenue"),
        count(lit(1)).as("line_cnt"),
        countDistinct($"o_orderkey").as("order_cnt"))
  }

  private val q6Sql =
    """SELECT c_mktsegment,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
      |           (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS line_cnt,
      |  COUNT(DISTINCT o_orderkey) AS order_cnt
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey AND o_orderdate >= TIMESTAMP '1997-01-01'
      |JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1""".stripMargin

  /** q7: semi/anti join — customers with at least one order vs customers
    * with none, as one row of counts. LeftSemi/LeftAnti never materialize
    * the probe side's payload, and under AQE the orders side's distinct
    * custkeys broadcast when small. */
  def q7SemiAnti(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
    val orders = Tables.orders(s, dir)
    val semi = cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_semi")
      .agg(count(lit(1)).as("semi_cnt"))
    val anti = cust.join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
      .agg(count(lit(1)).as("anti_cnt"))
    semi.crossJoin(anti)
  }

  private val q7Sql =
    """SELECT
      |  (SELECT COUNT(*) FROM customer c
      |   WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS semi_cnt,
      |  (SELECT COUNT(*) FROM customer c
      |   WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS anti_cnt""".stripMargin

  /** q8: window functions over the event stream — per-user ordering with
    * row_number, lag, and a running count. One shuffle on user_id, then all
    * three windows share the same sort — Catalyst plans a single Window
    * operator. Ordering ties broken by event_id for determinism. */
  def q8Window(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val wRows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir).select(
      $"event_id", $"user_id",
      row_number().over(w).as("rnk"),
      lag($"event_id", 1).over(w).as("prev_event_id"),
      lag($"value", 1).over(w).as("prev_value"),
      count(lit(1)).over(wRows).as("cume_cnt"))
  }

  private val q8Sql =
    """SELECT event_id, user_id,
      |  CAST(row_number() OVER w AS INT) AS rnk,
      |  lag(event_id) OVER w AS prev_event_id,
      |  lag(value) OVER w AS prev_value,
      |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS UNBOUNDED PRECEDING) AS cume_cnt
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin

  /** q9: top-k — 15 most expensive orders. Spark plans TakeOrderedAndProject:
    * each partition keeps its local top 15, only k×partitions rows reach the
    * driver — no global sort. Ties broken by o_orderkey. */
  def q9TopK(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
      .limit(15)
  }

  private val q9Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 15""".stripMargin

  /** q10: rollup over (returnflag, linestatus) — grouping-set aggregation
    * with subtotals and a grand total; NULL grouping keys projected to 'ALL'
    * so the oracle compare is representation-stable. l_quantity is
    * integral-valued, so its double sum is exact in any order. */
  def q10Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .rollup($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("cnt"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("rflag"),
        coalesce($"l_linestatus", lit("ALL")).as("lstatus"),
        $"sum_qty", $"cnt")
  }

  private val q10Sql =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
      |  COALESCE(l_linestatus, 'ALL') AS lstatus,
      |  SUM(l_quantity) AS sum_qty, COUNT(*) AS cnt
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin

  /** q11: distinct aggregates — per returnflag, distinct part/supplier
    * counts. Catalyst plans the two distinct columns as an expand +
    * two-phase aggregate; exact (not approximate) by design here — the HLL
    * variant lives in SketchOps. */
  def q11DistinctAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("distinct_parts"),
        countDistinct($"l_suppkey").as("distinct_supps"),
        count(lit(1)).as("cnt"))
  }

  private val q11Sql =
    """SELECT l_returnflag,
      |  COUNT(DISTINCT l_partkey) AS distinct_parts,
      |  COUNT(DISTINCT l_suppkey) AS distinct_supps,
      |  COUNT(*) AS cnt
      |FROM lineitem GROUP BY 1""".stripMargin

  /** q12: set operations — customers who never ordered (EXCEPT) and
    * customers who did (INTERSECT), labeled and unioned. Both set ops
    * deduplicate (SQL semantics); the union is by-name. */
  def q12SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val custKeys = Tables.customer(s, dir).select($"c_custkey".as("k"))
    val orderCust = Tables.orders(s, dir).select($"o_custkey".as("k"))
    custKeys.except(orderCust).withColumn("side", lit("customer_only"))
      .unionByName(custKeys.intersect(orderCust).withColumn("side", lit("both")))
  }

  private val q12Sql =
    """SELECT k, 'customer_only' AS side FROM
      |  (SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey FROM orders)
      |UNION ALL
      |SELECT k, 'both' AS side FROM
      |  (SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey FROM orders)""".stripMargin

  /** q13: scalar-function battery over events — json extraction
    * (`props` is a JSON object), date parts, string ops, and exact math
    * (floor). Everything stays in whole-stage codegen; no UDFs. */
  def q13ScalarBattery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir).select(
      $"event_id",
      get_json_object($"props", "$.k").cast("int").as("json_k"),
      year($"ts").as("y"),
      month($"ts").as("m"),
      dayofmonth($"ts").as("d"),
      hour($"ts").as("h"),
      upper($"event_type").as("type_up"),
      substring($"event_type", 1, 3).as("type3"),
      concat($"event_type", lit("#"), $"user_id".cast("string")).as("tag"),
      length($"props").as("props_len"),
      floor($"value").cast("long").as("floor_val"))
  }

  private val q13Sql =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS json_k,
      |  CAST(year(ts) AS INT) AS y, CAST(month(ts) AS INT) AS m,
      |  CAST(day(ts) AS INT) AS d, CAST(hour(ts) AS INT) AS h,
      |  upper(event_type) AS type_up,
      |  substr(event_type, 1, 3) AS type3,
      |  event_type || '#' || CAST(user_id AS VARCHAR) AS tag,
      |  CAST(length(props) AS INT) AS props_len,
      |  CAST(floor(value) AS BIGINT) AS floor_val
      |FROM events""".stripMargin

  /** q14: AS-OF join — each click event matched to the same user's most
    * recent purchase at-or-before its timestamp. Spark has no ASOF join
    * operator; per the composition-first rule this is expressed with
    * existing ops: union the two streams with a side marker, one window
    * sorted by (ts, side, event_id) per user, and `last(_, ignoreNulls)`
    * carries the latest purchase payload forward. ONE shuffle on user_id
    * and a per-partition sort — exactly the distributed point-in-time
    * join a feature store runs, and it scales wherever window functions
    * do. Ties: purchases sort before clicks at equal ts (as-of is
    * inclusive) and among equal-ts purchases the max event_id wins. */
  def q14AsofJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val clicks = ev.where($"event_type" === "click").select(
      $"event_id", $"user_id", $"ts", lit(1).as("is_click"),
      lit(null).cast("bigint").as("p_event_id"),
      lit(null).cast("double").as("p_value"))
    val purchases = ev.where($"event_type" === "purchase").select(
      $"event_id", $"user_id", $"ts", lit(0).as("is_click"),
      $"event_id".as("p_event_id"), $"value".as("p_value"))
    val w = Window.partitionBy($"user_id")
      .orderBy($"ts", $"is_click", $"event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // ONE last() over a struct of both payload fields: separate last()
    // calls would desynchronize on a purchase with a NULL value (event_id
    // from the latest purchase, value skipping back to an earlier one).
    val p = when($"is_click" === 0, struct($"p_event_id", $"p_value"))
    clicks.unionByName(purchases)
      .select($"event_id", $"user_id", $"is_click",
        last(p, ignoreNulls = true).over(w).as("asof"))
      .where($"is_click" === 1)
      .select($"event_id", $"user_id",
        $"asof.p_event_id".as("asof_event_id"),
        $"asof.p_value".as("asof_value"))
  }

  // LATERAL instead of DuckDB's ASOF JOIN keyword so the tie-break order
  // (ts DESC, event_id DESC) is explicit and matches the window ordering.
  private val q14Sql =
    """SELECT l.event_id, l.user_id, r.asof_event_id, r.asof_value
      |FROM events l
      |LEFT JOIN LATERAL (
      |  SELECT e.event_id AS asof_event_id, e.value AS asof_value
      |  FROM events e
      |  WHERE e.event_type = 'purchase' AND e.user_id = l.user_id
      |    AND e.ts <= l.ts
      |  ORDER BY e.ts DESC, e.event_id DESC LIMIT 1) r ON TRUE
      |WHERE l.event_type = 'click'""".stripMargin

  /** q15: range-frame lookback — for every event, how many same-user
    * events landed in the preceding 5 minutes / 1 hour. A time-range join
    * expressed as native RANGE window frames over epoch micros: no
    * self-join at all, one shuffle on user_id, frames computed in a single
    * sorted pass. (The naive formulation is an inequality self-join —
    * O(n·m) nested loop at scale; the range frame is the plan you want.)
    * Counts are integers — order-insensitive, hash-stable. */
  def q15RangeLookback(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def w(micros: Long) = Window.partitionBy($"user_id")
      .orderBy(unix_micros($"ts"))
      .rangeBetween(-micros, 0L)
    Tables.events(s, dir).select(
      $"event_id", $"user_id",
      (count(lit(1)).over(w(300000000L)) - 1).as("prior_5m_cnt"),
      (count(lit(1)).over(w(3600000000L)) - 1).as("prior_1h_cnt"))
  }

  private val q15Sql =
    """SELECT event_id, user_id,
      |  COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |    RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW) - 1 AS prior_5m_cnt,
      |  COUNT(*) OVER (PARTITION BY user_id ORDER BY epoch_us(ts)
      |    RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) - 1 AS prior_1h_cnt
      |FROM events""".stripMargin

  /** Pivot domain passed explicitly: a dynamic pivot needs a full
    * discovery scan before planning and produces an unstable schema — at
    * 100 TB you always pass the (known) domain. Explicit values also pin
    * the output columns the oracle matches by name. */
  private val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  /** q16: pivot — per user-cohort event counts, one column per event
    * type. Plans as a single partial+final aggregate over
    * (cohort × 5 CASE counters): one shuffle of 10 rows × 5 ints, no
    * wide intermediate. Absent cells coalesce to 0 on both sides. */
  def q16Pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.events(s, dir)
      .select(pmod($"user_id", lit(10)).as("cohort"), $"event_type")
      .groupBy($"cohort")
      .pivot("event_type", EventTypes)
      .agg(count(lit(1)))
    p.select(($"cohort" +: EventTypes.map(t => coalesce(col(t), lit(0L)).as(t))): _*)
  }

  private val q16Sql = {
    val cols = EventTypes.map(t =>
      s"CAST(COALESCE(SUM(CASE WHEN event_type = '$t' THEN 1 END), 0) AS BIGINT) AS $t")
      .mkString(",\n  ")
    s"""SELECT user_id % 10 AS cohort,
       |  $cols
       |FROM events GROUP BY 1""".stripMargin
  }

  /** q17: full cube over (returnflag, linestatus) with the standard
    * `grouping_id` disambiguator (0 = detail row … 3 = grand total —
    * same bit order as SQL-standard GROUPING). Catalyst plans cube as
    * one Expand (4 grouping sets) + partial+final aggregate — rows
    * shuffled = groups × sets, not input × sets. */
  def q17Cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .cube($"l_returnflag", $"l_linestatus")
      .agg(sum($"l_quantity").as("sum_qty"), count(lit(1)).as("cnt"),
        grouping_id().cast("int").as("gid"))
      .select(
        coalesce($"l_returnflag", lit("ALL")).as("rflag"),
        coalesce($"l_linestatus", lit("ALL")).as("lstatus"),
        $"gid", $"sum_qty", $"cnt")
  }

  private val q17Sql =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rflag,
      |  COALESCE(l_linestatus, 'ALL') AS lstatus,
      |  CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid,
      |  SUM(l_quantity) AS sum_qty, COUNT(*) AS cnt
      |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)""".stripMargin

  /** q18: the `spark.sql(...)` entry point — the one API surface the
    * DataFrame-authored queries don't exercise. A correlated scalar
    * subquery (customers above their own nation's average balance),
    * which Catalyst de-correlates into an aggregate + join: the SQL text
    * and the DataFrame API land on the same plans, so everything the
    * other queries prove (pushdown, partial aggregation, broadcast)
    * holds here too. Registered as temp views per call — view
    * registration is idempotent. */
  def q18SqlEntry(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("g_customer")
    Tables.nation(s, dir).createOrReplaceTempView("g_nation")
    // the threshold average follows the Det discipline: exact DECIMAL sum
    // cast to double, then one double division — bit-identical in both
    // engines at any partition order, so the > comparison can never flip
    // on a boundary row (a raw double AVG is order-sensitive)
    s.sql(
      """SELECT n_name,
        |  COUNT(*) AS above_avg_cnt,
        |  MIN(c_acctbal) AS min_above
        |FROM g_customer c
        |JOIN g_nation n ON c_nationkey = n_nationkey
        |WHERE c_acctbal >
        |  (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |          / COUNT(*)
        |   FROM g_customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |GROUP BY n_name""".stripMargin)
  }

  private val q18Sql =
    """SELECT n_name,
      |  COUNT(*) AS above_avg_cnt,
      |  MIN(c_acctbal) AS min_above
      |FROM customer c
      |JOIN nation n ON c_nationkey = n_nationkey
      |WHERE c_acctbal >
      |  (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
      |          / COUNT(*)
      |   FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
      |GROUP BY n_name""".stripMargin

  /** q19: grouped string aggregation (LISTAGG) — the dup-cluster roster:
    * for every canonical-fingerprint group ([[TextOps.t5Fingerprint]]'s
    * key) holding ≥ 2 documents, the member doc-ids as one sorted
    * comma-joined string. `sort_array(collect_list(...))` pins the
    * element order so the aggregated STRING is deterministic at any
    * partitioning — an unordered listagg is not a checkable value. Group
    * payloads are bounded by cluster size; the shuffle carries (16-byte
    * digest, doc_id) pairs only. */
  def q19StringAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val fp = TextOps.canonicalFingerprint($"text")
    Tables.documents(s, dir)
      .select($"doc_id", fp.as("fingerprint"))
      .groupBy($"fingerprint")
      .agg(count(lit(1)).as("n_docs"),
        concat_ws(",",
          transform(sort_array(collect_list($"doc_id")), _.cast("string")))
          .as("doc_ids"))
      .where($"n_docs" >= 2)
  }

  private val q19Sql =
    s"""SELECT ${TextOps.canonicalFingerprintSql} AS fingerprint,
       |  COUNT(*) AS n_docs,
       |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS doc_ids
       |FROM documents
       |GROUP BY 1 HAVING COUNT(*) >= 2""".stripMargin

  /** q20: recursive CTE (`WITH RECURSIVE`, new SQL surface in Spark 4.x) —
    * hierarchical subtree rollup. Documents are placed on the implicit
    * binary-tree hierarchy parent(id) = id div 2 (the stand-in for any
    * real log-depth hierarchy: domain → site → page paths, category
    * trees) and every node aggregates its subtree's doc and token counts
    * — the recursive analog of rollup, inexpressible with static
    * grouping sets because the hierarchy depth is data-dependent.
    *
    * UNION ALL recursion is safe and LINEAR here because each node has
    * exactly one parent — total intermediate rows = Σ depth(doc) =
    * O(docs × log docs); cycle-free by construction (id strictly
    * decreases). Depth is O(log corpus) at any scale, so the recursion
    * terminates in ~45 levels even at 100 TB. Linear is NOT "small":
    * docs × log₂(docs) already brushes Spark's default 1M-row recursion
    * guard at ~50k docs, so the limit is raised explicitly here — but
    * SCOPED, not disabled: the bound is computed from the data (each doc
    * emits one row per ancestor level, ≤ 65 levels for any positive
    * 64-bit id, so docs × 65 + slack), the recursion runs eagerly under
    * it (`localCheckpoint(true)` forces execution — the conf is read at
    * run time, so a lazy return would escape the scope), and the prior
    * value is restored in a finally so the session keeps its
    * runaway-recursion guard for everything that runs after. Both
    * engines run the IDENTICAL query text modulo integer floor division
    * spelling (`div` vs `//`). */
  def q20RecursiveCte(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    docs.createOrReplaceTempView("g_documents")
    // metadata-only parquet count; one row per (doc, ancestor level)
    val bound = math.min(Int.MaxValue.toLong, docs.count() * 65L + 1024L)
    val confKey = "spark.sql.cteRecursionRowLimit"
    val prior = s.conf.get(confKey)
    s.conf.set(confKey, bound.toString)
    try {
      s.sql(
        """WITH RECURSIVE anc (doc_id, node, t) AS (
          |  SELECT doc_id, doc_id, size(split(text, ' ')) FROM g_documents
          |  UNION ALL
          |  SELECT doc_id, node div 2, t FROM anc WHERE node > 0)
          |SELECT node,
          |  COUNT(*) AS subtree_docs,
          |  CAST(SUM(t) AS BIGINT) AS subtree_tokens
          |FROM anc GROUP BY node""".stripMargin)
        .localCheckpoint(true)
    } finally s.conf.set(confKey, prior)
  }

  private val q20Sql =
    """WITH RECURSIVE anc (doc_id, node, t) AS (
      |  SELECT doc_id, doc_id, len(string_split(text, ' ')) FROM documents
      |  UNION ALL
      |  SELECT doc_id, node // 2, t FROM anc WHERE node > 0)
      |SELECT node,
      |  COUNT(*) AS subtree_docs,
      |  CAST(SUM(t) AS BIGINT) AS subtree_tokens
      |FROM anc GROUP BY node""".stripMargin

  /** q20b: the SAME subtree rollup as [[q20RecursiveCte]], computed
    * bottom-up level-wise instead of by materializing every (doc,
    * ancestor) pair — the 100 TB shape for deep-hierarchy rollups.
    *
    * Key structural fact: parent(n) = n div 2 drops exactly one bit, so a
    * node's level IS its bit length (`length(bin(n))` — exact integer
    * string arithmetic, no float log) and all children of a level-L node
    * sit at level L+1. Processing levels top-bit-length DOWN, a node's
    * subtree total is complete the moment its level is reached: each
    * round emits the completed level and folds its totals into the
    * parents' partials. Live state is one (node, docs, tokens) row per
    * OPEN node — O(nodes), never O(docs × depth); total rows shuffled
    * across all rounds = Σ level sizes = O(nodes), vs the recursion's
    * O(docs × depth) materialized ancestor rows. Rounds = bit length of
    * the max id (~13 at sf0.1, ~45 at 100 TB) of small jobs — the same
    * fixed-cost-per-round profile as d7's CC loop, and the same
    * per-round eager-checkpoint discipline (each round references the
    * partial relation twice: completed filter + open filter).
    *
    * Node 0 never matches a positive bit length (`bin(0)` = "0" has
    * length 1, same as node 1), so it is carried explicitly and emitted
    * after the loop. Oracle: IDENTICAL SQL to q20 — the driver's hash
    * compare proves the two formulations equal; RelationalOpsSpec pins
    * it engine-side too. */
  def q20LevelRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val own = Tables.documents(s, dir)
      .select($"doc_id".as("node"), lit(1L).as("docs"),
        size(split($"text", " ")).cast("long").as("tokens"))
    val lvlOf = length(bin($"node"))
    var agg = own.localCheckpoint(true)
    val top = agg.agg(max(when($"node" > 0, lvlOf))).collect()(0)
    val maxLvl = if (top.isNullAt(0)) 0 else top.getInt(0)
    val completed = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    for (lvl <- maxLvl to 1 by -1) {
      val cur = agg.where($"node" > 0 && lvlOf === lvl)
      completed += cur
      agg = agg.where($"node" === 0 || lvlOf < lvl)
        .unionByName(cur.select(expr("node div 2").as("node"),
          $"docs", $"tokens"))
        .groupBy($"node")
        .agg(sum($"docs").as("docs"), sum($"tokens").as("tokens"))
        .localCheckpoint(true)
    }
    completed += agg // only node 0 can remain open after level 1
    completed.reduce(_ unionByName _)
      .select($"node", $"docs".as("subtree_docs"),
        $"tokens".as("subtree_tokens"))
  }

  /** q21: LATERAL correlated subquery (the other new Spark 4.x SQL
    * surface next to q20's recursion) — per-nation top-3 customers by
    * balance, written as the per-row subquery a SQL author reaches for.
    * Catalyst decorrelates the LATERAL + ORDER BY + LIMIT into a
    * partitioned rank over one customer shuffle — the same physical plan
    * the window formulation (q9's shape) gets, which is the point: the
    * friendlier SQL spelling costs nothing. Raw column values pass
    * through untouched (no aggregation), so the compare is float-safe. */
  def q21LateralTopk(s: SparkSession, dir: String): DataFrame = {
    Tables.customer(s, dir).createOrReplaceTempView("g_customer")
    Tables.nation(s, dir).createOrReplaceTempView("g_nation")
    s.sql(
      """SELECT n.n_name, r.c_custkey, r.c_acctbal
        |FROM g_nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM g_customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 3) r""".stripMargin)
  }

  private val q21Sql =
    """SELECT n.n_name, r.c_custkey, r.c_acctbal
      |FROM nation n,
      |LATERAL (SELECT c_custkey, c_acctbal FROM customer c
      |         WHERE c.c_nationkey = n.n_nationkey
      |         ORDER BY c_acctbal DESC, c_custkey LIMIT 3) r""".stripMargin

  /** Salt fan-out for [[q22SkewSalted]] — 16 ways is enough to demonstrate
    * the spread at fixture scale; at 100 TB you size S to the hot key's
    * row share divided by a healthy task's row budget. */
  private[graft] val SkewSalts = 16

  /** q22: skew-mitigated aggregation, end-to-end — the manual salting
    * pattern [[graft.SkewSpec]] proves at plan level, registered against
    * the oracle. A deliberately pathological key is manufactured from
    * orders (every custkey not divisible by 10 collapses to key 0, so one
    * key owns ~90% of the table) and aggregated in two stages: stage 1
    * groups by (hot_key, salt) with salt = xxhash64(o_orderkey) % 16 —
    * the hot key's rows spread over 16 independent reducers — and stage 2
    * recombines the 16 partials per key. Every aggregate here is
    * decomposable across salts (counts/sums add, min/max fold), and the
    * money sum stays in DECIMAL through BOTH stages (exact integer
    * arithmetic — only the final value is cast to double), so the result
    * is bit-identical to the direct GROUP BY at any salt count.
    *
    * Honesty note (scaladoc is the contract): for purely algebraic
    * aggregates like these, Spark's map-side partial aggregation already
    * bounds per-task state, so the direct GROUP BY survives this skew
    * too. The salted shape is the device for when that defense fails —
    * holistic aggregates whose per-group state grows with the group
    * (exact percentiles, collect_list rosters, large UDAF buffers): the
    * final merge for the hot key must otherwise absorb the whole group on
    * one task. The plan audit asserts the mitigation's signature — first
    * exchange hash-partitions on (hot_key, salt), second on hot_key only
    * — and RelationalOpsSpec pins equality with the unsalted result plus
    * the actual 16-way spread of the hot key's stage-1 groups. */
  def q22SkewSalted(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val d182 = DecimalType(18, 2)
    Tables.orders(s, dir)
      .select(
        when($"o_custkey" % 10 =!= 0, lit(0L)).otherwise($"o_custkey")
          .as("hot_key"),
        pmod(xxhash64($"o_orderkey"), lit(SkewSalts)).as("salt"),
        $"o_totalprice")
      .groupBy($"hot_key", $"salt")
      .agg(count(lit(1)).as("cnt"),
        sum($"o_totalprice".cast(d182)).as("amt"),
        min($"o_totalprice").as("mn"),
        max($"o_totalprice").as("mx"))
      .groupBy($"hot_key")
      .agg(sum($"cnt").as("n_orders"),
        sum($"amt").cast("double").as("total_price"),
        min($"mn").as("min_price"),
        max($"mx").as("max_price"))
  }

  private val q22Sql =
    """SELECT CASE WHEN o_custkey % 10 <> 0 THEN 0 ELSE o_custkey END AS hot_key,
      |  COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price,
      |  MIN(o_totalprice) AS min_price,
      |  MAX(o_totalprice) AS max_price
      |FROM orders GROUP BY 1""".stripMargin

  /** q23: CDC merge — fold a change batch (updates + deletes) into a base
    * snapshot and emit the latest surviving row per key; the compaction
    * every periodically-refreshed corpus snapshot needs (the relational
    * complement of [[graft.operators.DedupOps.d8IncrementalDedup]]'s
    * screen-then-append).
    *
    * The change batch is manufactured deterministically from `orders` so
    * the DuckDB oracle can rebuild it bit-for-bit: the md5-hash slice
    * (graft.sources.Hash60 — the engine-portable uniform hash) sends 20%
    * of keys an update (status 'U', price doubled — an exact double op)
    * and a disjoint 10% a delete tombstone.
    *
    * Scale shape: latest-per-key is `max_by(struct(payload), version)` —
    * ONE hash aggregation with map-side partial merge, so per-task state
    * is one candidate row per distinct key seen and the hot path stays in
    * whole-stage codegen. The window alternative (`row_number() OVER
    * (PARTITION BY key ORDER BY version DESC)` = 1, the oracle's
    * spelling) must instead shuffle AND fully sort every replica of every
    * key before discarding all but one — at a 100 TB snapshot plus a 1%
    * change batch that is a full-corpus sort versus an agg that never
    * materializes more than the winners. Tombstones ride the same
    * aggregate (op='d' wins its key's max_by, then one filter drops it)
    * so delete propagation costs no extra pass. */
  def q23MergeLatest(s: SparkSession, dir: String): DataFrame =
    mergeLatest(cdcBatches(s, dir).reduce(_ unionByName _), "o_orderkey",
      Seq("o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"))

  /** The manufactured CDC stream shared by [[q23MergeLatest]] (which
    * folds it in one shot) and the streaming upsert sink
    * [[graft.streaming.StreamingOps.st8UpsertSink]] (which applies it
    * batch by batch): the initial snapshot (version 1), then the update
    * slice (version 2), then the delete slice (version 3) — arrival
    * order, disjoint hash slices. */
  private[graft] def cdcBatches(s: SparkSession, dir: String): Seq[DataFrame] = {
    val o = Tables.orders(s, dir)
    val slice = pmod(graft.sources.Hash60.col60(col("o_orderkey").cast("string")),
      lit(10))
    val snapshot = o.select(col("o_orderkey"), col("o_custkey"),
      col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"),
      lit(1L).as("version"), lit("i").as("op"))
    val updates = o.where(slice < 2).select(col("o_orderkey"), col("o_custkey"),
      lit("U").as("o_orderstatus"),
      (col("o_totalprice") * 2).as("o_totalprice"), col("o_orderpriority"),
      lit(2L).as("version"), lit("u").as("op"))
    val deletes = o.where(slice === 2).select(col("o_orderkey"),
      lit(null).cast("bigint").as("o_custkey"),
      lit(null).cast("string").as("o_orderstatus"),
      lit(null).cast("double").as("o_totalprice"),
      lit(null).cast("string").as("o_orderpriority"),
      lit(3L).as("version"), lit("d").as("op"))
    Seq(snapshot, updates, deletes)
  }

  /** The merge kernel of [[q23MergeLatest]], generic over key and payload
    * columns so the property spec can drive it with random multi-version
    * logs (the registered query's manufactured batch has exactly two
    * versions per key; real CDC logs carry arbitrarily many). `log` must
    * have a numeric `version` (distinct per key — CDC versions are
    * monotone) and an `op` column where 'd' marks a tombstone. */
  private[graft] def mergeLatest(log: DataFrame, key: String,
      payload: Seq[String]): DataFrame =
    log.groupBy(col(key))
      .agg(max_by(struct((payload :+ "op").map(col): _*), col("version"))
        .as("r"))
      .where(col("r.op") =!= "d")
      .select(col(key) +: payload.map(p => col(s"r.$p").as(p)): _*)

  /** SQL twin of [[cdcBatches]]' union — shared by the q23, st8 and q26
    * oracles so the three spellings of the log cannot drift. */
  private[graft] val cdcLogSql = {
    val h = graft.sources.Hash60.sql60("CAST(o_orderkey AS VARCHAR)")
    s"""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       |       o_orderpriority, 1 AS version, 'i' AS op
       |FROM orders
       |UNION ALL
       |SELECT o_orderkey, o_custkey, 'U', o_totalprice * 2,
       |       o_orderpriority, 2, 'u'
       |FROM orders WHERE $h % 10 < 2
       |UNION ALL
       |SELECT o_orderkey, NULL, NULL, NULL, NULL, 3, 'd'
       |FROM orders WHERE $h % 10 = 2""".stripMargin
  }

  private[graft] val q23Sql =
    s"""WITH v AS (
       |$cdcLogSql
       |), latest AS (
       |  SELECT *, row_number() OVER
       |    (PARTITION BY o_orderkey ORDER BY version DESC) AS rn
       |  FROM v)
       |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       |       o_orderpriority
       |FROM latest WHERE rn = 1 AND op <> 'd'""".stripMargin

  /** q26: the SCD2 (history-keeping) view of the SAME change log q23
    * compacts — every version of every key kept, with its validity
    * interval closed by the NEXT version (`lead`) and an `is_current`
    * flag (open interval, not a tombstone). Where q23's latest-state
    * compaction is an aggregate precisely so it never sorts dead
    * versions, SCD2 must emit every version — nothing to prune — so here
    * the full per-key window sort IS the right tool: one exchange on the
    * key, one sort, `lead` closes each interval. At 100 TB the history
    * table this produces is append-heavy and time-ordered per key — the
    * natural downstream layout is src3's clustering, and the natural
    * maintenance is src4's compaction. */
  def q26Scd2History(s: SparkSession, dir: String): DataFrame = {
    val byKey = Window.partitionBy(col("o_orderkey")).orderBy(col("version"))
    cdcBatches(s, dir).reduce(_ unionByName _)
      .withColumn("next_version", lead(col("version"), 1).over(byKey))
      .select(col("o_orderkey"), col("version"), col("op"),
        col("o_custkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderpriority"), col("next_version"),
        (col("next_version").isNull && col("op") =!= "d").as("is_current"))
  }

  private val q26Sql =
    s"""WITH v AS (
       |$cdcLogSql
       |), h AS (
       |  SELECT *, lead(version) OVER
       |    (PARTITION BY o_orderkey ORDER BY version) AS next_version
       |  FROM v)
       |SELECT o_orderkey, CAST(version AS BIGINT) AS version, op,
       |       o_custkey, o_orderstatus, o_totalprice, o_orderpriority,
       |       CAST(next_version AS BIGINT) AS next_version,
       |       (next_version IS NULL AND op <> 'd') AS is_current
       |FROM h""".stripMargin

  /** q24: strict 3-step funnel (view → click → purchase, each step
    * strictly after the previous user's FIRST qualifying event) computed
    * in ONE user-partitioned pass. The naive formulation is three
    * sequential join+aggregate rounds (first view, then first click
    * after it, then first purchase after that) — three shuffles of the
    * event log. Here running conditional minima over the per-user
    * time-ordered window carry each stage's frontier to every row, so
    * the whole funnel needs ONE exchange on user_id: `fv_run` = earliest
    * view so far; a click strictly after it is a qualifying click whose
    * running min is `fc_run`; a purchase strictly after THAT qualifies.
    * Both window steps share the same partitioning+sort (one Sort, two
    * Window operators, no second exchange — spec-asserted), and the
    * default RANGE frame makes running minima deterministic even under
    * timestamp ties (membership is by ts VALUE; the strict < gates
    * already exclude same-instant steps). The oracle uses the naive
    * 3-CTE SQL, so the driver's hash compare proves the single-pass
    * rewrite equal. RelationalOpsSpec additionally pins equality against
    * the 3-aggregation DataFrame formulation. */
  def q24Funnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts")
    val staged = Tables.events(s, dir)
      .select($"user_id", $"ts", $"event_type")
      .withColumn("fv_run", min(when($"event_type" === "view", $"ts")).over(w))
      .withColumn("cav",
        when($"event_type" === "click" && $"fv_run" < $"ts", $"ts"))
      .withColumn("fc_run", min($"cav").over(w))
      .withColumn("pac",
        when($"event_type" === "purchase" && $"fc_run" < $"ts", $"ts"))
    val perUser = staged.groupBy($"user_id")
      .agg(min(when($"event_type" === "view", $"ts")).as("fv"),
        min($"cav").as("fc"), min($"pac").as("fp"))
    perUser.agg(
      count($"fv").as("users_view"),
      count($"fc").as("users_click"),
      count($"fp").as("users_purchase"),
      round(count($"fp").cast("double") / count($"fv").cast("double"), 6)
        .as("view_to_purchase"))
  }

  private val q24Sql =
    """WITH fv AS (SELECT user_id, min(ts) AS fv FROM events
      |            WHERE event_type = 'view' GROUP BY 1),
      |fc AS (SELECT e.user_id, min(e.ts) AS fc
      |       FROM events e JOIN fv USING (user_id)
      |       WHERE e.event_type = 'click' AND e.ts > fv.fv GROUP BY 1),
      |fp AS (SELECT e.user_id, min(e.ts) AS fp
      |       FROM events e JOIN fc USING (user_id)
      |       WHERE e.event_type = 'purchase' AND e.ts > fc.fc GROUP BY 1)
      |SELECT (SELECT count(*) FROM fv) AS users_view,
      |       (SELECT count(*) FROM fc) AS users_click,
      |       (SELECT count(*) FROM fp) AS users_purchase,
      |       round(CAST((SELECT count(*) FROM fp) AS DOUBLE) /
      |             CAST((SELECT count(*) FROM fv) AS DOUBLE), 6)
      |         AS view_to_purchase""".stripMargin

  /** Microseconds per week and the 2024-01-01T00:00Z epoch base shared by
    * [[q25RetentionCohort]] and its oracle — week indices are pure
    * integer arithmetic on micros (no engine week-truncation semantics
    * to align). */
  private[graft] val WeekUs = 7L * 24 * 3600 * 1000000L
  private[graft] val CohortEpochUs = 1704067200000000L

  /** q25: retention cohort grid — users bucketed by first-seen week,
    * counted distinct in every subsequent activity week offset; the
    * activation/retention triangle behind every "week-N retention"
    * metric. Scale shape: the first-seen aggregation and the events⋈
    * first-seen join share ONE key (user_id), so the log shuffles once
    * and the join is co-partitioned (at fixture scale AQE broadcasts the
    * per-user relation instead — both are the right call at their size);
    * the final distinct-count aggregation works on (cohort, offset,
    * user) triples, orders of magnitude smaller than the log. Week
    * indices are integer micros arithmetic against a fixed epoch base,
    * identical in both engines (no date_trunc('week') semantics
    * dependence). */
  def q25RetentionCohort(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val first = ev.groupBy($"user_id")
      .agg(min(unix_micros($"ts")).as("f0"))
    ev.join(first, Seq("user_id"))
      .select($"user_id",
        expr(s"(f0 - ${CohortEpochUs}L) div ${WeekUs}L").as("cohort_week"),
        expr(s"(unix_micros(ts) - f0) div ${WeekUs}L").as("week_offset"))
      .groupBy($"cohort_week", $"week_offset")
      .agg(countDistinct($"user_id").as("active_users"))
  }

  private val q25Sql =
    s"""WITH f AS (SELECT user_id, min(epoch_us(ts)) AS f0
       |           FROM events GROUP BY 1)
       |SELECT (f.f0 - $CohortEpochUs) // $WeekUs AS cohort_week,
       |       (epoch_us(e.ts) - f.f0) // $WeekUs AS week_offset,
       |       count(DISTINCT e.user_id) AS active_users
       |FROM events e JOIN f USING (user_id)
       |GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q5_join_broadcast" -> q5JoinBroadcast _,
    "q6_join_sortmerge" -> q6JoinSortMerge _,
    "q7_semi_anti" -> q7SemiAnti _,
    "q8_window" -> q8Window _,
    "q9_topk" -> q9TopK _,
    "q10_rollup" -> q10Rollup _,
    "q11_distinct_agg" -> q11DistinctAgg _,
    "q12_setops" -> q12SetOps _,
    "q13_scalar_battery" -> q13ScalarBattery _,
    "q14_asof_join" -> q14AsofJoin _,
    "q15_range_lookback" -> q15RangeLookback _,
    "q16_pivot" -> q16Pivot _,
    "q17_cube" -> q17Cube _,
    "q18_sql_entry" -> q18SqlEntry _,
    "q19_string_agg" -> q19StringAgg _,
    "q20_recursive_cte" -> q20RecursiveCte _,
    "q20b_level_rollup" -> q20LevelRollup _,
    "q21_lateral_topk" -> q21LateralTopk _,
    "q22_skew_salted" -> q22SkewSalted _,
    "q23_merge_latest" -> q23MergeLatest _,
    "q24_funnel" -> q24Funnel _,
    "q25_retention_cohort" -> q25RetentionCohort _,
    "q26_scd2_history" -> q26Scd2History _)

  val oracleSql: Map[String, String] = Map(
    "q5_join_broadcast" -> q5Sql,
    "q6_join_sortmerge" -> q6Sql,
    "q7_semi_anti" -> q7Sql,
    "q8_window" -> q8Sql,
    "q9_topk" -> q9Sql,
    "q10_rollup" -> q10Sql,
    "q11_distinct_agg" -> q11Sql,
    "q12_setops" -> q12Sql,
    "q13_scalar_battery" -> q13Sql,
    "q14_asof_join" -> q14Sql,
    "q15_range_lookback" -> q15Sql,
    "q16_pivot" -> q16Sql,
    "q17_cube" -> q17Sql,
    "q18_sql_entry" -> q18Sql,
    "q19_string_agg" -> q19Sql,
    "q20_recursive_cte" -> q20Sql,
    // deliberately the SAME oracle text: the driver's hash compare is the
    // proof that the level-wise rewrite equals the recursive formulation
    "q20b_level_rollup" -> q20Sql,
    "q21_lateral_topk" -> q21Sql,
    "q22_skew_salted" -> q22Sql,
    "q23_merge_latest" -> q23Sql,
    "q24_funnel" -> q24Sql,
    "q25_retention_cohort" -> q25Sql,
    "q26_scd2_history" -> q26Sql)
}
