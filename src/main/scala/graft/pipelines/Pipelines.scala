package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** The 12 reference example pipelines (`/root/reference/examples/`, see
  * SURVEY.md §2B) re-expressed Spark-first over the driver testdata schemas
  * (FIXTURES.md §2). Each query is paired with DuckDB oracle SQL.
  *
  * Cross-engine float determinism rules (Spark vs DuckDB must hash-match):
  *  - per-row arithmetic is bit-identical across engines (same IEEE ops in the
  *    same order) → no rounding;
  *  - per-group sums of p-decimal inputs are `round(sum, p)` — group sizes are
  *    keyed so they stay small as SF grows, keeping FP association error far
  *    below the rounding boundary;
  *  - averages/ratios are expressed as round(sum,p)/count so both engines
  *    divide identical doubles — never `avg()` of raw doubles;
  *  - large-group aggregates are integer-valued (counts, integer-valued sums);
  *  - DECIMAL values CAST to double must keep their significand (value×10^scale)
  *    under 2^53: above it, DuckDB's two-step conversion (int128→double, then
  *    ÷10^scale) double-rounds where Java rounds once — subtract large
  *    near-equal decimals IN decimal and convert only the small difference
  *    (diagnosed on q175's ≈1e12 between-group sum at 12 dp);
  *  - the REVERSE cast (arbitrary double → DECIMAL(38,s)) is tie-unsafe:
  *    Spark rounds the double's SHORTEST decimal rendering while DuckDB
  *    rounds its full binary expansion, and a value whose (s+1)-th digit
  *    sits at a representation boundary flips (diagnosed on q199's n·σ
  *    weights at 12 dp). Decimal-casting is safe for values ALREADY on a
  *    p-decimal grid (the round(sum, p) outputs above); for arbitrary
  *    doubles quantize with FLOOR(x · 10^s) into BIGINT instead — floor
  *    has no tie semantics.
  */
object Pipelines {

  /** script_01_bronze_ingest_orders.py (reference :6-27): typed ingest with
    * casts, to_date, upper/lower, when/otherwise ladder, abs, coalesce, filter. */
  val q01: Q = Q(
    "q01_bronze_ingest",
    (s, dir) => {
      Tables.orders(s, dir)
        .filter(col("o_totalprice") >= 0 && col("o_orderdate").isNotNull)
        .select(
          col("o_orderkey"),
          col("o_custkey"),
          to_date(col("o_orderdate")).as("order_date"),
          upper(col("o_orderpriority")).as("channel"),
          lower(col("o_orderstatus")).as("status_lc"),
          when(col("o_orderstatus") === "F", 1).otherwise(0).as("is_refund"),
          abs(col("o_totalprice")).as("abs_amount"),
          when(col("o_totalprice") < 50000, "low")
            .when(col("o_totalprice") < 200000, "mid")
            .otherwise("high").as("amount_bucket"),
          coalesce(col("o_orderpriority"), lit("none")).as("priority"))
    },
    Some("""SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE) AS order_date,
      UPPER(o_orderpriority) AS channel, LOWER(o_orderstatus) AS status_lc,
      CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS is_refund,
      ABS(o_totalprice) AS abs_amount,
      CASE WHEN o_totalprice < 50000 THEN 'low' WHEN o_totalprice < 200000 THEN 'mid' ELSE 'high' END AS amount_bucket,
      COALESCE(o_orderpriority, 'none') AS priority
      FROM orders WHERE o_totalprice >= 0 AND o_orderdate IS NOT NULL"""))

  /** script_02_dim_customer_latest.py (:6-25): latest-record dedup via
    * row_number over (partition, order desc) + rank/dense_rank + tier ladder +
    * regexp_extract. */
  val q02: Q = Q(
    "q02_dim_latest",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .withColumn("rnk", rank().over(w).cast("long"))
        .withColumn("drnk", dense_rank().over(w).cast("long"))
        .filter(col("rn") === 1)
        .drop("rn")
        .select(
          col("o_custkey").as("customer_id"),
          col("o_orderkey").as("latest_order"),
          col("o_totalprice").as("latest_amount"),
          col("rnk"), col("drnk"),
          when(col("o_totalprice") >= 300000, "platinum")
            .when(col("o_totalprice") >= 150000, "gold")
            .when(col("o_totalprice") >= 50000, "silver")
            .otherwise("bronze").as("value_tier"),
          regexp_extract(lower(col("o_orderpriority")), "^(\\d+)-", 1).as("priority_code"))
    },
    Some("""SELECT customer_id, latest_order, latest_amount, rnk, drnk,
      CASE WHEN latest_amount >= 300000 THEN 'platinum' WHEN latest_amount >= 150000 THEN 'gold'
           WHEN latest_amount >= 50000 THEN 'silver' ELSE 'bronze' END AS value_tier,
      regexp_extract(lower(o_orderpriority), '^(\d+)-', 1) AS priority_code
      FROM (
        SELECT o_custkey AS customer_id, o_orderkey AS latest_order, o_totalprice AS latest_amount,
               o_orderpriority,
               row_number() OVER w AS rn,
               CAST(rank() OVER w AS BIGINT) AS rnk,
               CAST(dense_rank() OVER w AS BIGINT) AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC)
      ) t WHERE rn = 1"""))

  /** script_03_fact_orders_enriched.py (:4-35): left join to dim + lag/lead +
    * delta + rolling 7/30 sums over rowsBetween frames. */
  val q03: Q = Q(
    "q03_fact_enriched",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val c = Tables.customer(s, dir)
      val j = o.join(c, o("o_custkey") === c("c_custkey"), "left")
        .select(
          o("o_orderkey"), o("o_custkey"),
          to_date(o("o_orderdate")).as("order_date"),
          o("o_totalprice").as("amount"),
          c("c_name"), c("c_mktsegment"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("order_date"), col("o_orderkey"))
      j.withColumn("prev_amount", lag(col("amount"), 1).over(w))
        .withColumn("next_amount", lead(col("amount"), 1).over(w))
        .withColumn("amount_delta_prev", col("amount") - coalesce(col("prev_amount"), lit(0.0)))
        .withColumn("rolling_7_sum", round(sum(col("amount")).over(w.rowsBetween(-6, 0)), 4))
        .withColumn("rolling_30_sum", round(sum(col("amount")).over(w.rowsBetween(-29, 0)), 4))
    },
    Some("""SELECT o.o_orderkey, o.o_custkey, CAST(o.o_orderdate AS DATE) AS order_date,
      o.o_totalprice AS amount, c.c_name, c.c_mktsegment,
      lag(o.o_totalprice, 1) OVER w AS prev_amount,
      lead(o.o_totalprice, 1) OVER w AS next_amount,
      o.o_totalprice - COALESCE(lag(o.o_totalprice, 1) OVER w, 0.0) AS amount_delta_prev,
      ROUND(SUM(o.o_totalprice) OVER (PARTITION BY o.o_custkey ORDER BY CAST(o.o_orderdate AS DATE), o.o_orderkey ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS rolling_7_sum,
      ROUND(SUM(o.o_totalprice) OVER (PARTITION BY o.o_custkey ORDER BY CAST(o.o_orderdate AS DATE), o.o_orderkey ROWS BETWEEN 29 PRECEDING AND CURRENT ROW), 4) AS rolling_30_sum
      FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
      WINDOW w AS (PARTITION BY o.o_custkey ORDER BY CAST(o.o_orderdate AS DATE), o.o_orderkey)"""))

  /** script_04_dim_product_sql_cte.py (:9-41): SQL multi-CTE with TRIM/LOWER/
    * UPPER, CAST, ROUND, CASE price bands. Same SQL text runs on both engines
    * except STRING/VARCHAR. */
  private def q04Sql(strTy: String) =
    s"""WITH typed AS (
      SELECT CAST(p_partkey AS $strTy) AS product_id,
             TRIM(LOWER(p_type)) AS category,
             UPPER(p_brand) AS brand,
             CAST(p_retailprice AS DOUBLE) AS price,
             CAST(p_size AS INT) AS size
      FROM part
    ), final AS (
      SELECT product_id, category, brand, price, size,
             ROUND(price * 0.8, 4) AS cost,
             ROUND(price - price * 0.8, 4) AS unit_margin,
             CASE WHEN price >= 1500 THEN 'premium' WHEN price >= 1000 THEN 'standard' ELSE 'value' END AS price_band
      FROM typed
    )
    SELECT product_id, category, brand, price, size, cost, unit_margin, price_band FROM final"""

  val q04: Q = Q(
    "q04_dim_product_sql_cte",
    (s, dir) => {
      Tables.part(s, dir).createOrReplaceTempView("part")
      s.sql(q04Sql("STRING"))
    },
    Some(q04Sql("VARCHAR")))

  /** script_05_sales_margin_rank.py (:6-29): fact-dim inner join, margin math,
    * rank/dense_rank per brand, top-10 flag. Margin expression order matches
    * the oracle exactly so the doubles are bit-identical. */
  val q05: Q = Q(
    "q05_sales_margin_rank",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      val base = li.join(p, li("l_partkey") === p("p_partkey"), "inner")
        .select(
          li("l_orderkey"), li("l_linenumber"), li("l_partkey"), p("p_brand"),
          li("l_quantity"), li("l_extendedprice"), li("l_discount"), p("p_retailprice"))
        .withColumn("revenue", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .withColumn("unit_cost", col("p_retailprice") * lit(0.8))
        .withColumn("margin", col("revenue") - col("l_quantity") * col("unit_cost"))
      val w = Window.partitionBy(col("p_brand")).orderBy(col("margin").desc)
      base
        .withColumn("margin_rank", rank().over(w).cast("long"))
        .withColumn("margin_dense_rank", dense_rank().over(w).cast("long"))
        .withColumn("is_top10", when(col("margin_rank") <= 10, 1).otherwise(0))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, p_brand, l_quantity, l_extendedprice,
      l_discount, p_retailprice,
      l_extendedprice * (1.0 - l_discount) AS revenue,
      p_retailprice * 0.8 AS unit_cost,
      l_extendedprice * (1.0 - l_discount) - l_quantity * (p_retailprice * 0.8) AS margin,
      CAST(rank() OVER w AS BIGINT) AS margin_rank,
      CAST(dense_rank() OVER w AS BIGINT) AS margin_dense_rank,
      CASE WHEN rank() OVER w <= 10 THEN 1 ELSE 0 END AS is_top10
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WINDOW w AS (PARTITION BY p_brand ORDER BY l_extendedprice * (1.0 - l_discount) - l_quantity * (p_retailprice * 0.8) DESC)"""))

  /** script_06_web_sessionization.py (:7-41): 30-min-gap sessionization — lag +
    * gap flag + running sum (the order-sensitive trick) + per-session aggregates
    * incl. COUNT(DISTINCT). */
  val q06: Q = Q(
    "q06_sessionization",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("is_new_session",
          when(col("prev_ts").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800, 1L)
            .otherwise(0L))
        .withColumn("session_seq",
          sum(col("is_new_session")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("session_id",
          concat_ws("-", col("user_id").cast("string"), col("session_seq").cast("string")))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          min(col("ts")).as("session_start_ts"),
          max(col("ts")).as("session_end_ts"),
          count(lit(1)).as("events_n"),
          countDistinct(col("event_type")).as("unique_types"),
          round(sum(col("value")), 4).as("session_value"))
    },
    Some("""WITH ev AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
      ), flagged AS (
        SELECT user_id, event_id, ts, event_type, value,
          CASE WHEN lag(ts, 1) OVER w IS NULL
                 OR date_diff('second', lag(ts, 1) OVER w, ts) > 1800 THEN 1 ELSE 0 END AS is_new_session
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      ), sess AS (
        SELECT *, CAST(SUM(is_new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        FROM flagged
      )
      SELECT user_id,
        CAST(user_id AS VARCHAR) || '-' || CAST(session_seq AS VARCHAR) AS session_id,
        MIN(ts) AS session_start_ts, MAX(ts) AS session_end_ts,
        COUNT(1) AS events_n, COUNT(DISTINCT event_type) AS unique_types,
        ROUND(SUM(value), 4) AS session_value
      FROM sess GROUP BY user_id, session_id"""))

  /** script_07_fraud_scoring.py (:8-38): additive risk flags via when-chains,
    * per-day rank + percent_rank, bucket by percent_rank thresholds. */
  val q07: Q = Q(
    "q07_fraud_scoring",
    (s, dir) => {
      val scored = Tables.events(s, dir)
        .select(col("event_id"), col("user_id"), col("ts"), col("event_type"), col("value"))
        .withColumn("event_date", to_date(col("ts")))
        .withColumn("high_value_flag", when(col("value") > 150, 1).otherwise(0))
        .withColumn("risk_from_type",
          when(col("event_type") === "error", 2)
            .when(col("event_type").isin("signup", "purchase"), 1)
            .otherwise(0))
        .withColumn("risk_from_hour", when(hour(col("ts")) < 6, 1).otherwise(0))
        .withColumn("raw_risk_score",
          col("high_value_flag") + col("risk_from_type") + col("risk_from_hour"))
      val w = Window.partitionBy(col("event_date"))
        .orderBy(col("raw_risk_score").desc, col("value").desc, col("event_id"))
      scored
        .withColumn("risk_rank_day", rank().over(w).cast("long"))
        .withColumn("risk_percent_rank_day", percent_rank().over(w))
        .withColumn("risk_bucket",
          when(col("risk_percent_rank_day") <= 0.1, "high")
            .when(col("risk_percent_rank_day") <= 0.5, "medium")
            .otherwise("low"))
    },
    Some("""WITH ev AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
      ), scored AS (
        SELECT event_id, user_id, ts, event_type, value,
          CAST(ts AS DATE) AS event_date,
          CASE WHEN value > 150 THEN 1 ELSE 0 END AS high_value_flag,
          CASE WHEN event_type = 'error' THEN 2 WHEN event_type IN ('signup','purchase') THEN 1 ELSE 0 END AS risk_from_type,
          CASE WHEN hour(ts) < 6 THEN 1 ELSE 0 END AS risk_from_hour
        FROM ev
      ), s2 AS (
        SELECT *, high_value_flag + risk_from_type + risk_from_hour AS raw_risk_score FROM scored
      )
      SELECT event_id, user_id, ts, event_type, value, event_date, high_value_flag,
        risk_from_type, risk_from_hour, raw_risk_score,
        CAST(rank() OVER w AS BIGINT) AS risk_rank_day,
        percent_rank() OVER w AS risk_percent_rank_day,
        CASE WHEN percent_rank() OVER w <= 0.1 THEN 'high'
             WHEN percent_rank() OVER w <= 0.5 THEN 'medium' ELSE 'low' END AS risk_bucket
      FROM s2
      WINDOW w AS (PARTITION BY event_date ORDER BY raw_risk_score DESC, value DESC, event_id)"""))

  /** script_08_delta_merge_scd1_customer.py (:10-36): Delta MERGE (SCD1 upsert)
    * emulated Spark-first as full_outer join + coalesce precedence (no Delta jar
    * in /opt/spark/jars). Fixed-literal ingest timestamp for determinism. */
  val q08: Q = Q(
    "q08_scd1_merge",
    (s, dir) => {
      val c = Tables.customer(s, dir)
      val target = c.filter(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_mktsegment"))
      val updates = c.filter(col("c_custkey") % 2 === 0)
        .select(
          col("c_custkey").as("u_custkey"),
          col("c_name").as("u_name"),
          (col("c_acctbal") * lit(1.1)).as("u_acctbal"))
      target.join(updates, target("c_custkey") === updates("u_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("u_custkey")).as("customer_id"),
          coalesce(col("u_name"), col("c_name")).as("name"),
          when(col("u_custkey").isNotNull, col("u_acctbal")).otherwise(col("c_acctbal")).as("acctbal"),
          when(col("u_custkey").isNotNull, lit("UPDATED")).otherwise(col("c_mktsegment")).as("segment"),
          when(col("u_custkey").isNotNull && col("c_custkey").isNotNull, "updated")
            .when(col("c_custkey").isNull, "inserted")
            .otherwise("unchanged").as("merge_action"),
          to_timestamp(lit("2024-01-01 00:00:00")).as("ingested_at"))
    },
    Some("""WITH target AS (
        SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer WHERE c_custkey % 3 <> 0
      ), updates AS (
        SELECT c_custkey AS u_custkey, c_name AS u_name, c_acctbal * 1.1 AS u_acctbal
        FROM customer WHERE c_custkey % 2 = 0
      )
      SELECT COALESCE(t.c_custkey, u.u_custkey) AS customer_id,
        COALESCE(u.u_name, t.c_name) AS name,
        CASE WHEN u.u_custkey IS NOT NULL THEN u.u_acctbal ELSE t.c_acctbal END AS acctbal,
        CASE WHEN u.u_custkey IS NOT NULL THEN 'UPDATED' ELSE t.c_mktsegment END AS segment,
        CASE WHEN u.u_custkey IS NOT NULL AND t.c_custkey IS NOT NULL THEN 'updated'
             WHEN t.c_custkey IS NULL THEN 'inserted' ELSE 'unchanged' END AS merge_action,
        TIMESTAMP '2024-01-01 00:00:00' AS ingested_at
      FROM target t FULL OUTER JOIN updates u ON t.c_custkey = u.u_custkey"""))

  /** script_09_sql_merge_inventory.py (:9-26): SQL MERGE with a conditional
    * match clause (s.updated_at >= t.updated_at) emulated via dedup-latest on
    * both sides + full_outer + conditional precedence. */
  val q09: Q = Q(
    "q09_conditional_merge",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").desc, col("event_id").desc)
      def latest(df: DataFrame): DataFrame =
        df.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      val target = latest(ev.filter(col("event_id") % 2 === 0))
        .select(col("user_id"), col("value").as("t_on_hand"), col("ts").as("t_updated_at"))
      val source = latest(ev.filter(col("event_id") % 2 === 1))
        .select(col("user_id").as("s_user_id"), col("value").as("s_on_hand"), col("ts").as("s_updated_at"))
      val takeSource = col("s_user_id").isNotNull &&
        (col("user_id").isNull || col("s_updated_at") >= col("t_updated_at"))
      target.join(source, col("user_id") === col("s_user_id"), "full_outer")
        .select(
          coalesce(col("user_id"), col("s_user_id")).as("entity_id"),
          when(takeSource, col("s_on_hand")).otherwise(col("t_on_hand")).as("on_hand"),
          when(takeSource, col("s_updated_at")).otherwise(col("t_updated_at")).as("updated_at"),
          when(col("user_id").isNull, "inserted")
            .when(col("s_user_id").isNotNull && col("s_updated_at") >= col("t_updated_at"), "updated")
            .otherwise("kept").as("merge_action"))
    },
    Some("""WITH ev AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM events
      ), tgt AS (
        SELECT user_id, value AS t_on_hand, ts AS t_updated_at FROM (
          SELECT user_id, value, ts,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM ev WHERE event_id % 2 = 0) WHERE rn = 1
      ), src AS (
        SELECT user_id AS s_user_id, value AS s_on_hand, ts AS s_updated_at FROM (
          SELECT user_id, value, ts,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
          FROM ev WHERE event_id % 2 = 1) WHERE rn = 1
      )
      SELECT COALESCE(t.user_id, s.s_user_id) AS entity_id,
        CASE WHEN s.s_user_id IS NOT NULL AND (t.user_id IS NULL OR s.s_updated_at >= t.t_updated_at)
             THEN s.s_on_hand ELSE t.t_on_hand END AS on_hand,
        CASE WHEN s.s_user_id IS NOT NULL AND (t.user_id IS NULL OR s.s_updated_at >= t.t_updated_at)
             THEN s.s_updated_at ELSE t.t_updated_at END AS updated_at,
        CASE WHEN t.user_id IS NULL THEN 'inserted'
             WHEN s.s_user_id IS NOT NULL AND s.s_updated_at >= t.t_updated_at THEN 'updated'
             ELSE 'kept' END AS merge_action
      FROM tgt t FULL OUTER JOIN src s ON t.user_id = s.s_user_id"""))

  /** script_10_mart_customer_value.py (:12-65): 3-stage CTE mart — daily
    * rollup → customer rollup with conditional aggregates → segmentation CASE.
    * Identical SQL text runs on Spark and DuckDB (deliberately dialect-neutral);
    * avg expressed as round(sum)/count for bit-stable doubles. */
  private val q10Sql =
    """WITH daily AS (
      SELECT o_custkey AS customer_id, CAST(o_orderdate AS DATE) AS order_date,
             ROUND(SUM(o_totalprice), 2) AS daily_spend,
             ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice ELSE 0.0 END), 2) AS daily_refunds,
             CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS refund_orders,
             COUNT(1) AS orders_n,
             MAX(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS any_urgent
      FROM orders
      GROUP BY o_custkey, CAST(o_orderdate AS DATE)
    ), rollup_c AS (
      SELECT customer_id,
             ROUND(SUM(daily_spend), 2) AS total_spend,
             ROUND(SUM(daily_refunds), 2) AS total_refunds,
             CAST(SUM(refund_orders) AS BIGINT) AS total_refund_orders,
             CAST(SUM(orders_n) AS BIGINT) AS total_orders,
             ROUND(SUM(daily_spend), 2) / COUNT(1) AS avg_daily_spend,
             MAX(any_urgent) AS ever_urgent
      FROM daily GROUP BY customer_id
    )
    SELECT r.customer_id, c.c_name, c.c_mktsegment,
           r.total_spend, r.total_refunds,
           ROUND(r.total_spend - r.total_refunds, 2) AS net_spend,
           r.total_refund_orders, r.total_orders, r.avg_daily_spend, r.ever_urgent,
           CASE WHEN r.total_spend >= 1500000 THEN 'vip'
                WHEN r.total_spend >= 700000 THEN 'loyal'
                WHEN r.total_spend >= 200000 THEN 'active' ELSE 'light' END AS customer_segment
    FROM rollup_c r LEFT JOIN customer c ON r.customer_id = c.c_custkey"""

  val q10: Q = Q(
    "q10_mart_customer_value",
    (s, dir) => {
      Tables.orders(s, dir).createOrReplaceTempView("orders")
      Tables.customer(s, dir).createOrReplaceTempView("customer")
      s.sql(q10Sql)
    },
    Some(q10Sql))

  /** script_a_customer_agg.py (:3-15) — the flagship minimum slice: multi-agg
    * groupBy + post-agg derived flag. Keys scale with SF so groups stay small. */
  val q11: Q = Q(
    "q11_customer_agg",
    (s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_suppkey"), col("l_returnflag"))
        .agg(
          round(sum(col("l_quantity")), 2).as("total_qty"),
          round(sum(col("l_extendedprice")), 2).as("total_price"),
          count(lit(1)).as("line_count"))
        .withColumn("big_qty", when(col("total_qty") > 1000, 1).otherwise(0))
    },
    Some("""SELECT l_suppkey, l_returnflag,
      ROUND(SUM(l_quantity), 2) AS total_qty,
      ROUND(SUM(l_extendedprice), 2) AS total_price,
      COUNT(1) AS line_count,
      CASE WHEN ROUND(SUM(l_quantity), 2) > 1000 THEN 1 ELSE 0 END AS big_qty
      FROM lineitem GROUP BY l_suppkey, l_returnflag"""))

  /** script_b_join_products.py (:3-13): keyword-style left join + per-row
    * derived value + boolean flag. */
  val q12: Q = Q(
    "q12_join_products",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val p = Tables.part(s, dir)
      li.join(p, li("l_partkey") === p("p_partkey"), "left")
        .select(
          li("l_orderkey"), li("l_linenumber"), li("l_partkey"), li("l_quantity"),
          p("p_name"), p("p_retailprice"),
          (col("l_quantity") * col("p_retailprice")).as("line_value"),
          when(col("p_retailprice") > 1500, 1).otherwise(0).as("is_expensive"))
    },
    Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, p_name, p_retailprice,
      l_quantity * p_retailprice AS line_value,
      CASE WHEN p_retailprice > 1500 THEN 1 ELSE 0 END AS is_expensive
      FROM lineitem LEFT JOIN part ON l_partkey = p_partkey"""))

  val all: Seq[Q] = Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q10, q11, q12)
}
