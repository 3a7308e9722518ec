package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Lakehouse / warehouse maintenance operators beyond the reference's
  * pipeline surface (its merge layer stops at SCD1 upsert,
  * /root/reference/examples/script_08_delta_merge_scd1_customer.py): SCD2
  * history build,
  * snapshot-diff change data capture, point-in-interval range join, partition
  * skipping-stats collection, and schema-evolution reads. Each is fully
  * oracled against DuckDB on the same tables.
  *
  * 100 TB shapes: q64 is two windows over the natural (custkey) partition —
  * no global sort; q65 is one co-partitioned full-outer shuffle join on the
  * snapshot key (both sides are snapshots of the same table, so AQE plans a
  * sort-merge join with neither side broadcast); q66 turns an O(rows ×
  * intervals) non-equi join (Spark would plan BroadcastNestedLoopJoin) into
  * a day-binned equi join against a broadcast interval table; q70 is a
  * single map-side-combined aggregate; q72's merged read prunes to the
  * union schema at the parquet footer level.
  */
object Warehouse {

  // ---- q64: SCD2 history build -------------------------------------------
  /** Build a type-2 slowly-changing dimension from an update log: orders are
    * the change stream of each customer's priority attribute; emit one
    * validity interval per attribute change with [valid_from, valid_to) and
    * an is_current flag. Two windows over the same (custkey, orderdate,
    * orderkey) ordering — Catalyst plans ONE shuffle + sort reused by both.
    * Ties on o_orderdate are broken by o_orderkey so lag/lead are total-order
    * deterministic in both engines. */
  val scd2History: Q = Q(
    "q64_scd2_history",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .withColumn("prev", lag("o_orderpriority", 1).over(w))
        .filter(col("prev").isNull || col("prev") =!= col("o_orderpriority"))
        .select(col("o_custkey").as("custkey"),
          col("o_orderpriority").as("priority"),
          col("o_orderdate").as("valid_from"),
          lead("o_orderdate", 1).over(w).as("valid_to"),
          when(lead("o_orderdate", 1).over(w).isNull, 1).otherwise(0).as("is_current"))
    },
    Some("""WITH v AS (
        SELECT o_custkey, o_orderkey, o_orderdate, o_orderpriority,
               lag(o_orderpriority) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS prev
        FROM orders
      ), chg AS (
        SELECT * FROM v WHERE prev IS NULL OR prev <> o_orderpriority
      )
      SELECT o_custkey AS custkey, o_orderpriority AS priority,
             o_orderdate AS valid_from,
             lead(o_orderdate) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS valid_to,
             CASE WHEN lead(o_orderdate) OVER (PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) IS NULL THEN 1 ELSE 0 END AS is_current
      FROM chg"""))

  // ---- q65: snapshot-diff CDC --------------------------------------------
  /** Change data capture by snapshot diff: derive a "new" snapshot of the
    * customer dimension deterministically (deletes where custkey%13=0,
    * balance+segment updates where custkey%7=0, inserts keyed custkey+10M
    * where custkey%11=0), full-outer join it against the old snapshot on the
    * key, and emit one I/U/D row per changed key. The join shuffles both
    * sides on the snapshot key — the unavoidable CDC shape when neither
    * snapshot fits in memory; unchanged rows are dropped post-join so only
    * the (small) change set leaves the operator. The +10.0 balance delta is
    * an exact IEEE op, so changed-row detection bit-matches DuckDB. */
  /** The two deterministic customer-snapshot generations diffed by q65 and
    * incrementally maintained over by q79 — factored so the queries cannot
    * diverge. */
  private def oldSnapshot(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.customer(s, dir).select(col("c_custkey").as("k"),
      col("c_acctbal").as("bal"), col("c_mktsegment").as("seg"))

  private def newSnapshot(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val cust = Tables.customer(s, dir)
    // insert keys are offset by max(custkey)+1, NOT a fixed constant — a
    // fixed offset silently collides with real keys once the table outgrows
    // it, fanning out the CDC full-outer join; max+1+custkey can never land
    // inside [0, max]
    val maxk = cust.agg(max("c_custkey").as("maxk"))
    cust.filter(col("c_custkey") % 13 =!= 0)
      .select(col("c_custkey").as("k"),
        when(col("c_custkey") % 7 === 0, col("c_acctbal") + 10.0)
          .otherwise(col("c_acctbal")).as("bal"),
        when(col("c_custkey") % 7 === 0, lit("MIGRATED"))
          .otherwise(col("c_mktsegment")).as("seg"))
      .unionByName(cust.filter(col("c_custkey") % 11 === 0)
        .crossJoin(broadcast(maxk))
        .select((col("c_custkey") + col("maxk") + 1L).as("k"),
          col("c_acctbal").as("bal"), lit("NEW").as("seg")))
  }

  /** The q65 news-snapshot derivation as oracle SQL, shared with q79. */
  private val newSnapshotSql: String =
    """SELECT c_custkey AS k,
               CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10.0 ELSE c_acctbal END AS bal,
               CASE WHEN c_custkey % 7 = 0 THEN 'MIGRATED' ELSE c_mktsegment END AS seg
        FROM customer WHERE c_custkey % 13 <> 0
        UNION ALL
        SELECT c_custkey + (SELECT MAX(c_custkey) + 1 FROM customer), c_acctbal, 'NEW'
        FROM customer WHERE c_custkey % 11 = 0"""

  val snapshotCdc: Q = Q(
    "q65_snapshot_cdc",
    (s, dir) => {
      val oldSnap = oldSnapshot(s, dir)
      val newSnap = newSnapshot(s, dir)
      oldSnap.as("o").join(newSnap.as("n"), col("o.k") === col("n.k"), "full_outer")
        .select(coalesce(col("o.k"), col("n.k")).as("custkey"),
          when(col("n.k").isNull, "D").when(col("o.k").isNull, "I")
            .otherwise("U").as("op"),
          col("o.bal").as("old_acctbal"), col("n.bal").as("new_acctbal"),
          col("o.seg").as("old_segment"), col("n.seg").as("new_segment"))
        .filter(col("op").isin("I", "D") ||
          col("old_acctbal") =!= col("new_acctbal") ||
          col("old_segment") =!= col("new_segment"))
    },
    Some(s"""WITH olds AS (
        SELECT c_custkey AS k, c_acctbal AS bal, c_mktsegment AS seg FROM customer
      ), news AS (
        $newSnapshotSql
      )
      SELECT COALESCE(o.k, n.k) AS custkey,
             CASE WHEN n.k IS NULL THEN 'D' WHEN o.k IS NULL THEN 'I'
                  ELSE 'U' END AS op,
             o.bal AS old_acctbal, n.bal AS new_acctbal,
             o.seg AS old_segment, n.seg AS new_segment
      FROM olds o FULL OUTER JOIN news n ON o.k = n.k
      WHERE n.k IS NULL OR o.k IS NULL OR o.bal <> n.bal OR o.seg <> n.seg"""))

  // ---- q66: point-in-interval range join ---------------------------------
  /** Range join: count lineitem shipments falling inside promotional windows
    * ([o_orderdate, +3 days) for every 400th order). A naive `ts >= lo AND
    * ts < hi` join has no equi-key, so Spark plans BroadcastNestedLoopJoin —
    * O(rows × intervals) compares. The scale shape: explode each interval
    * into the day bins it covers, truncate each point to its day bin, and
    * equi-join on the bin (each point matches an interval in exactly one bin,
    * so no post-join dedup is needed), then verify the exact range predicate.
    * The exploded interval table is tiny (intervals × ≤4 days) and explicitly
    * broadcast, so the 600k-row (→ 100 TB) fact side never shuffles. */
  val rangeJoin: Q = Q(
    "q66_range_join",
    (s, dir) => {
      val promos = Tables.orders(s, dir).filter(col("o_orderkey") % 400 === 0)
        .select(col("o_orderkey").as("promo_key"),
          col("o_orderpriority").as("priority"),
          col("o_orderdate").as("start_ts"),
          expr("o_orderdate + INTERVAL 3 DAYS").as("end_ts"))
      val promoDays = promos.withColumn("day",
        explode(sequence(date_trunc("DAY", col("start_ts")),
          date_trunc("DAY", col("end_ts")), expr("INTERVAL 1 DAY"))))
      Tables.lineitem(s, dir)
        .select(col("l_shipdate"), col("l_quantity"),
          date_trunc("DAY", col("l_shipdate")).as("day"))
        .join(broadcast(promoDays), Seq("day"))
        .filter(col("l_shipdate") >= col("start_ts") && col("l_shipdate") < col("end_ts"))
        .groupBy("promo_key", "priority")
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity").cast("long")).as("sum_qty"))
    },
    Some("""WITH promos AS (
        SELECT o_orderkey AS promo_key, o_orderpriority AS priority,
               o_orderdate AS start_ts, o_orderdate + INTERVAL 3 DAY AS end_ts
        FROM orders WHERE o_orderkey % 400 = 0
      )
      SELECT p.promo_key, p.priority,
             COUNT(1) AS n_items,
             CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      FROM promos p JOIN lineitem l
        ON l.l_shipdate >= p.start_ts AND l.l_shipdate < p.end_ts
      GROUP BY p.promo_key, p.priority"""))

  // ---- q70: partition skipping-stats collection --------------------------
  /** Data-skipping statistics per ship-month partition — what a lakehouse
    * table format keeps per file for scan pruning (min/max per column +
    * row count) — plus the pruning verdict for a concrete date-range
    * predicate. One aggregate with map-side partial combine: at 100 TB this
    * is the stats-collection pass of OPTIMIZE, not a shuffle of row data. */
  val partitionStats: Q = Q(
    "q70_partition_stats",
    (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(date_trunc("MONTH", col("l_shipdate")).as("part_month"))
        .agg(count(lit(1)).as("n_rows"),
          min("l_orderkey").as("min_key"), max("l_orderkey").as("max_key"),
          min("l_shipdate").as("min_ts"), max("l_shipdate").as("max_ts"))
        .withColumn("skip_for_ts_range",
          when(col("max_ts") < lit("1998-06-01").cast("timestamp") ||
            col("min_ts") > lit("1998-08-31").cast("timestamp"), 1).otherwise(0)),
    Some("""SELECT date_trunc('month', l_shipdate) AS part_month,
             COUNT(1) AS n_rows,
             MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key,
             MIN(l_shipdate) AS min_ts, MAX(l_shipdate) AS max_ts,
             CASE WHEN MAX(l_shipdate) < TIMESTAMP '1998-06-01'
                    OR MIN(l_shipdate) > TIMESTAMP '1998-08-31'
                  THEN 1 ELSE 0 END AS skip_for_ts_range
      FROM lineitem GROUP BY date_trunc('month', l_shipdate)"""))

  // ---- q72: schema-evolution merged read ---------------------------------
  /** Schema evolution across snapshot generations: v1 files carry
    * (custkey, name, acctbal), v2 files add segment + loyalty_tier and drop
    * acctbal. Write both generations as real parquet, then read them back in
    * one scan with mergeSchema — absent columns surface as nulls, exactly
    * how a table format reads old files after ADD COLUMN. The oracle
    * reconstructs the same union-by-name semantics from the source table.
    * Schema merge cost is per parquet FOOTER, not per row — at 100 TB the
    * merged read costs the same as a fixed-schema read. */
  val schemaEvolution: Q = Q(
    "q72_schema_evolution",
    (s, dir) => {
      // Generation files are fingerprint-scoped and written at most once per
      // input state: a repeat invocation (bench steady state) reuses them,
      // and a regenerated source lands in a fresh fp_* dir instead of
      // overwriting files a concurrent session may be scanning — the same
      // staleness/no-delete discipline as Artifacts. (Two sessions cold-
      // building the SAME fingerprint can still race the first write; the
      // content is identical, so the loser only rewrites equal bytes.)
      val tag = dir.replaceAll("[^a-zA-Z0-9.]", "_")
      val fp = Artifacts.fingerprint(s, s"$dir/customer.parquet")
      val base = s"${Artifacts.root(s)}/graft_schema_evo/$tag/fp_$fp"
      val fs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(s.sparkContext.hadoopConfiguration)
      def complete(v: String) =
        fs.exists(new org.apache.hadoop.fs.Path(s"$base/$v/_SUCCESS"))
      val cust = Tables.customer(s, dir)
      if (!complete("v1") || !complete("v2")) {
        // cold build under the cross-session lock: two sessions racing
        // mode("overwrite") into the same dirs would interleave delete with
        // the other's commit; the loser of the lock re-checks and reuses
        val ran = Artifacts.withCrossSessionLock(s, base, "gen") {
          if (!complete("v1") || !complete("v2")) {
            cust.filter(col("c_custkey") % 2 === 0)
              .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
                col("c_acctbal").as("acctbal"), lit(1).as("snapshot_v"))
              .write.mode("overwrite").parquet(s"$base/v1")
            cust.filter(col("c_custkey") % 2 === 1)
              .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
                col("c_mktsegment").as("segment"),
                (col("c_custkey") % 5).as("loyalty_tier"), lit(2).as("snapshot_v"))
              .write.mode("overwrite").parquet(s"$base/v2")
          }
        }
        if (!ran && (!complete("v1") || !complete("v2")))
          sys.error(s"could not build schema-evolution generations under $base")
      }
      s.read.option("mergeSchema", "true").parquet(s"$base/v1", s"$base/v2")
        .select(col("custkey"), col("name"), col("acctbal"), col("segment"),
          col("loyalty_tier"), col("snapshot_v"))
    },
    Some("""SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal,
             CAST(NULL AS VARCHAR) AS segment, CAST(NULL AS BIGINT) AS loyalty_tier,
             1 AS snapshot_v
      FROM customer WHERE c_custkey % 2 = 0
      UNION ALL
      SELECT c_custkey, c_name, CAST(NULL AS DOUBLE), c_mktsegment,
             c_custkey % 5, 2
      FROM customer WHERE c_custkey % 2 = 1"""))

  // ---- q74: bucketed co-located join --------------------------------------
  /** Bucketed co-located join: both sides are written bucketed (and sorted)
    * on the join key, so the join AND the following per-customer aggregate
    * run with ZERO exchanges — the layout investment that removes the
    * dominant shuffle from every future key join at 100 TB. The bucketed
    * write is part of the operator (a real lakehouse maintains the layout);
    * the spec asserts the plan has no Exchange, and the oracle checks the
    * result equals the plain join on the raw tables. */
  val bucketedJoin: Q = Q(
    "q74_bucketed_join",
    (s, dir) => {
      // Bucketed tables are fingerprint-scoped (name embeds the input state)
      // and built at most once per JVM: a repeat invocation reuses the
      // catalog entry without touching the files, and a regenerated source
      // maps to a NEW table name instead of deleting a location another
      // session may be scanning. A location left by a previous JVM (the
      // in-memory catalog dies with it, the files do not) is cleared before
      // the one-time rebuild — CTAS refuses a location it did not create.
      val tag = dir.replaceAll("[^a-zA-Z0-9]", "_")
      val fp = Artifacts.fingerprint(s, s"$dir/orders.parquet") ^
        Artifacts.fingerprint(s, s"$dir/customer.parquet")
      val oT = s"graft_bkt_orders_${tag}_f$fp"
      val cT = s"graft_bkt_customer_${tag}_f$fp"
      // The build is serialized against other JVMs by the cross-session
      // warehouse lock AND against this JVM's own query threads by the
      // object monitor (catalog check-then-CTAS is otherwise a race: the
      // loser's saveAsTable throws TableAlreadyExists, or its location
      // delete destroys the winner's half-written files).
      def ensure(t: String, df: => org.apache.spark.sql.DataFrame, key: String): Unit =
        Warehouse.synchronized {
          if (!s.catalog.tableExists(t)) {
            val ran = Artifacts.withCrossSessionLock(
              s, s.sessionState.conf.warehousePath, t.toLowerCase) {
              val loc = new org.apache.hadoop.fs.Path(
                s.sessionState.conf.warehousePath, t.toLowerCase)
              val fs = loc.getFileSystem(s.sparkContext.hadoopConfiguration)
              if (fs.exists(loc)) fs.delete(loc, true)
              df.write.format("parquet").bucketBy(8, key).sortBy(key).saveAsTable(t)
            }
            if (!ran) sys.error(s"could not acquire warehouse lock to build $t")
          }
        }
      ensure(oT, Tables.orders(s, dir), "o_custkey")
      ensure(cT, Tables.customer(s, dir), "c_custkey")
      s.table(cT).join(s.table(oT), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_custkey").as("custkey"), col("c_name").as("name"),
          col("c_acctbal").as("acctbal"))
        .agg(count(lit(1)).as("n_orders"),
          round(sum(col("o_totalprice")), 2).as("total_spend"))
    },
    Some("""SELECT c_custkey AS custkey, c_name AS name, c_acctbal AS acctbal,
             COUNT(1) AS n_orders, ROUND(SUM(o_totalprice), 2) AS total_spend
      FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      GROUP BY c_custkey, c_name, c_acctbal"""))

  // ---- q79: incremental materialized-view maintenance ----------------------
  /** Incrementally maintain a per-segment aggregate (customer count, balance
    * total) by applying q65's I/U/D change rows as signed deltas to the BASE
    * snapshot's aggregate — never rescanning the new snapshot: a delete
    * contributes (−1, −old_bal) to its old segment, an insert (+1, +new_bal)
    * to its new segment, and an update both. At 100 TB this is the MV
    * refresh shape: work scales with the CHANGE SET, not the table. The
    * oracle computes the aggregate directly over the new snapshot, so the
    * hash-match proves the incremental path reaches exactly the full-recompute
    * answer (the sum is rounded only at the very end, after base and delta
    * merge). */
  val incrementalMv: Q = Q(
    "q79_incremental_mv",
    (s, dir) => {
      val base = oldSnapshot(s, dir).groupBy("seg")
        .agg(count(lit(1)).as("b_cnt"), sum("bal").as("b_bal"))
      val cdc = snapshotCdc.run(s, dir)
      val removals = cdc.filter(col("op").isin("D", "U"))
        .select(col("old_segment").as("seg"), lit(-1L).as("d_cnt"),
          (-col("old_acctbal")).as("d_bal"))
      val additions = cdc.filter(col("op").isin("I", "U"))
        .select(col("new_segment").as("seg"), lit(1L).as("d_cnt"),
          col("new_acctbal").as("d_bal"))
      val delta = removals.unionByName(additions)
        .groupBy("seg").agg(sum("d_cnt").as("d_cnt"), sum("d_bal").as("d_bal"))
      base.join(delta, Seq("seg"), "full_outer")
        .select(col("seg").as("segment"),
          (coalesce(col("b_cnt"), lit(0L)) + coalesce(col("d_cnt"), lit(0L))).as("n_customers"),
          round(coalesce(col("b_bal"), lit(0.0)) + coalesce(col("d_bal"), lit(0.0)), 2)
            .as("total_bal"))
        .filter(col("n_customers") > 0)
    },
    Some(s"""WITH news AS (
        $newSnapshotSql
      )
      SELECT seg AS segment, COUNT(1) AS n_customers,
             ROUND(SUM(bal), 2) AS total_bal
      FROM news GROUP BY seg"""))

  // ---- q80: deterministic stratified per-group sample ----------------------
  private val stratN = 5

  /** Stratified sampling: exactly `stratN` documents per source, chosen by
    * ranking each group on the md5 uniform draw (doc_id tiebreak) — a
    * deterministic, reproducible, exactly-oracled stratified sample (the
    * probabilistic q52 samples at a rate; this samples a fixed count per
    * stratum). One window per group partition; at 100 TB per-group state is
    * the top-N heap, not the group. */
  val stratifiedSample: Q = Q(
    "q80_stratified_sample",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
        .orderBy(col("draw"), col("doc_id"))
      Tables.documents(s, dir)
        .withColumn("draw", Md5Draw.draw(8, lit("strat"), col("doc_id")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= stratN)
        .select(col("doc_id"), col("source"), col("draw"), col("rn"))
    },
    Some(s"""WITH drawn AS (
        SELECT doc_id, source, ${Md5Draw.drawSql(8, "'strat'", "doc_id")} AS draw
        FROM documents
      ), ranked AS (
        SELECT doc_id, source, draw,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY draw, doc_id) AS rn
        FROM drawn
      )
      SELECT doc_id, source, draw, CAST(rn AS INT) AS rn
      FROM ranked WHERE rn <= $stratN"""))

  /** Quality-audit core over any frame with the orders shape — exposed so
    * the spec can drive frames that VIOLATE each constraint through the
    * production plan (the test corpus passes all five). */
  private[graft] def qualityAuditOf(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    // ONE aggregation pass computes every metric (map-side combined; at
    // 100 TB the audit costs one scan, not one scan per constraint), then
    // the five verdicts derive on the driver from the single metrics row —
    // the q34 trained-literal pattern, 1 row collected
    val m = df.agg(
      count(lit(1)).as("n_rows"),
      sum(when(col("o_orderkey").isNull, 1L).otherwise(0L)).as("key_nulls"),
      countDistinct("o_orderkey").as("key_distinct"),
      min("o_totalprice").as("min_price"),
      sum(when(col("o_orderdate").isNull, 1L).otherwise(0L)).as("date_nulls"),
      sum(when(col("o_orderstatus").isin("O", "F", "P"), 0L).otherwise(1L))
        .as("status_violations")).head()
    val nRows = m.getLong(0)
    val keyNulls = if (m.isNullAt(1)) 0L else m.getLong(1)
    val keyDistinct = m.getLong(2)
    val minPrice = if (m.isNullAt(3)) 0.0 else m.getDouble(3)
    val dateNulls = if (m.isNullAt(4)) 0L else m.getLong(4)
    val statusViol = if (m.isNullAt(5)) 0L else m.getLong(5)
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, IntegerType, StringType, StructField, StructType}
    val rows = Seq(
      Row("o_orderkey.not_null", keyNulls.toDouble, if (keyNulls == 0) 1 else 0),
      Row("o_orderkey.unique", keyDistinct.toDouble,
        if (keyDistinct == nRows - keyNulls) 1 else 0),
      Row("o_totalprice.non_negative", minPrice, if (minPrice >= 0.0) 1 else 0),
      Row("o_orderdate.not_null", dateNulls.toDouble, if (dateNulls == 0) 1 else 0),
      Row("o_orderstatus.in_domain", statusViol.toDouble,
        if (statusViol == 0) 1 else 0))
    s.createDataFrame(java.util.Arrays.asList(rows: _*), StructType(Seq(
      StructField("constraint_name", StringType),
      StructField("observed", DoubleType),
      StructField("passed", IntegerType))))
  }

  /** Data-quality constraint audit — the admission gate a production ingest
    * runs before data reaches any pipeline: five declared constraints
    * (key not-null + unique, non-negative amounts, date presence, status
    * domain) checked in ONE aggregation pass over the table, reported as
    * (constraint, observed metric, verdict). The Deequ-class operation,
    * expressed as a plain declarative aggregate. */
  val qualityAudit: Q = Q(
    "q104_quality_audit",
    (s, dir) => qualityAuditOf(Tables.orders(s, dir)),
    Some("""WITH m AS (
        -- COALESCE mirrors the Spark side's isNullAt handling, so the two
        -- engines agree even on an empty/all-NULL table (SUM/MIN are NULL
        -- over zero rows)
        SELECT COUNT(1) AS n_rows,
               COALESCE(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS key_nulls,
               COUNT(DISTINCT o_orderkey) AS key_distinct,
               COALESCE(MIN(o_totalprice), 0) AS min_price,
               COALESCE(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END), 0) AS date_nulls,
               COALESCE(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END), 0)
                 AS status_violations
        FROM orders
      )
      SELECT 'o_orderkey.not_null' AS constraint_name,
             CAST(key_nulls AS DOUBLE) AS observed,
             CASE WHEN key_nulls = 0 THEN 1 ELSE 0 END AS passed FROM m
      UNION ALL
      SELECT 'o_orderkey.unique', CAST(key_distinct AS DOUBLE),
             CASE WHEN key_distinct = n_rows - key_nulls THEN 1 ELSE 0 END FROM m
      UNION ALL
      SELECT 'o_totalprice.non_negative', min_price,
             CASE WHEN min_price >= 0 THEN 1 ELSE 0 END FROM m
      UNION ALL
      SELECT 'o_orderdate.not_null', CAST(date_nulls AS DOUBLE),
             CASE WHEN date_nulls = 0 THEN 1 ELSE 0 END FROM m
      UNION ALL
      SELECT 'o_orderstatus.in_domain', CAST(status_violations AS DOUBLE),
             CASE WHEN status_violations = 0 THEN 1 ELSE 0 END FROM m"""))

  // ---- q145: generic column profiler ---------------------------------------
  /** lineitem's columns with a per-type EXACT canonical string form — the
    * cross-engine-stable rendering that makes the profile hashable: ints as
    * decimal strings, doubles through DECIMAL(18,2) (the table's price
    * grain), timestamps as epoch-µs integers, strings raw. A raw
    * double→string or timestamp→string cast would hang the hash on each
    * engine's float/zero-padding rendering quirks. */
  private val profileCols: Seq[(String, String)] = Seq(
    "l_orderkey" -> "int", "l_partkey" -> "int", "l_suppkey" -> "int",
    "l_linenumber" -> "int", "l_quantity" -> "dbl", "l_extendedprice" -> "dbl",
    "l_discount" -> "dbl", "l_tax" -> "dbl", "l_returnflag" -> "str",
    "l_linestatus" -> "str", "l_shipdate" -> "ts")

  private def canonCol(c: org.apache.spark.sql.Column, t: String): org.apache.spark.sql.Column =
    t match {
      case "int" => c.cast("string")
      case "dbl" => c.cast("decimal(18,2)").cast("string")
      case "str" => c.cast("string")
      // NTZ parquet timestamps cast to TimestampType first (UTC session TZ
      // pinned in every entry point ⇒ value-preserving reinterpretation)
      case "ts"  => unix_micros(c.cast("timestamp")).cast("string")
    }

  private def canonSql(e: String, t: String): String = t match {
    case "int" => s"CAST($e AS VARCHAR)"
    case "dbl" => s"CAST(CAST($e AS DECIMAL(18,2)) AS VARCHAR)"
    case "str" => s"CAST($e AS VARCHAR)"
    case "ts"  => s"CAST(epoch_us(CAST($e AS TIMESTAMP)) AS VARCHAR)"
  }

  /** q145: one-shot data profile of a wide table — per column: row count,
    * null count, exact distinct count, and typed min/max in canonical form.
    * The Deequ-style profiling pass a platform runs on every new dataset
    * before queries touch it (q104 is the CONSTRAINT gate; this is the
    * discovery side).
    *
    * Distributed shape: two scans, both fully parallel. (1) counts: each row
    * expands to |cols| (col, canonical value) entries via one explode, then
    * a (col, value)-keyed partial-aggregated count collapses to a |cols|-row
    * profile — the classic long-form trick that gets N exact
    * distinct-counts in ONE pass instead of N scans or one
    * O(2^N-expand) multi-distinct aggregate. (2) min/max: a single wide
    * aggregate over the TYPED columns (numeric/timestamp semantics, not
    * lexicographic), canonicalized after aggregation, unpivoted. At 100 TB
    * both passes are map-side-combined; nothing data-sized crosses the
    * wire except the (col, value) distinct-count shuffle, which is the
    * irreducible cost of exact distinct. */
  val columnProfile: Q = Q(
    "q145_profile",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
      val kvs = array(profileCols.map { case (c, t) =>
        struct(lit(c).as("col_name"), canonCol(col(c), t).as("v"))
      }: _*)
      val counts = li.select(explode(kvs).as("kv")).select("kv.col_name", "kv.v")
        .groupBy("col_name")
        .agg(count(lit(1)).as("n_rows"),
          (count(lit(1)) - count("v")).as("n_nulls"),
          countDistinct("v").as("n_distinct"))
      val aggs = profileCols.flatMap { case (c, t) =>
        Seq(canonCol(min(col(c)), t).as(s"min_$c"), canonCol(max(col(c)), t).as(s"max_$c"))
      }
      val mm = li.agg(aggs.head, aggs.tail: _*)
        .select(explode(array(profileCols.map { case (c, _) =>
          struct(lit(c).as("col_name"), col(s"min_$c").as("min_val"),
            col(s"max_$c").as("max_val"))
        }: _*)).as("kv")).select("kv.*")
      counts.join(broadcast(mm), "col_name")
    },
    Some(profileCols.map { case (c, t) =>
      s"""SELECT '$c' AS col_name, count(1) AS n_rows,
        count(1) - count($c) AS n_nulls,
        count(DISTINCT ${canonSql(c, t)}) AS n_distinct,
        ${canonSql(s"MIN($c)", t)} AS min_val,
        ${canonSql(s"MAX($c)", t)} AS max_val
      FROM lineitem"""
    }.mkString("\nUNION ALL\n")))

  // ---- q146: referential-integrity audit -----------------------------------
  private val fkEdges: Seq[(String, String, String, String)] = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("events", "user_id", "customer", "c_custkey"))

  /** q146: referential-integrity audit over every FK edge of the star
    * schema (plus the events→customer identity edge): per edge, child row
    * count, distinct child keys, orphan rows and orphan keys — the
    * whole-lake consistency report a platform runs after each load. All
    * eight edges are clean in the synthetic testdata (WarehouseSpec asserts
    * so); the violation path is covered by the planted-orphan unit test
    * over [[edgeAudit]]. NULL child keys are pinned as NOT orphans in both
    * engines (filtered before the anti-join / NOT IN), so a nullable FK
    * column cannot diverge the engines' NULL semantics.
    *
    * Distributed shape: per edge, the child scan is pruned to the single
    * key column (ReadSchema: one field), orphans come from one key-keyed
    * anti-join against the parent's key column, and everything collapses to
    * a 1-row aggregate before the 8-edge union — per-edge cost is the
    * minimum possible (a scan of one column each side + one shuffle or
    * broadcast chosen by AQE on the parent's actual size). */
  /** One FK edge's audit row — q146's per-edge plan; spec entry for planted
    * violations. */
  private[graft] def edgeAudit(child: DataFrame, ck: String,
      parent: DataFrame, pk: String, rel: String): DataFrame = {
    // ONE pass: the child key column left-joins the (distinct, hence
    // fanout-free) parent key column, and base counts + orphan counts fall
    // out of the same aggregate — the previous base-agg + anti-join shape
    // scanned every child twice (6 lineitem column scans across the 3
    // lineitem edges; the r11 ratio audit flagged the suite's only
    // double-scan). NULL child keys are never orphans: the orphan
    // predicates require k IS NOT NULL, same pinning as before.
    val c = child.select(col(ck).as("k"))
    val p = parent.select(col(pk).as("pk")).distinct()
    val orphan = col("k").isNotNull && col("pk").isNull
    c.join(p, col("k") === col("pk"), "left")
      .agg(count(lit(1)).as("n_child"),
        countDistinct("k").as("n_child_keys"),
        sum(when(orphan, 1L).otherwise(0L)).as("n_orphan_rows"),
        countDistinct(when(orphan, col("k"))).as("n_orphan_keys"))
      .select(lit(rel).as("relationship"),
        col("n_child"), col("n_child_keys"),
        col("n_orphan_rows"), col("n_orphan_keys"),
        (col("n_orphan_rows") === 0).as("ok"))
  }

  val refIntegrity: Q = Q(
    "q146_ref_integrity",
    (s, dir) => fkEdges.map { case (ct, ck, pt, pk) =>
      edgeAudit(Tables.table(s, dir, ct), ck, Tables.table(s, dir, pt), pk,
        s"$ct.$ck->$pt.$pk")
    }.reduce(_ unionAll _),
    Some(fkEdges.map { case (ct, ck, pt, pk) =>
      s"""SELECT '$ct.$ck->$pt.$pk' AS relationship,
        (SELECT count(1) FROM $ct) AS n_child,
        (SELECT count(DISTINCT $ck) FROM $ct) AS n_child_keys,
        (SELECT count(1) FROM $ct WHERE $ck IS NOT NULL AND $ck NOT IN (SELECT $pk FROM $pt WHERE $pk IS NOT NULL)) AS n_orphan_rows,
        (SELECT count(DISTINCT $ck) FROM $ct WHERE $ck IS NOT NULL AND $ck NOT IN (SELECT $pk FROM $pt WHERE $pk IS NOT NULL)) AS n_orphan_keys,
        (SELECT count(1) FROM $ct WHERE $ck IS NOT NULL AND $ck NOT IN (SELECT $pk FROM $pt WHERE $pk IS NOT NULL)) = 0 AS ok"""
    }.mkString("\nUNION ALL\n")))

  // ---- q164: cross-table reconciliation audit ------------------------------
  /** q164: the fact-to-header reconciliation a warehouse runs after every
    * load — per order, the lineitem-derived gross revenue (Σ extendedprice,
    * exact cents) against the header's o_totalprice, classified into
    * match / mismatch / childless, with the mismatch magnitude
    * distribution (max and total absolute difference) carried per status
    * row. Everything is BIGINT cents; one output row per status so the
    * report is fixed-size regardless of data volume.
    *
    * Distributed shape: one map-side-combined orderkey aggregation over
    * the fact scan (2 columns read), one co-partitioned orderkey join to
    * the header, then a 3-row status aggregate. This synthetic generator
    * happens to populate o_totalprice independently of lineitems — the
    * audit REPORTS that honestly (all-mismatch), which is exactly its job
    * on a real lake too. */
  val orderReconcile: Q = Q(
    "q164_order_reconcile",
    (s, dir) => {
      val li = Tables.lineitem(s, dir)
        .groupBy(col("l_orderkey"))
        .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("li_cents"),
          count(lit(1)).as("n_lines"))
      val o = Tables.orders(s, dir)
        .select(col("o_orderkey"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("hdr_cents"))
      o.join(li, col("o_orderkey") === col("l_orderkey"), "left")
        .withColumn("status",
          when(col("li_cents").isNull, "childless")
            .when(col("li_cents") === col("hdr_cents"), "match")
            .otherwise("mismatch"))
        .withColumn("abs_diff",
          when(col("li_cents").isNull, lit(0L))
            .otherwise(abs(col("li_cents") - col("hdr_cents"))))
        .groupBy("status")
        .agg(count(lit(1)).as("n_orders"),
          sum("abs_diff").as("total_abs_diff_cents"),
          max("abs_diff").as("max_abs_diff_cents"))
    },
    Some("""WITH li AS (
        SELECT l_orderkey,
               SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS li_cents,
               COUNT(1) AS n_lines
        FROM lineitem GROUP BY l_orderkey
      ), j AS (
        SELECT o.o_orderkey,
               CAST(round(o.o_totalprice * 100) AS BIGINT) AS hdr_cents,
               li.li_cents
        FROM orders o LEFT JOIN li ON o.o_orderkey = li.l_orderkey
      ), cls AS (
        SELECT CASE WHEN li_cents IS NULL THEN 'childless'
                    WHEN li_cents = hdr_cents THEN 'match'
                    ELSE 'mismatch' END AS status,
               CASE WHEN li_cents IS NULL THEN 0
                    ELSE abs(li_cents - hdr_cents) END AS abs_diff
        FROM j
      )
      SELECT status, count(1) AS n_orders,
             CAST(SUM(abs_diff) AS BIGINT) AS total_abs_diff_cents,
             CAST(MAX(abs_diff) AS BIGINT) AS max_abs_diff_cents
      FROM cls GROUP BY status"""))

  // ---- q172: deletion footprint (right-to-be-forgotten impact) -------------
  /** q172: the erasure-impact report a platform produces before executing a
    * subject-deletion request — for a deterministic subject cohort
    * (custkey ≡ 0 mod 37), the rows each table would lose, including the
    * TRANSITIVE reach (lineitem is hit through the subjects' orders, not
    * by carrying a custkey itself). One row per table with affected-row
    * and affected-subject counts; exact integers.
    *
    * Distributed shape: each table contributes one key-keyed semi-join
    * (the subject set and the affected-order keyset are the small
    * broadcast sides) collapsing to a 1-row aggregate — the footprint scan
    * reads only key columns, so the report costs key-column I/O, not table
    * width. */
  val deletionFootprint: Q = Q(
    "q172_deletion_footprint",
    (s, dir) => {
      val subjects = Tables.customer(s, dir)
        .filter(col("c_custkey") % 37 === 0).select("c_custkey")
      val custRow = subjects.agg(count(lit(1)).as("n_rows"))
        .select(lit("customer").as("table_name"), col("n_rows"),
          col("n_rows").as("n_subjects"))
      val orders = Tables.orders(s, dir)
        .join(broadcast(subjects), col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "o_custkey")
      val orderRow = orders.agg(count(lit(1)).as("n_rows"),
        countDistinct("o_custkey").as("n_subjects"))
        .select(lit("orders").as("table_name"), col("n_rows"), col("n_subjects"))
      val liRow = Tables.lineitem(s, dir)
        .join(orders.select("o_orderkey", "o_custkey").as("o"),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n_rows"), countDistinct("o_custkey").as("n_subjects"))
        .select(lit("lineitem").as("table_name"), col("n_rows"), col("n_subjects"))
      val evRow = Tables.events(s, dir)
        .join(broadcast(subjects), col("user_id") === col("c_custkey"))
        .agg(count(lit(1)).as("n_rows"), countDistinct("user_id").as("n_subjects"))
        .select(lit("events").as("table_name"), col("n_rows"), col("n_subjects"))
      Seq(custRow, orderRow, liRow, evRow).reduce(_ unionAll _)
    },
    Some("""WITH subjects AS (
        SELECT c_custkey FROM customer WHERE c_custkey % 37 = 0
      ), ords AS (
        SELECT o_orderkey, o_custkey FROM orders
        JOIN subjects ON o_custkey = c_custkey
      )
      SELECT 'customer' AS table_name, count(1) AS n_rows, count(1) AS n_subjects
      FROM subjects
      UNION ALL
      SELECT 'orders', count(1), count(DISTINCT o_custkey) FROM ords
      UNION ALL
      SELECT 'lineitem', count(1), count(DISTINCT o.o_custkey)
      FROM lineitem l JOIN ords o ON l.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT 'events', count(1), count(DISTINCT user_id)
      FROM events JOIN subjects ON user_id = c_custkey"""))

  // ---- q176: reshard movement cost (consistent vs modulo) ------------------
  /** Ring positions for N shard nodes — md5 of a fixed node tag, so both
    * the plan literal and the oracle literal are THE SAME strings (the
    * lowercase-hex order IS the ring order, the [[Md5Draw]] argument). */
  private def ringNodes(n: Int): Seq[String] = (0 until n).map { i =>
    // position depends ONLY on the node id — growing the ring ADDS points
    // without moving existing ones, which is the entire low-movement
    // property being measured (keying by (n, i) would rebuild the ring and
    // move everything)
    java.security.MessageDigest.getInstance("MD5")
      .digest(s"node|$i".getBytes("UTF-8")).map("%02x".format(_)).mkString.take(16)
  }.sorted

  /** q176: what fraction of the corpus MOVES when the shard count grows
    * 8 → 9 — the reshard-cost analysis behind choosing consistent hashing
    * for a 100 TB store. Both placement schemes are computed exactly for
    * every doc: consistent (clockwise successor on an md5 ring, wrap via
    * COALESCE to the ring minimum — expected movement ≈ 1/9) and modulo
    * (doc_id mod N — movement ≈ 8/9, the scheme's known failure). One row
    * per scheme with moved counts and fraction; the ~8× gap between the
    * two rows is the point of the report.
    *
    * Distributed shape: zero shuffles until the 2-row aggregate — ring
    * placement is a per-row array expression over broadcast literal node
    * positions. */
  val reshardCost: Q = Q(
    "q176_reshard_cost",
    (s, dir) => {
      val p8 = ringNodes(8); val p9 = ringNodes(9)
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), Md5Draw.draw(16, lit("ring"), col("doc_id")).as("pos"))
        .withColumn("n8", typedLit(p8)).withColumn("n9", typedLit(p9))
        .withColumn("c8", expr("coalesce(array_min(filter(n8, p -> p >= pos)), element_at(n8, 1))"))
        .withColumn("c9", expr("coalesce(array_min(filter(n9, p -> p >= pos)), element_at(n9, 1))"))
      val cons = d.agg(count(lit(1)).as("n_docs"),
          sum(when(col("c8") =!= col("c9"), 1L).otherwise(0L)).as("n_moved"))
        .select(lit("consistent").as("scheme"), col("n_docs"), col("n_moved"))
      val mod = Tables.documents(s, dir)
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("doc_id") % 8 =!= col("doc_id") % 9, 1L).otherwise(0L)).as("n_moved"))
        .select(lit("modulo").as("scheme"), col("n_docs"), col("n_moved"))
      cons.unionAll(mod)
        .withColumn("moved_frac",
          col("n_moved").cast("double") / col("n_docs").cast("double"))
    },
    Some {
      def lst(xs: Seq[String]) = xs.map(x => s"'$x'").mkString("[", ", ", "]")
      val (p8, p9) = (lst(ringNodes(8)), lst(ringNodes(9)))
      s"""WITH d AS (
        SELECT doc_id, ${Md5Draw.drawSql(16, "'ring'", "doc_id")} AS pos FROM documents
      ), placed AS (
        SELECT doc_id, pos,
          COALESCE(list_min(list_filter($p8, p -> p >= pos)), $p8[1]) AS c8,
          COALESCE(list_min(list_filter($p9, p -> p >= pos)), $p9[1]) AS c9
        FROM d
      )
      SELECT 'consistent' AS scheme, count(1) AS n_docs,
             CAST(SUM(CASE WHEN c8 <> c9 THEN 1 ELSE 0 END) AS BIGINT) AS n_moved,
             CAST(SUM(CASE WHEN c8 <> c9 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(1) AS DOUBLE) AS moved_frac
      FROM placed
      UNION ALL
      SELECT 'modulo', count(1),
             CAST(SUM(CASE WHEN doc_id % 8 <> doc_id % 9 THEN 1 ELSE 0 END) AS BIGINT),
             CAST(SUM(CASE WHEN doc_id % 8 <> doc_id % 9 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(1) AS DOUBLE)
      FROM documents"""
    })

  // ---- q190: functional-dependency audit -----------------------------------
  /** The candidate FDs q190 audits: (name, table, lhs, rhs). Two hold by
    * key/foreign-key construction, four are plausible-but-false — the audit
    * REPORTS, it does not assume. */
  private val fdCandidates: Seq[(String, String, String, String)] = Seq(
    ("part.p_partkey->p_name", "part", "p_partkey", "p_name"),
    ("customer.c_custkey->c_nationkey", "customer", "c_custkey", "c_nationkey"),
    ("orders.o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
    ("lineitem.l_orderkey->l_suppkey", "lineitem", "l_orderkey", "l_suppkey"),
    ("events.user_id->event_type", "events", "user_id", "event_type"),
    ("documents.source->lang", "documents", "source", "lang"))

  /** q190: functional-dependency audit — for each candidate rule LHS→RHS,
    * how many LHS values exist, how many map to MORE than one RHS value
    * (violations), the violation rate and the worst fan-out. The
    * dependency-discovery half of data-quality profiling (q104 checks
    * declared constraints; q146 checks referential edges; this measures
    * whether a column DETERMINES another — the fact schema designers,
    * dedup-key pickers and CDC compaction all implicitly rely on).
    *
    * Distributed shape: per FD, one two-column scan collapsed to distinct
    * (lhs, rhs) pairs map-side, one lhs-keyed distinct-count, one 1-row
    * aggregate — cost is O(distinct pairs), never O(rows²). */
  val fdAudit: Q = Q(
    "q190_fd_audit",
    (s, dir) => fdCandidates.map { case (name, table, lhs, rhs) =>
      // events goes through the adaptive loader (layout-proof), like
      // everything else that touches that table — see Tables.normalizeTs
      (if (table == "events") Tables.events(s, dir) else Tables.table(s, dir, table))
        .groupBy(col(lhs).as("l"))
        .agg(countDistinct(col(rhs)).as("k"))
        .agg(count(lit(1)).as("n_lhs"),
          sum(when(col("k") > 1, 1L).otherwise(0L)).as("n_violating"),
          max("k").as("max_fanout"))
        .select(lit(name).as("fd"), col("n_lhs"), col("n_violating"),
          (col("n_violating").cast("double") / col("n_lhs").cast("double"))
            .as("violation_rate"),
          col("max_fanout"),
          (col("n_violating") === 0).as("holds"))
    }.reduce(_ unionAll _),
    Some(fdCandidates.map { case (name, table, lhs, rhs) =>
      s"""SELECT '$name' AS fd, count(1) AS n_lhs,
        CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating,
        CAST(SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) AS DOUBLE)
          / CAST(count(1) AS DOUBLE) AS violation_rate,
        MAX(k) AS max_fanout,
        SUM(CASE WHEN k > 1 THEN 1 ELSE 0 END) = 0 AS holds
      FROM (SELECT $lhs AS l, CAST(count(DISTINCT $rhs) AS BIGINT) AS k
            FROM $table GROUP BY $lhs)"""
    }.mkString("\nUNION ALL\n")))

  // ---- q193: join-cardinality estimation audit -----------------------------
  /** q193: the skew audit of the optimizer's uniformity assumption — per FK
    * edge, the EXACT join cardinality Σ_k cnt_child(k)·cnt_parent(k)
    * (computed from per-key count frames, never by materializing the join)
    * against the textbook CBO estimate |A|·|B| / max(ndv_A, ndv_B), and
    * their ratio. Ratio ≈ 1 means uniform-assumption planning is safe;
    * ratio ≫ 1 is exactly the hot-key skew that needs salting (q49) or
    * AQE skew splitting — this is the one-screen report that says WHERE.
    *
    * Distributed shape: per edge, two single-column map-side-combined
    * count passes, one key-keyed join of the (much smaller) count frames,
    * a 1-row aggregate. Cost is O(distinct keys), independent of the join
    * output size it measures. */
  val joinCardAudit: Q = Q(
    "q193_join_card_audit",
    (s, dir) => fkEdges.map { case (ct, ck, pt, pk) =>
      // NULL keys are excluded on BOTH sides and in both engines (a NULL
      // never joins, and DuckDB's count(DISTINCT) drops NULLs while a
      // Spark groupBy keeps a NULL group — filtering pins one semantics)
      val child = (if (ct == "events") Tables.events(s, dir)
        else Tables.table(s, dir, ct))
        .filter(col(ck).isNotNull)
        .groupBy(col(ck).as("k")).agg(count(lit(1)).as("ca"))
      val parent = Tables.table(s, dir, pt)
        .filter(col(pk).isNotNull)
        .groupBy(col(pk).as("k")).agg(count(lit(1)).as("cb"))
      // ONE pass over the two count frames (r16): a full-outer key join
      // feeds every statistic of the edge — totals/ndv per side (count/sum
      // over that side's non-null rows ≡ the former per-side aggregates)
      // and the matched Σ ca·cb (null on either side ⇒ the product is null
      // and the sum skips it ≡ the former inner join) — where the previous
      // shape re-computed each side's groupBy twice (sides + actual)
      val joined = child.join(parent, Seq("k"), "full_outer")
        .agg(sum("ca").as("n_child"), count(col("ca")).as("ndv_child"),
          sum("cb").as("n_parent"), count(col("cb")).as("ndv_parent"),
          coalesce(sum(col("ca") * col("cb")), lit(0L)).as("actual_rows"))
      joined
        .select(lit(s"$ct.$ck->$pt.$pk").as("edge"),
          col("n_child"), col("n_parent"), col("ndv_child"), col("ndv_parent"),
          col("actual_rows"),
          ((col("n_child").cast("double") * col("n_parent").cast("double"))
            / greatest(col("ndv_child"), col("ndv_parent")).cast("double"))
            .as("uniform_estimate"),
          (col("actual_rows").cast("double")
            / ((col("n_child").cast("double") * col("n_parent").cast("double"))
              / greatest(col("ndv_child"), col("ndv_parent")).cast("double")))
            .as("actual_over_estimate"))
    }.reduce(_ unionAll _),
    Some(fkEdges.map { case (ct, ck, pt, pk) =>
      s"""SELECT '$ct.$ck->$pt.$pk' AS edge,
        (SELECT count(1) FROM $ct WHERE $ck IS NOT NULL) AS n_child,
        (SELECT count(1) FROM $pt WHERE $pk IS NOT NULL) AS n_parent,
        (SELECT count(DISTINCT $ck) FROM $ct) AS ndv_child,
        (SELECT count(DISTINCT $pk) FROM $pt) AS ndv_parent,
        (SELECT CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) FROM
          (SELECT $ck AS k, count(1) AS ca FROM $ct GROUP BY $ck) a
          JOIN (SELECT $pk AS k, count(1) AS cb FROM $pt GROUP BY $pk) b
          ON a.k = b.k) AS actual_rows,
        (CAST((SELECT count(1) FROM $ct WHERE $ck IS NOT NULL) AS DOUBLE)
          * CAST((SELECT count(1) FROM $pt WHERE $pk IS NOT NULL) AS DOUBLE))
          / CAST(GREATEST((SELECT count(DISTINCT $ck) FROM $ct),
                          (SELECT count(DISTINCT $pk) FROM $pt)) AS DOUBLE)
          AS uniform_estimate,
        CAST((SELECT CAST(COALESCE(SUM(ca * cb), 0) AS BIGINT) FROM
          (SELECT $ck AS k, count(1) AS ca FROM $ct GROUP BY $ck) a
          JOIN (SELECT $pk AS k, count(1) AS cb FROM $pt GROUP BY $pk) b
          ON a.k = b.k) AS DOUBLE)
          / ((CAST((SELECT count(1) FROM $ct WHERE $ck IS NOT NULL) AS DOUBLE)
            * CAST((SELECT count(1) FROM $pt WHERE $pk IS NOT NULL) AS DOUBLE))
            / CAST(GREATEST((SELECT count(DISTINCT $ck) FROM $ct),
                            (SELECT count(DISTINCT $pk) FROM $pt)) AS DOUBLE))
          AS actual_over_estimate"""
    }.mkString("\nUNION ALL\n")))

  // ---- q198: data-freshness report -----------------------------------------
  /** q198: the freshness SLA report a platform shows per table — row count,
    * latest event date, and how many days each table lags the freshest
    * table in the lake. "Now" is deliberately NOT the wall clock (which
    * would make the result nondeterministic): the reference point is the
    * global maximum date across the audited tables, so the report measures
    * RELATIVE staleness — exactly the signal that catches a stalled
    * ingestion (one table's lag growing while the others advance).
    *
    * Distributed shape: one single-column max/count aggregate per table,
    * then 3-row algebra; date arithmetic is exact integer days in both
    * engines. */
  val freshnessReport: Q = Q(
    "q198_freshness_report",
    (s, dir) => {
      val perTable = Seq(
        Tables.orders(s, dir).agg(lit("orders").as("table_name"),
          count(lit(1)).as("n_rows"),
          max(to_date(col("o_orderdate"))).as("max_date")),
        Tables.lineitem(s, dir).agg(lit("lineitem").as("table_name"),
          count(lit(1)).as("n_rows"),
          max(to_date(col("l_shipdate"))).as("max_date")),
        Tables.events(s, dir).agg(lit("events").as("table_name"),
          count(lit(1)).as("n_rows"),
          max(to_date(col("ts"))).as("max_date")))
        .reduce(_ unionAll _)
      perTable
        .withColumn("lake_max", max("max_date").over(
          org.apache.spark.sql.expressions.Window.partitionBy()))
        .select(col("table_name"), col("n_rows"), col("max_date"),
          datediff(col("lake_max"), col("max_date")).cast("long")
            .as("days_behind"))
    },
    Some("""WITH t AS (
        SELECT 'orders' AS table_name, count(1) AS n_rows,
               MAX(CAST(o_orderdate AS DATE)) AS max_date FROM orders
        UNION ALL
        SELECT 'lineitem', count(1), MAX(CAST(l_shipdate AS DATE)) FROM lineitem
        UNION ALL
        SELECT 'events', count(1), MAX(CAST(CAST(ts AS TIMESTAMP) AS DATE)) FROM events
      )
      SELECT table_name, n_rows, max_date,
             CAST(MAX(max_date) OVER () - max_date AS BIGINT) AS days_behind
      FROM t"""))

  val all: Seq[Q] = Seq(scd2History, snapshotCdc, rangeJoin, partitionStats,
    schemaEvolution, bucketedJoin, incrementalMv, stratifiedSample, qualityAudit,
    columnProfile, refIntegrity, orderReconcile, deletionFootprint, reshardCost,
    fdAudit, joinCardAudit, freshnessReport)
}
