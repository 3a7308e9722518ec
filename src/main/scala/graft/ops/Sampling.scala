package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Deterministic dataset splitting for training pipelines: membership is a
  * pure function of a salt and the stable row key, so the split is
  * reproducible across runs/engines, leakage-proof under re-partitioning or
  * re-ingestion (a document never migrates between train and val), requires
  * no shuffle, no stored assignment table, and no RNG state. The hash family
  * is md5 hex compared lexicographically — uniform over [0,1) at ~4 bits per
  * leading hex digit, and bit-identical in Spark and DuckDB, so the split is
  * fully oracled.
  */
object Sampling {

  private val salt = "split42" // the seed: change to re-draw the split
  // md5 < "e6" keeps 230/256 ≈ 89.8% of keys → train; the rest → val
  private val trainThreshold = "e6"

  /** Hash-based train/val split over the documents table (~90/10). */
  val trainSplit: Q = Q(
    "q48_train_split",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(md5(concat_ws("|", lit(salt), col("doc_id").cast("string")))
            < trainThreshold, "train").otherwise("val").as("split"))
    },
    Some(s"""SELECT doc_id,
        CASE WHEN md5('$salt' || '|' || CAST(doc_id AS VARCHAR)) < '$trainThreshold'
             THEN 'train' ELSE 'val' END AS split
      FROM documents"""))

  /** Deterministic seeded GLOBAL training order — every epoch pipeline's
    * last step is "shuffle the corpus", and the naive formulation
    * (`row_number() OVER (ORDER BY key)`) funnels 100 TB through ONE task.
    * This assigns the identical total-order rank with bucket-parallel
    * sorting instead:
    *
    *   1. shuffle key = md5 of (doc_id, seed) — reproducible across runs,
    *      engines and partitionings, no RNG state (q48's hash family);
    *   2. bucket = first 2 hex chars of the key (256 ranges of the SAME
    *      lexicographic order the rank is defined over);
    *   3. per-bucket counts (256-row aggregate) → exclusive prefix offsets,
    *      a driver-size window;
    *   4. rank = bucket offset + row_number within the bucket — 256-way
    *      parallel windows, each ~1/256 of the corpus.
    *
    * Identical to the one-task formulation row for row (md5 has no ties and
    * bucket ranges are order-aligned prefixes), which is exactly what the
    * oracle runs. At 1000 executors, raise the prefix length (4 hex chars =
    * 65536 buckets) — parallelism scales as 16^k with no plan change. */
  val trainOrder: Q = Q(
    "q100_train_order",
    (s, dir) => {
      val keyed = Tables.documents(s, dir)
        .select(col("doc_id"),
          md5(concat_ws("|", lit(salt), col("doc_id").cast("string"), lit("order")))
            .as("shuffle_key"))
        .withColumn("bucket", substring(col("shuffle_key"), 1, 2))
      val offsets = keyed.groupBy("bucket").agg(count(lit(1)).as("bn"))
        .withColumn("off", coalesce(
          sum("bn").over(Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bucket", "off")
      keyed.join(broadcast(offsets), Seq("bucket"))
        .withColumn("train_rank", col("off") +
          row_number().over(Window.partitionBy("bucket").orderBy("shuffle_key")))
        .select(col("doc_id"), col("shuffle_key"), col("train_rank"))
    },
    Some(s"""SELECT doc_id,
        md5('$salt' || '|' || CAST(doc_id AS VARCHAR) || '|' || 'order') AS shuffle_key,
        row_number() OVER (
          ORDER BY md5('$salt' || '|' || CAST(doc_id AS VARCHAR) || '|' || 'order')
        ) AS train_rank
      FROM documents"""))

  // ---- q137: proportional holdout via largest-remainder apportionment ------
  private val holdoutK = 100

  /** Build a fixed-size eval holdout (K docs) allocated across sources in
    * EXACT proportion — Hamilton's largest-remainder method, the
    * deterministic-integer answer to "100 docs, same source mix as the
    * corpus": base quota n_src·K DIV N per source, then the K − Σbase
    * leftover seats go to the largest remainders (tie-broken by source).
    * Unlike q52's per-source rate sampling (expected counts, binomial
    * jitter) and q80's fixed n-per-group (ignores proportions), the total
    * and the mix are both exact. Membership within a source is the q48 hash
    * family — reproducible, engine-portable, leakage-stable.
    *
    * Scale shape: apportionment runs on the |sources|-row aggregate (the
    * driver-size windows); the only data-sized work is the source count and
    * the per-source hash-rank pick. The rank here is a per-source window;
    * at 100 TB substitute q58's bounded top-k-per-group aggregator (quota ≤
    * K, so map-side state is K rows per source) — same rows, no full sort. */
  val proportionalHoldout: Q = Q(
    "q137_proportional_holdout",
    (s, dir) => {
      val d = Tables.documents(s, dir)
      val bySrc = d.groupBy("source").agg(count(lit(1)).as("n_src"))
      val tot = bySrc.agg(sum("n_src").as("n_total"))
      val alloc = bySrc.crossJoin(broadcast(tot))
        .withColumn("base", expr(s"n_src * $holdoutK DIV n_total"))
        .withColumn("rem", expr(s"n_src * $holdoutK % n_total"))
        .withColumn("rr", row_number()
          .over(Window.orderBy(col("rem").desc, col("source"))).cast("long"))
      val leftover = alloc.agg((lit(holdoutK) - sum("base")).as("leftover"))
      val quota = alloc.crossJoin(broadcast(leftover))
        .withColumn("quota",
          col("base") + when(col("rr") <= col("leftover"), 1L).otherwise(0L))
        .select("source", "n_src", "quota")
      d.select(col("doc_id"), col("source"),
          md5(concat_ws("|", lit(salt), col("doc_id").cast("string"),
            lit("holdout"))).as("hk"))
        .withColumn("rn", row_number()
          .over(Window.partitionBy("source").orderBy("hk", "doc_id")).cast("long"))
        .join(broadcast(quota), "source")
        .filter(col("rn") <= col("quota"))
        .select(col("doc_id"), col("source"), col("n_src"), col("quota"),
          col("rn").as("pick_rank"))
    },
    Some(s"""WITH by_src AS (
        SELECT source, COUNT(1) AS n_src FROM documents GROUP BY 1
      ), tot AS (SELECT CAST(SUM(n_src) AS BIGINT) AS n_total FROM by_src),
      alloc AS (
        SELECT source, n_src,
               n_src * $holdoutK // n_total AS base,
               n_src * $holdoutK % n_total AS rem,
               ROW_NUMBER() OVER (ORDER BY n_src * $holdoutK % n_total DESC,
                 source) AS rr
        FROM by_src CROSS JOIN tot
      ), l AS (SELECT $holdoutK - SUM(base) AS leftover FROM alloc),
      quota AS (
        SELECT source, n_src,
               CAST(base + CASE WHEN rr <= leftover THEN 1 ELSE 0 END AS BIGINT)
                 AS quota
        FROM alloc CROSS JOIN l
      ), ranked AS (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source
                 ORDER BY md5('$salt' || '|' || CAST(doc_id AS VARCHAR)
                   || '|' || 'holdout'), doc_id) AS rn
        FROM documents
      )
      SELECT r.doc_id, r.source, q.n_src, q.quota,
             CAST(r.rn AS BIGINT) AS pick_rank
      FROM ranked r JOIN quota q ON r.source = q.source AND r.rn <= q.quota"""))

  // ---- q138: per-source token budget via exact water-filling ---------------
  private val budgetPct = 6 // T = 60% of the corpus's tokens

  /** Mixture design under a token budget: given budget T (60% of corpus
    * tokens), cap every source at a common water level θ — the classic
    * water-filling allocation (alloc_s = min(tokens_s, θ) with the maximal
    * integer θ s.t. Σ alloc ≤ T). Small sources keep everything; big sources
    * are cut to the level — the standard anti-domination rule when one crawl
    * dwarfs the rest of a training mix.
    *
    * θ is found EXACTLY with one |sources|-row window pass, no search: sort
    * sources by tokens asc; hypothesizing that the k−1 smallest saturate,
    * θ_k = (T − cum_{k−1}) DIV (m−k+1); monotonicity makes exactly one k
    * valid (lag(tokens) ≤ θ_k < tokens_k), with the all-fit fallback
    * θ = max tokens when T ≥ total. All arithmetic BIGINT — bit-equal by
    * construction. Scale shape: one map-side-combined token aggregation is
    * the only data-sized pass; the solve is dimension-sized. */
  val tokenWaterfill: Q = Q(
    "q138_token_waterfill",
    (s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("source"), size(split(col("text"), " ")).cast("long").as("t"))
        .groupBy("source").agg(sum("t").as("tokens"))
      val tot = tok.agg(sum("tokens").as("tt"), count(lit(1)).as("m"))
      val w = Window.orderBy(col("tokens"), col("source"))
      val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val rows = tok.crossJoin(broadcast(tot))
        .withColumn("budget", expr(s"tt * $budgetPct DIV 10"))
        .withColumn("k", row_number().over(w).cast("long"))
        .withColumn("cum", sum("tokens").over(run))
        .withColumn("prev_tok", coalesce(lag(col("tokens"), 1).over(w), lit(0L)))
        .withColumn("cand", expr("(budget - (cum - tokens)) DIV (m - k + 1)"))
      val theta = rows
        .withColumn("valid",
          col("cand") >= col("prev_tok") && col("cand") < col("tokens"))
        .agg(coalesce(min(when(col("valid"), col("cand"))), max(col("tokens")))
          .as("theta"))
      tok.crossJoin(broadcast(theta)).crossJoin(broadcast(tot))
        .withColumn("budget", expr(s"tt * $budgetPct DIV 10"))
        .select(col("source"), col("tokens"), col("theta"), col("budget"),
          least(col("tokens"), col("theta")).as("alloc"),
          when(col("tokens") > col("theta"), 1).otherwise(0).as("saturated"))
    },
    Some(s"""WITH tok AS (
        SELECT source,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY 1
      ), tot AS (
        SELECT CAST(SUM(tokens) AS BIGINT) AS tt, COUNT(1) AS m FROM tok
      ), rows_ AS (
        SELECT source, tokens, tt, m,
               tt * $budgetPct // 10 AS budget,
               ROW_NUMBER() OVER w AS k,
               CAST(SUM(tokens) OVER wcum AS BIGINT) AS cum,
               COALESCE(LAG(tokens, 1) OVER w, 0) AS prev_tok
        FROM tok CROSS JOIN tot
        WINDOW w AS (ORDER BY tokens, source),
               wcum AS (ORDER BY tokens, source
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      ), cands AS (
        SELECT *, (budget - (cum - tokens)) // (m - k + 1) AS cand FROM rows_
      ), theta AS (
        SELECT COALESCE(
            MIN(CASE WHEN cand >= prev_tok AND cand < tokens THEN cand END),
            MAX(tokens)) AS theta
        FROM cands
      )
      SELECT t.source, t.tokens, th.theta, tot.tt * $budgetPct // 10 AS budget,
             CAST(LEAST(t.tokens, th.theta) AS BIGINT) AS alloc,
             CASE WHEN t.tokens > th.theta THEN 1 ELSE 0 END AS saturated
      FROM tok t CROSS JOIN theta th CROSS JOIN tot"""))

  // ---- q174: stratified interleaved training order -------------------------
  /** q174: the data-loader order that keeps every training PREFIX at the
    * corpus source mix — "homogeneous shuffling": doc k of a source with
    * n_s docs sorts at fractional position (k+1)/n_s, so source streams
    * interleave proportionally instead of clumping (q100's global hash
    * order is mix-correct only in expectation; this is mix-correct by
    * construction, the property curriculum/mixture schedules rely on).
    * Within a source, k follows the q48 hash family, so the order is also
    * shuffled *within* each stream. The fraction is one double division of
    * exact integers — identical cross-engine — and the final order is the
    * tie-broken total order (frac, source, doc_id).
    *
    * Distributed shape: one source-partitioned rank window + a broadcast
    * of the |sources|-row size table; the global position uses q100's
    * two-phase bucket rank (r14 — the naive `row_number() OVER (ORDER BY
    * frac, ...)` serialized the corpus through ONE task, the exact shape
    * the PlanGates sort gate exists to catch): bucket = ⌊frac·256⌋ is a
    * monotone prefix of the leading sort key (equal fracs share a bucket,
    * so bucket ranges are order-aligned), per-bucket counts give exclusive
    * prefix offsets (≤257-row window), and global_pos = offset +
    * within-bucket row_number over the full (frac, source, doc_id) key —
    * identical total order, 256-way parallel. frac is uniform on (0,1] by
    * construction (k/n_src), so buckets are balanced. */
  val interleavedOrder: Q = Q(
    "q174_interleaved_order",
    (s, dir) => {
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          Md5Draw.draw(16, lit("ord42"), col("doc_id")).as("draw"))
      val wSrc = Window.partitionBy("source").orderBy(col("draw"), col("doc_id"))
      val sizes = d.groupBy("source").agg(count(lit(1)).as("n_src"))
      val ranked = d.withColumn("k", row_number().over(wSrc).cast("long"))
        .join(broadcast(sizes), "source")
        .withColumn("frac", col("k").cast("double") / col("n_src").cast("double"))
        .withColumn("fb", floor(col("frac") * 256).cast("long"))
      val offs = ranked.groupBy("fb").agg(count(lit(1)).as("bn"))
        .withColumn("off", coalesce(
          sum("bn").over(Window.orderBy("fb")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("fb", "off")
      ranked.join(broadcast(offs), Seq("fb"))
        .withColumn("global_pos", (col("off") + row_number().over(
          Window.partitionBy("fb")
            .orderBy(col("frac"), col("source"), col("doc_id")))).cast("long"))
        .select("doc_id", "source", "k", "n_src", "frac", "global_pos")
    },
    Some(s"""WITH d AS (
        SELECT doc_id, source,
               ${Md5Draw.drawSql(16, "'ord42'", "doc_id")} AS draw
        FROM documents
      ), sizes AS (
        SELECT source, count(1) AS n_src FROM d GROUP BY source
      ), ranked AS (
        SELECT d.doc_id, d.source,
               CAST(ROW_NUMBER() OVER (PARTITION BY d.source
                 ORDER BY d.draw, d.doc_id) AS BIGINT) AS k,
               CAST(s.n_src AS BIGINT) AS n_src
        FROM d JOIN sizes s ON d.source = s.source
      )
      SELECT doc_id, source, k, n_src,
             CAST(k AS DOUBLE) / CAST(n_src AS DOUBLE) AS frac,
             CAST(ROW_NUMBER() OVER (ORDER BY CAST(k AS DOUBLE) / CAST(n_src AS DOUBLE),
               source, doc_id) AS BIGINT) AS global_pos
      FROM ranked"""))

  // ---- q179: temperature-scaled mixture weights ----------------------------
  private val mixtureK = 1000L

  /** q179: temperature-scaled source sampling weights — w_s ∝ n_s^(1/2)
    * (α = 0.5, the up-weight-the-tail rule multilingual mixes use between
    * proportional α=1 and uniform α=0) — and the exact largest-remainder
    * allocation of a 1000-doc budget by those weights. √ is a correctly-
    * rounded IEEE op, and the weight normalizer FLOOR-quantizes each
    * weight to a 1e-6 BIGINT before the exact integer sum — the tie-safe
    * form the float contract prescribes for arbitrary doubles (a
    * double→DECIMAL cast rounds shortest-repr in Spark but binary
    * expansion in DuckDB; diagnosed on q199's n·σ weights, hardened here
    * too since √n is equally arbitrary); the apportionment reuses q137's
    * Hamilton scheme with DOUBLE quotas (deterministic: quota, remainder
    * rank and tie-break are all fixed-shape). Together with q137 (α=1) and
    * q138 (hard caps) this completes the mixture-design toolbox.
    *
    * Distributed shape: everything after the per-source count runs on
    * |sources| rows. */
  val temperatureMixture: Q = Q(
    "q179_temperature_mixture",
    (s, dir) => {
      val bySrc = Tables.documents(s, dir)
        .groupBy("source").agg(count(lit(1)).as("n_src"))
        .withColumn("wq",
          floor(sqrt(col("n_src").cast("double")) * lit(1e6)).cast("long"))
      val tot = bySrc.agg(sum("wq").as("w_tot"))
      val alloc = bySrc.crossJoin(broadcast(tot))
        .withColumn("weight",
          col("wq").cast("double") / col("w_tot").cast("double"))
        .withColumn("quota_raw", (lit(mixtureK) * col("wq")).cast("double")
          / col("w_tot").cast("double"))
        .withColumn("base", floor(col("quota_raw")).cast("long"))
        .withColumn("rem", col("quota_raw") - col("base").cast("double"))
        .withColumn("rr", row_number()
          .over(Window.orderBy(col("rem").desc, col("source"))).cast("long"))
      val leftover = alloc.agg((lit(mixtureK) - sum("base")).as("leftover"))
      alloc.crossJoin(broadcast(leftover))
        .withColumn("quota",
          col("base") + when(col("rr") <= col("leftover"), 1L).otherwise(0L))
        .select("source", "n_src", "weight", "quota")
    },
    Some(s"""WITH bySrc AS (
        SELECT source, count(1) AS n_src,
               CAST(FLOOR(sqrt(CAST(count(1) AS DOUBLE)) * 1e6) AS BIGINT) AS wq
        FROM documents GROUP BY source
      ), tot AS (
        SELECT CAST(SUM(wq) AS BIGINT) AS w_tot FROM bySrc
      ), alloc AS (
        SELECT source, n_src,
               CAST(wq AS DOUBLE) / CAST(t.w_tot AS DOUBLE) AS weight,
               CAST($mixtureK * wq AS DOUBLE) / CAST(t.w_tot AS DOUBLE)
                 AS quota_raw
        FROM bySrc CROSS JOIN tot t
      ), ranked AS (
        SELECT source, n_src, weight,
               CAST(FLOOR(quota_raw) AS BIGINT) AS base,
               quota_raw - FLOOR(quota_raw) AS rem,
               CAST(ROW_NUMBER() OVER (ORDER BY quota_raw - FLOOR(quota_raw) DESC,
                 source) AS BIGINT) AS rr
        FROM alloc
      ), l AS (
        SELECT $mixtureK - SUM(base) AS leftover FROM ranked
      )
      SELECT source, n_src, weight,
             base + CASE WHEN rr <= l.leftover THEN 1 ELSE 0 END AS quota
      FROM ranked CROSS JOIN l"""))

  // ---- q199: Neyman sampling allocation ------------------------------------
  private val neymanBudget = 1000L

  /** q199: Neyman (optimal) allocation of a 1000-doc audit budget across
    * sources — n_h·σ_h weights instead of q137's proportional or q179's
    * temperature-scaled n_h^α: for a fixed budget, sampling variance of the
    * estimated corpus mean is MINIMIZED by allocating to strata in
    * proportion to size × within-stratum spread. σ_h comes from exact
    * integer moments (the q175 recipe: Σx, Σx² as BIGINT; quotients and
    * the m² subtraction are fixed-shape doubles), each weight n_h·σ_h is
    * FLOOR-quantized onto a 1e-3 BIGINT grid before the normalizer sum
    * (FLOOR(x·1000) — the q179 scheme and the Pipelines.scala conversion
    * contract, closing the double→DECIMAL rounding-boundary tie class), and
    * the integer split reuses the
    * q137/q179 Hamilton largest-remainder scheme — so the allocation is
    * bit-stable and sums to the budget exactly.
    *
    * Distributed shape: one map-side-combined per-source moment pass;
    * |sources|-row algebra after. */
  val neymanAllocation: Q = Q(
    "q199_neyman_allocation",
    (s, dir) => {
      val by = Tables.documents(s, dir)
        .groupBy("source").agg(count(lit(1)).as("n_src"),
          sum("n_chars").as("sx"),
          sum(col("n_chars") * col("n_chars")).as("sxx"))
        .withColumn("m", col("sx").cast("double") / col("n_src").cast("double"))
        .withColumn("sd", sqrt(greatest(
          col("sxx").cast("double") / col("n_src").cast("double")
            - col("m") * col("m"), lit(0.0))))
        .withColumn("wq",
          floor(col("n_src").cast("double") * col("sd") * lit(1000.0)).cast("long"))
      val tot = by.agg(sum("wq").as("w_tot"))
      val alloc = by.crossJoin(broadcast(tot))
        .withColumn("weight",
          col("wq").cast("double") / col("w_tot").cast("double"))
        .withColumn("quota_raw",
          (lit(neymanBudget) * col("wq")).cast("double")
            / col("w_tot").cast("double"))
        .withColumn("base", floor(col("quota_raw")).cast("long"))
        .withColumn("rem", col("quota_raw") - col("base").cast("double"))
        .withColumn("rr", row_number()
          .over(Window.orderBy(col("rem").desc, col("source"))).cast("long"))
      val leftover = alloc.agg((lit(neymanBudget) - sum("base")).as("leftover"))
      alloc.crossJoin(broadcast(leftover))
        .withColumn("quota",
          col("base") + when(col("rr") <= col("leftover"), 1L).otherwise(0L))
        .select("source", "n_src", "sd", "weight", "quota")
    },
    Some(s"""WITH by AS (
        SELECT source, count(1) AS n_src,
               CAST(SUM(n_chars) AS BIGINT) AS sx,
               CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
        FROM documents GROUP BY source
      ), sds AS (
        SELECT source, n_src,
               sqrt(GREATEST(CAST(sxx AS DOUBLE) / CAST(n_src AS DOUBLE)
                 - (CAST(sx AS DOUBLE) / CAST(n_src AS DOUBLE))
                   * (CAST(sx AS DOUBLE) / CAST(n_src AS DOUBLE)), 0.0)) AS sd
        FROM by
      ), ws AS (
        SELECT source, n_src, sd,
               CAST(FLOOR(CAST(n_src AS DOUBLE) * sd * 1000.0) AS BIGINT) AS wq
        FROM sds
      ), tot AS (
        SELECT CAST(SUM(wq) AS BIGINT) AS w_tot FROM ws
      ), alloc AS (
        SELECT source, n_src, sd,
               CAST(wq AS DOUBLE) / CAST(t.w_tot AS DOUBLE) AS weight,
               CAST($neymanBudget * wq AS DOUBLE) / CAST(t.w_tot AS DOUBLE)
                 AS quota_raw
        FROM ws CROSS JOIN tot t
      ), ranked AS (
        SELECT source, n_src, sd, weight,
               CAST(FLOOR(quota_raw) AS BIGINT) AS base,
               quota_raw - FLOOR(quota_raw) AS rem,
               CAST(ROW_NUMBER() OVER (ORDER BY quota_raw - FLOOR(quota_raw) DESC,
                 source) AS BIGINT) AS rr
        FROM alloc
      ), l AS (
        SELECT $neymanBudget - SUM(base) AS leftover FROM ranked
      )
      SELECT source, CAST(n_src AS BIGINT) AS n_src, sd, weight,
             CAST(base + CASE WHEN rr <= l.leftover THEN 1 ELSE 0 END AS BIGINT)
               AS quota
      FROM ranked CROSS JOIN l"""))

  // ---- q227: split manifest ------------------------------------------------
  /** q227: the release manifest of a deterministic 3-way train/val/test
    * split — per (split, source): document count, token mass, char mass —
    * plus, per split, the EXACT deviation of its realized document count
    * from the hash-family target (204/26/26 of 256). The manifest is what a
    * training run records next to its data card, and the deviation column
    * is the drift alarm: a re-generated corpus whose split fractions move
    * beyond binomial noise means the key family or the id space changed —
    * the silent leakage class q48's docstring warns about.
    *
    * FP shape: all columns are exact integers; the deviation is the
    * cross-multiplication n_split·256 − target·n_total (no division, no
    * ppm rounding) so both engines agree bit-for-bit at any corpus size
    * that fits BIGINT/256.
    *
    * Distributed shape: one scan → (split, source) cells; the per-split and
    * grand totals roll up from the ≤ 3·|sources| cells (never a second
    * scan) and broadcast back. |splits|×|sources| rows out. */
  val splitManifest: Q = Q(
    "q227_split_manifest",
    (s, dir) => {
      // same salt + md5-hex family as q48, widened to 3 ways: first 204/256
      // ("cc") → train, next 26 ("e6") → val, last 26 → test
      val key = md5(concat_ws("|", lit(salt), col("doc_id").cast("string")))
      val keyed = Tables.documents(s, dir)
        .select(col("source"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"),
          when(key < "cc", "train").when(key < "e6", "val").otherwise("test")
            .as("split"))
      val cell = keyed.groupBy("split", "source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"),
          sum("n_chars").as("n_chars"))
      val bySplit = cell.groupBy("split").agg(sum("n_docs").as("split_docs"))
      val grand = cell.agg(sum("n_docs").as("total_docs"))
      cell.join(broadcast(bySplit), "split").crossJoin(broadcast(grand))
        .withColumn("target_256",
          when(col("split") === "train", 204L).when(col("split") === "val", 26L)
            .otherwise(26L))
        .withColumn("dev_256",
          col("split_docs") * 256L - col("target_256") * col("total_docs"))
        .select("split", "source", "n_docs", "n_tokens", "n_chars",
          "split_docs", "target_256", "dev_256")
    },
    Some(s"""WITH keyed AS (
        SELECT source, n_chars,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
               CASE WHEN md5('$salt' || '|' || CAST(doc_id AS VARCHAR)) < 'cc'
                      THEN 'train'
                    WHEN md5('$salt' || '|' || CAST(doc_id AS VARCHAR)) < 'e6'
                      THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
      ), cell AS (
        SELECT split, source, CAST(count(1) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM keyed GROUP BY split, source
      ), bysplit AS (
        SELECT split, CAST(SUM(n_docs) AS BIGINT) AS split_docs
        FROM cell GROUP BY split
      ), grand AS (
        SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs FROM cell
      )
      SELECT cell.split, cell.source, cell.n_docs, cell.n_tokens, cell.n_chars,
             b.split_docs,
             CAST(CASE WHEN cell.split = 'train' THEN 204 ELSE 26 END AS BIGINT)
               AS target_256,
             CAST(b.split_docs * 256
               - CASE WHEN cell.split = 'train' THEN 204 ELSE 26 END
                 * g.total_docs AS BIGINT) AS dev_256
      FROM cell JOIN bysplit b ON cell.split = b.split CROSS JOIN grand g"""))

  // ---- q230: validation OOV rate against the train vocabulary ---------------
  /** q230: per source, how much of the VAL split's token mass is
    * out-of-vocabulary relative to the TRAIN split (q48's md5 family) —
    * token-occurrence OOV rate plus distinct-type OOV rate. A val set
    * whose vocabulary the train split never saw measures generalization to
    * noise, not language; per-source OOV is the diagnostic read before
    * trusting per-source val loss (a high-OOV source's loss is inflated by
    * construction).
    *
    * FP shape: all counting exact integers; two BIGINT/BIGINT divisions
    * per source row.
    *
    * Distributed shape: one explode → (split, source, word) counts; the
    * train vocabulary is a distinct-word frame joined on the word key (the
    * shuffle both sides already have); |sources| rows out. No broadcast of
    * the corpus-sized vocabulary. */
  val valOovRate: Q = Q(
    "q230_val_oov_rate",
    (s, dir) => {
      val words = Tables.documents(s, dir)
        .select(col("source"),
          when(md5(concat_ws("|", lit(salt), col("doc_id").cast("string")))
            < trainThreshold, "train").otherwise("val").as("split"),
          explode(split(col("text"), " ")).as("w"))
      val trainVocab = words.filter(col("split") === "train")
        .select("w").distinct().withColumn("seen", lit(1L))
      val valCounts = words.filter(col("split") === "val")
        .groupBy("source", "w").agg(count(lit(1)).as("c"))
      valCounts.join(trainVocab, Seq("w"), "left")
        .groupBy("source")
        .agg(sum("c").as("n_val_tokens"),
          sum(when(col("seen").isNull, col("c")).otherwise(0L))
            .as("n_oov_tokens"),
          count(lit(1)).as("n_val_types"),
          sum(when(col("seen").isNull, 1L).otherwise(0L)).as("n_oov_types"))
        .withColumn("oov_token_frac",
          col("n_oov_tokens").cast("double") / col("n_val_tokens").cast("double"))
        .withColumn("oov_type_frac",
          col("n_oov_types").cast("double") / col("n_val_types").cast("double"))
    },
    Some(s"""WITH words AS (
        SELECT source,
               CASE WHEN md5('$salt' || '|' || CAST(doc_id AS VARCHAR))
                      < '$trainThreshold' THEN 'train' ELSE 'val' END AS split,
               unnest(string_split(text, ' ')) AS w
        FROM documents
      ), train_vocab AS (
        SELECT DISTINCT w FROM words WHERE split = 'train'
      ), val_counts AS (
        SELECT source, w, CAST(count(1) AS BIGINT) AS c
        FROM words WHERE split = 'val' GROUP BY source, w
      )
      SELECT v.source,
             CAST(SUM(v.c) AS BIGINT) AS n_val_tokens,
             CAST(SUM(CASE WHEN t.w IS NULL THEN v.c ELSE 0 END) AS BIGINT)
               AS n_oov_tokens,
             CAST(count(1) AS BIGINT) AS n_val_types,
             CAST(SUM(CASE WHEN t.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov_types,
             CAST(SUM(CASE WHEN t.w IS NULL THEN v.c ELSE 0 END) AS DOUBLE)
               / CAST(SUM(v.c) AS DOUBLE) AS oov_token_frac,
             CAST(SUM(CASE WHEN t.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(1) AS DOUBLE) AS oov_type_frac
      FROM val_counts v LEFT JOIN train_vocab t ON v.w = t.w
      GROUP BY v.source"""))

  // ---- q237: DSIR-style hashed-ngram importance selection -------------------

  /** q237's selection size and feature-space width. 256 buckets = the 2-hex
    * md5 prefix (the q78 count-min family); DSIR's paper uses 10k hashed
    * buckets at web scale — the bucket count is a dial, the mechanism is
    * identical. */
  private val dsirTopK = 100
  private val dsirBuckets = 256
  private val dsirScale = 1000000L

  /** q237: data selection for language-model training via hashed-n-gram
    * importance weights (the DSIR recipe, arXiv:2302.03169): score every
    * candidate document by how much its hashed-bigram profile looks like a
    * TARGET corpus (here: the 'src0' slice, standing in for a curated
    * reference set) relative to the RAW corpus, and keep the top-K.
    *
    * Exact-arithmetic variant: DSIR's log-likelihood-ratio Σ n_f·log(p_t(f)/
    * p_r(f)) is NOT cross-engine bit-stable (ln() differs in final ulps
    * between engines — the q116 rule), so the per-bucket importance is kept
    * as the add-1-smoothed probability RATIO itself, floor-quantized to
    * integer micro-units with one integer division per bucket:
    *   w_f = ⌊ 10^6 · (ct_f+1)(R+B) / ((cr_f+1)(T+B)) ⌋
    * (ct/cr = target/raw bucket counts, T/R their totals, B = 256). The
    * products are computed in DECIMAL(38,0) / HUGEINT — at 100 TB scale,
    * (ct+1)(R+B)·10^6 ≤ ~10^32 stays in range where BIGINT would wrap
    * silently (the q221/q136 overflow rule) — and a doc's score is the
    * exact integer Σ n_f·w_f, normalized per-bigram (avg_w_micro = score
    * DIV n_bigrams, floor-exact in both engines) so selection doesn't just
    * favor long documents. Linear pooling of ratios instead of log pooling
    * is a monotone-per-bucket member of the same importance-weight family;
    * the ordering it induces is what the gate pins.
    *
    * Distributed shape: one explode over candidate+target docs → per-doc
    * bucket counts; the weight table is |B| = 256 rows (broadcast to the
    * scoring join — the only join the corpus-sized side sees); the global
    * totals are a one-row aggregate cross-joined in (the q137/q179
    * pattern); selection is TakeOrdered over (avg DESC, doc_id) — a total
    * order, so top-K is deterministic and never a single-task global sort.
    * Output: K rows. */
  val dsirSelection: Q = Q(
    "q237_dsir_selection",
    (s, dir) => {
      val grams = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("lang"),
          split(col("text"), " ").as("words"))
        .filter(size(col("words")) >= 2)
        .select(col("doc_id"), col("source"), col("lang"),
          explode(expr("""transform(sequence(0, size(words) - 2),
            i -> concat(words[i], ' ', words[i + 1]))""")).as("g"))
        .withColumn("bucket", Md5Draw.draw(2, lit("dsir"), col("g")))
      val perDoc = grams.groupBy("doc_id", "source", "lang", "bucket")
        .agg(count(lit(1)).as("n"))
      val byBucket = perDoc.groupBy("bucket").agg(
        sum("n").as("cr"),
        sum(when(col("source") === "src0", col("n")).otherwise(0L)).as("ct"))
      val tot = byBucket.agg(sum("cr").as("r_tot"), sum("ct").as("t_tot"))
      val dec = (c: org.apache.spark.sql.Column) => c.cast("decimal(38,0)")
      val weights = byBucket.crossJoin(broadcast(tot))
        .select(col("bucket"),
          expr(s"""CAST((CAST(ct + 1 AS DECIMAL(38,0))
                         * CAST(r_tot + $dsirBuckets AS DECIMAL(38,0))
                         * CAST($dsirScale AS DECIMAL(38,0)))
                    div (CAST(cr + 1 AS DECIMAL(38,0))
                         * CAST(t_tot + $dsirBuckets AS DECIMAL(38,0)))
                    AS BIGINT)""").as("w"))
      perDoc.filter(col("source") =!= "src0")
        .join(broadcast(weights), Seq("bucket"))
        .groupBy("doc_id", "source", "lang")
        .agg(sum("n").as("n_bigrams"),
          sum(dec(col("n")) * dec(col("w"))).as("score_u"))
        .select(col("doc_id"), col("source"), col("lang"), col("n_bigrams"),
          expr("CAST(score_u div n_bigrams AS BIGINT)").as("avg_w_micro"))
        .orderBy(col("avg_w_micro").desc, col("doc_id"))
        .limit(dsirTopK)
    },
    Some(s"""WITH docsw AS (
        SELECT doc_id, source, lang, string_split(text, ' ') AS words
        FROM documents WHERE len(string_split(text, ' ')) >= 2
      ), grams AS (
        SELECT doc_id, source, lang,
               ${Md5Draw.drawSql(2, "'dsir'", "g")} AS bucket
        FROM (SELECT doc_id, source, lang,
                     unnest(list_transform(range(1, len(words)),
                            i -> words[i] || ' ' || words[i + 1])) AS g
              FROM docsw)
      ), per_doc AS (
        SELECT doc_id, source, lang, bucket, CAST(count(1) AS BIGINT) AS n
        FROM grams GROUP BY doc_id, source, lang, bucket
      ), by_bucket AS (
        SELECT bucket, CAST(SUM(n) AS BIGINT) AS cr,
               CAST(SUM(CASE WHEN source = 'src0' THEN n ELSE 0 END)
                    AS BIGINT) AS ct
        FROM per_doc GROUP BY bucket
      ), tot AS (
        SELECT CAST(SUM(cr) AS BIGINT) AS r_tot,
               CAST(SUM(ct) AS BIGINT) AS t_tot
        FROM by_bucket
      ), weights AS (
        SELECT bucket,
               (CAST(ct + 1 AS HUGEINT)
                  * CAST(r_tot + $dsirBuckets AS HUGEINT) * $dsirScale)
               // (CAST(cr + 1 AS HUGEINT)
                  * CAST(t_tot + $dsirBuckets AS HUGEINT)) AS w
        FROM by_bucket CROSS JOIN tot
      )
      SELECT doc_id, source, lang,
             CAST(SUM(n) AS BIGINT) AS n_bigrams,
             CAST(SUM(CAST(n AS HUGEINT) * w) // CAST(SUM(n) AS HUGEINT)
                  AS BIGINT) AS avg_w_micro
      FROM per_doc JOIN weights USING (bucket)
      WHERE source <> 'src0'
      GROUP BY doc_id, source, lang
      ORDER BY avg_w_micro DESC, doc_id
      LIMIT $dsirTopK"""))

  // ---- q261: priority sampling (weighted corpus subsample) -----------------
  /** Sample size. 64 keeps a (K+1)-th element at every testdata sf (500+
    * docs), so the threshold branch is exercised everywhere. */
  private[graft] val psampK = 64
  /** Priority scale: u is quantized to 30 bits — u = m/2^30, m ∈ [1, 2^30] —
    * so pri = w·2^30 div m = ⌊w/u⌋ is an exact BIGINT in both engines. */
  private[graft] val psampScale = 1L << 30

  /** q261: PRIORITY SAMPLING (Duffield–Lund–Thorup, JACM 2007) — the
    * weighted subsample-and-estimate primitive for corpus statistics at
    * 100 TB: draw K documents with probability (roughly) proportional to
    * token weight, and attach to each the inverse-probability estimate
    * ŵ_i = max(w_i, τ) (τ = the (K+1)-th largest priority) whose sample sum
    * estimates ANY weight-subset total with near-optimal variance — the
    * "compute it on 64 docs, trust the number" layer that q199's Neyman
    * allocation plans and this query executes. Priorities are exact
    * integers: u_i is the 30-bit md5 of the doc id (quantized uniform —
    * documented, identical in both engines), pri_i = ⌊w_i·2^30 / m_i⌋ via
    * BIGINT integral division, and the sample is the top-K under the total
    * order (pri DESC, doc_id ASC) — a TakeOrdered head, never a global
    * sort. τ is floored to the same integer grid, so sample AND estimates
    * are bit-identical cross-engine. The audit columns est_total (Σ ŵ over
    * the sample) and true_total (Σ w over the corpus) make the query its
    * own accuracy eval, the q148 pattern. [[graft.functions.PriorityTopK]]
    * is this summary's mergeable aggregate form; the streaming twin (q263)
    * maintains it incrementally over micro-batches. */
  val prioritySample: Q = Q(
    "q261_priority_sample",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("w"))
        .withColumn("m",
          expr("CAST(conv(substring(md5(concat('psamp|', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)")
            % psampScale + 1L)
        .withColumn("pri", expr(s"(w * $psampScale) div m"))
      val top = docs.orderBy(col("pri").desc, col("doc_id")).limit(psampK + 1)
      val ranked = top.withColumn("rn", row_number().over(
        Window.orderBy(col("pri").desc, col("doc_id"))))
      // τ = the (K+1)-th priority; 0 when the corpus holds ≤ K docs (then
      // the sample is the corpus and the estimator is exact by construction)
      val tau = ranked.agg(coalesce(
        max(when(col("rn") === psampK + 1, col("pri"))), lit(0L)).as("tau"))
      val sample = ranked.filter(col("rn") <= psampK)
        .crossJoin(broadcast(tau))
        .withColumn("w_hat", greatest(col("w"), col("tau")))
      val est = sample.agg(sum("w_hat").cast("long").as("est_total"))
      val tot = docs.agg(sum("w").cast("long").as("true_total"))
      sample.crossJoin(broadcast(est)).crossJoin(broadcast(tot))
        .select("doc_id", "w", "pri", "tau", "w_hat", "est_total", "true_total")
    },
    Some(s"""WITH docs AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
               ('0x' || substr(md5('psamp|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 % $psampScale + 1 AS m
        FROM documents
      ), pri AS (
        SELECT doc_id, w, (w * $psampScale) // m AS pri FROM docs
      ), ranked AS (
        SELECT doc_id, w, pri,
               row_number() OVER (ORDER BY pri DESC, doc_id) AS rn
        FROM pri
      ), tau AS (
        SELECT COALESCE(MAX(CASE WHEN rn = ${psampK + 1} THEN pri END), 0) AS tau
        FROM ranked WHERE rn <= ${psampK + 1}
      ), sample AS (
        SELECT doc_id, w, pri, tau,
               GREATEST(w, tau) AS w_hat
        FROM ranked CROSS JOIN tau WHERE rn <= $psampK
      ), est AS (
        SELECT CAST(SUM(w_hat) AS BIGINT) AS est_total FROM sample
      ), tot AS (
        SELECT CAST(SUM(w) AS BIGINT) AS true_total FROM pri
      )
      SELECT doc_id, w, pri, tau, w_hat, est_total, true_total
      FROM sample CROSS JOIN est CROSS JOIN tot"""))

  // ---- q266: stratified priority sample (per-source) -----------------------
  /** Per-stratum sample size: 16 per source keeps a (K+1)-th element in
    * every source at every testdata sf (≥ ~100 docs per source). */
  private[graft] val psampStratK = 16

  /** q266: STRATIFIED priority sampling — q261's estimator drawn
    * independently within every source, so per-stratum totals come with
    * their own inverse-probability estimates (the per-SOURCE corpus stats
    * a mixture rebalance needs, where q261's global sample can starve a
    * small stratum entirely). This completes the sampling taxonomy the
    * repo builds: q199 plans the allocation, q80/q137 draw proportional /
    * largest-remainder holdouts, q261 draws the global weighted sample,
    * and this is the per-stratum estimator. Same exact-integer priority
    * family as q261 (the SAME md5 key — a doc's priority is a pure
    * function of its id, so the global and stratified samples are
    * consistent views of one permutation); per-source top-K is a
    * PARTITIONED window rank (never a global sort, never a driver
    * collect), τ_s is the per-source (K+1)-th priority, ŵ = max(w, τ_s),
    * and est_src vs true_src audit columns make each stratum its own
    * accuracy eval. */
  val stratifiedPrioritySample: Q = Q(
    "q266_stratified_priority_sample",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ")).cast("long").as("w"))
        .withColumn("m",
          expr("CAST(conv(substring(md5(concat('psamp|', CAST(doc_id AS STRING))), 1, 8), 16, 10) AS BIGINT)")
            % psampScale + 1L)
        .withColumn("pri", expr(s"(w * $psampScale) div m"))
      val ranked = docs.withColumn("rn", row_number().over(
        Window.partitionBy("source").orderBy(col("pri").desc, col("doc_id"))))
        .filter(col("rn") <= psampStratK + 1)
      val tau = ranked.groupBy("source").agg(coalesce(
        max(when(col("rn") === psampStratK + 1, col("pri"))), lit(0L)).as("tau"))
      val sample = ranked.filter(col("rn") <= psampStratK)
        .join(tau, Seq("source"))
        .withColumn("w_hat", greatest(col("w"), col("tau")))
      val est = sample.groupBy("source")
        .agg(sum("w_hat").cast("long").as("est_src"))
      val tot = docs.groupBy("source").agg(sum("w").cast("long").as("true_src"))
      sample.join(est, Seq("source")).join(tot, Seq("source"))
        .select("source", "doc_id", "w", "pri", "tau", "w_hat",
          "est_src", "true_src")
    },
    Some(s"""WITH docs AS (
        SELECT doc_id, source, CAST(len(string_split(text, ' ')) AS BIGINT) AS w,
               ('0x' || substr(md5('psamp|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 % $psampScale + 1 AS m
        FROM documents
      ), pri AS (
        SELECT doc_id, source, w, (w * $psampScale) // m AS pri FROM docs
      ), ranked AS (
        SELECT doc_id, source, w, pri,
               row_number() OVER (PARTITION BY source
                                  ORDER BY pri DESC, doc_id) AS rn
        FROM pri
      ), tau AS (
        SELECT source,
               COALESCE(MAX(CASE WHEN rn = ${psampStratK + 1} THEN pri END), 0) AS tau
        FROM ranked WHERE rn <= ${psampStratK + 1} GROUP BY source
      ), sample AS (
        SELECT r.source, r.doc_id, r.w, r.pri, t.tau,
               GREATEST(r.w, t.tau) AS w_hat
        FROM ranked r JOIN tau t ON r.source = t.source
        WHERE r.rn <= $psampStratK
      ), est AS (
        SELECT source, CAST(SUM(w_hat) AS BIGINT) AS est_src
        FROM sample GROUP BY source
      ), tot AS (
        SELECT source, CAST(SUM(w) AS BIGINT) AS true_src
        FROM pri GROUP BY source
      )
      SELECT s.source, s.doc_id, s.w, s.pri, s.tau, s.w_hat, e.est_src, t.true_src
      FROM sample s
      JOIN est e ON s.source = e.source
      JOIN tot t ON s.source = t.source"""))

  val all: Seq[Q] = Seq(trainSplit, trainOrder, proportionalHoldout, tokenWaterfill, splitManifest, valOovRate,
    interleavedOrder, temperatureMixture, neymanAllocation, dsirSelection,
    prioritySample, stratifiedPrioritySample)
}
