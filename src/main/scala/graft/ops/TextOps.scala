package graft.ops

import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Text-analysis operators for large-scale training-data pipelines: quality
  * scoring, language ID, token counting, document fingerprinting. All are
  * narrow per-row transformations — no shuffle at all — so they scale linearly
  * with input splits; every expression is codegen'd (functions/HOFs, no UDFs).
  *
  * Capability extensions beyond the reference corpus (which has no text ops;
  * its QA layer consumes document text at /root/reference/qa/build_corpus.py).
  */
object TextOps {

  /** The q20 stopword list — shared with q57's cleaning pipeline so the two
    * queries cannot silently diverge. */
  private[ops] val stopwords = Seq("the", "a", "of", "and", "in", "to", "is")
  private[ops] def inList(xs: Seq[String]) = xs.map(w => s"'$w'").mkString("(", ", ", ")")

  /** The q20 quality score as a Spark Column:
    * min(1, n_words/20) × (1 − stopword_ratio). Shared by q20 and q57. */
  private[ops] def qualityScore(
      nWords: org.apache.spark.sql.Column, stopN: org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.when(nWords >= 20, lit(1.0))
      .otherwise(nWords / lit(20.0)) * (lit(1.0) - stopN / nWords)

  /** The same score as a DuckDB SQL fragment over a raw `text` column. */
  private[ops] val qualityScoreSql: String =
    s"""(CASE WHEN len(string_split(text, ' ')) >= 20 THEN CAST(1.0 AS DOUBLE)
          ELSE CAST(len(string_split(text, ' ')) AS BIGINT) / CAST(20.0 AS DOUBLE) END)
        * (CAST(1.0 AS DOUBLE)
           - CAST(len(list_filter(string_split(text, ' '), w -> w IN ${inList(stopwords)})) AS BIGINT)
             / CAST(len(string_split(text, ' ')) AS BIGINT))"""

  /** Per-document quality metrics: length, word count, stopword ratio, derived
    * quality score. Ratios are int/int or pure double chains → bit-identical
    * across engines, no rounding needed. */
  val textQuality: Q = Q(
    "q20_text_quality",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(
          col("doc_id"), col("lang"),
          length(col("text")).cast("long").as("len_chars"),
          size(split(col("text"), " ")).cast("long").as("n_words"),
          expr(s"size(filter(split(text, ' '), w -> w IN ${inList(stopwords)}))")
            .cast("long").as("stop_n"))
        .withColumn("stop_ratio", col("stop_n") / col("n_words"))
        .withColumn("avg_word_len",
          (col("len_chars") - (col("n_words") - 1)) / col("n_words"))
        .withColumn("quality_score",
          qualityScore(col("n_words"), col("stop_n")))
    },
    Some(s"""SELECT doc_id, lang,
      CAST(length(text) AS BIGINT) AS len_chars,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      CAST(len(list_filter(string_split(text, ' '), w -> w IN ${inList(stopwords)})) AS BIGINT) AS stop_n,
      CAST(len(list_filter(string_split(text, ' '), w -> w IN ${inList(stopwords)})) AS BIGINT) / CAST(len(string_split(text, ' ')) AS BIGINT) AS stop_ratio,
      (CAST(length(text) AS BIGINT) - (CAST(len(string_split(text, ' ')) AS BIGINT) - 1)) / CAST(len(string_split(text, ' ')) AS BIGINT) AS avg_word_len,
      $qualityScoreSql AS quality_score
      FROM documents"""))

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of"),
    "fr" -> Seq("le", "et", "les"),
    "es" -> Seq("el", "los", "y"),
    "de" -> Seq("der", "und", "die"))

  /** Marker-word language ID (n-gram-heuristic class): per-language marker
    * counts + argmax with a fixed preference order (en > fr > es > de). */
  val textLangId: Q = Q(
    "q21_text_langid",
    (s, dir) => {
      val base = markers.foldLeft(
        Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("text"))) {
        case (df, (lg, ws)) =>
          df.withColumn(s"score_$lg",
            expr(s"size(filter(split(text, ' '), w -> w IN ${inList(ws)}))").cast("long"))
      }
      base
        .withColumn("predicted_lang",
          when(col("score_en") >= col("score_fr") && col("score_en") >= col("score_es")
            && col("score_en") >= col("score_de"), "en")
            .when(col("score_fr") >= col("score_es") && col("score_fr") >= col("score_de"), "fr")
            .when(col("score_es") >= col("score_de"), "es")
            .otherwise("de"))
        .withColumn("is_correct", when(col("predicted_lang") === col("lang"), 1).otherwise(0))
        .drop("text")
    },
    Some {
      val scores = markers.map { case (lg, ws) =>
        s"CAST(len(list_filter(string_split(text, ' '), w -> w IN ${inList(ws)})) AS BIGINT) AS score_$lg"
      }.mkString(",\n        ")
      s"""WITH scored AS (
        SELECT doc_id, lang,
        $scores
        FROM documents
      )
      SELECT doc_id, lang, score_en, score_fr, score_es, score_de,
        CASE WHEN score_en >= score_fr AND score_en >= score_es AND score_en >= score_de THEN 'en'
             WHEN score_fr >= score_es AND score_fr >= score_de THEN 'fr'
             WHEN score_es >= score_de THEN 'es' ELSE 'de' END AS predicted_lang,
        CASE WHEN (CASE WHEN score_en >= score_fr AND score_en >= score_es AND score_en >= score_de THEN 'en'
             WHEN score_fr >= score_es AND score_fr >= score_de THEN 'fr'
             WHEN score_es >= score_de THEN 'es' ELSE 'de' END) = lang THEN 1 ELSE 0 END AS is_correct
      FROM scored"""
    })

  private val tokenRe = "[a-z]+|[0-9]+|[^a-z0-9 ]"

  /** Token counting: whitespace tokens + a BPE-ish regex token class; chars per
    * regex token as a double ratio. */
  val tokenCount: Q = Q(
    "q22_token_count",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars_m"),
          size(split(col("text"), " ")).cast("long").as("ws_tokens"),
          regexp_count(col("text"), lit(tokenRe)).cast("long").as("re_tokens"))
        .withColumn("chars_per_token", col("n_chars_m") / col("re_tokens"))
    },
    Some(s"""SELECT doc_id,
      CAST(length(text) AS BIGINT) AS n_chars_m,
      CAST(len(string_split(text, ' ')) AS BIGINT) AS ws_tokens,
      CAST(len(regexp_extract_all(text, '$tokenRe')) AS BIGINT) AS re_tokens,
      CAST(length(text) AS BIGINT) / CAST(len(regexp_extract_all(text, '$tokenRe')) AS BIGINT) AS chars_per_token
      FROM documents"""))

  /** Document fingerprinting: md5 + sha256 over whitespace-normalized text,
    * plus a 2-hex-char shard bucket (the partitioning key a 100 TB dedup
    * pipeline would distribute on). */
  val docFingerprint: Q = Q(
    "q23_doc_fingerprint",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          lower(trim(regexp_replace(col("text"), "\\s+", " "))).as("norm"))
        .select(
          col("doc_id"),
          md5(col("norm")).as("fp_md5"),
          sha2(col("norm"), 256).as("fp_sha256"),
          substring(md5(col("norm")), 1, 2).as("shard_bucket"))
    },
    Some("""SELECT doc_id,
      md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp_md5,
      sha256(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp_sha256,
      substring(md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), 1, 2) AS shard_bucket
      FROM documents"""))

  /** Repetition score — the dominant-token fraction (max per-word count over
    * total words), a standard low-quality/boilerplate signal in LLM data
    * pipelines. Distributed shape: pure per-row array HOFs — no explode, no
    * shuffle at all (the earlier explode→groupBy form moved a 10×-exploded
    * token stream through two exchanges). Per-row cost is O(vocab × words),
    * fine for document-sized inputs; ratio is int/int → bit-exact
    * cross-engine. */
  val repetitionScore: Q = Q(
    "q41_repetition_score",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .withColumn("uniq", array_distinct(col("words")))
        .select(col("doc_id"),
          expr("CAST(array_max(transform(uniq, u -> size(filter(words, x -> x = u)))) AS BIGINT)")
            .as("top_word_count"),
          size(col("words")).cast("long").as("n_words"),
          size(col("uniq")).cast("long").as("vocab"))
        .withColumn("repetition_ratio", col("top_word_count") / col("n_words"))
        .withColumn("type_token_ratio", col("vocab") / col("n_words"))
        .withColumn("is_repetitive", when(col("repetition_ratio") > 0.2, 1).otherwise(0))
    },
    Some("""WITH words AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
      ), counts AS (
        SELECT doc_id, w, count(1) AS cnt FROM words GROUP BY doc_id, w
      )
      SELECT doc_id, MAX(cnt) AS top_word_count,
        CAST(SUM(cnt) AS BIGINT) AS n_words,
        COUNT(DISTINCT w) AS vocab,
        MAX(cnt) / CAST(SUM(cnt) AS BIGINT) AS repetition_ratio,
        COUNT(DISTINCT w) / CAST(SUM(cnt) AS BIGINT) AS type_token_ratio,
        CASE WHEN MAX(cnt) / CAST(SUM(cnt) AS BIGINT) > 0.2 THEN 1 ELSE 0 END AS is_repetitive
      FROM counts GROUP BY doc_id"""))

  /** Per-source length-outlier detection — the anomaly gate a corpus
    * pipeline runs per source/domain to drop truncated or runaway documents.
    * The gate is |z| > 1.5: the synthetic lengths are near-uniform, so a
    * 2-sigma gate on their thin tails selects almost nothing. Mean and variance come from EXACT integer sums (count, Σx,
    * Σx²) so the statistics are order-independent — a naive double sum would
    * make the z-score depend on partition merge order and break the oracle
    * hash at high parallelism. The final z is one fixed-shape double
    * expression (÷, ×, √ are exactly-rounded IEEE ops), bit-equal in DuckDB.
    * Distributed shape: one map-side-combined aggregate over ~sources rows,
    * broadcast back onto the corpus — the text never shuffles. (Σx² of
    * BIGINT lengths stays far below 2^63 for any real corpus shard; a
    * planet-scale aggregate would promote to DECIMAL(38).) */
  val lengthOutliers: Q = Q(
    "q71_length_outliers",
    (s, dir) => {
      val stats = Tables.documents(s, dir)
        .groupBy("source")
        .agg(count(lit(1)).as("cnt"), sum("n_chars").as("sx"),
          sum(col("n_chars") * col("n_chars")).as("sxx"))
      // Zero-variance strata are excluded EXPLICITLY in both engines: z
      // would be 0/0 there, and Spark's NaN ordering (abs(NaN) > x is true)
      // disagrees with DuckDB's 0/0 → NULL (row dropped) — without the
      // variance guard a constant-length source would emit every row here
      // and none in the oracle.
      Tables.documents(s, dir)
        .join(broadcast(stats), Seq("source"))
        .withColumn("variance", expr("(sxx / cnt) - ((sx / cnt) * (sx / cnt))"))
        .filter(col("variance") > 0.0)
        .withColumn("z", expr("(n_chars - (sx / cnt)) / sqrt(variance)"))
        .filter(abs(col("z")) > 1.5)
        .select(col("doc_id"), col("source"), col("n_chars"), col("z"))
    },
    Some("""WITH stats AS (
        SELECT source, COUNT(1) AS cnt,
               CAST(SUM(n_chars) AS BIGINT) AS sx,
               CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
        FROM documents GROUP BY source
      )
      SELECT doc_id, source, n_chars, z FROM (
        SELECT d.doc_id, d.source, d.n_chars,
               (d.n_chars - (sx / cnt)) / sqrt((sxx / cnt) - ((sx / cnt) * (sx / cnt))) AS z
        FROM documents d JOIN stats s ON d.source = s.source
        WHERE (sxx / cnt) - ((sx / cnt) * (sx / cnt)) > 0.0)
      WHERE abs(z) > 1.5"""))

  // ---- q110: robust (median/MAD) length outliers ---------------------------
  /** Robust per-source length outliers: docs whose |n_chars − median| exceeds
    * 3× the median absolute deviation. q71's z-score breaks exactly when
    * outlier detection matters most — a few huge docs inflate mean AND stddev
    * until nothing is flagged (masking); median and MAD have a 50% breakdown
    * point. Both medians use the LOWER-median crossing rule (smallest value
    * whose cumulative count reaches half), so everything is integer-exact —
    * no averaging, no FP. Scale shape: per-source medians come from a
    * VALUE-AGGREGATED cumulative walk (groupBy (source, value) first, then a
    * window over value-cardinality-bound rows — never a per-row sort), and
    * the MAD pass re-aggregates that (source, value, cnt) frame itself, NOT
    * the corpus — so the whole operator is exactly two full scans (one
    * builds the stats, one applies the filter) no matter how large the
    * table. The value-count frame is a scoped eager checkpoint (computed
    * once, freed before this returns — both walks and an un-reused lazy
    * plan would re-shuffle it four times); the two walk outputs are ≤1 row
    * per source BY CONSTRUCTION, so they collect and re-enter the returned
    * plan as broadcast local relations (the q95 target-walk pattern),
    * leaving a zero-shuffle scan+filter as the only data-proportional work.
    * The oracle deliberately recomputes everything from the raw table —
    * same answer, so the scan-sharing shortcuts stay independently
    * checked. */
  val robustOutliers: Q = Q(
    "q110_robust_outliers",
    (s, dir) => {
      import org.apache.spark.sql.DataFrame
      import org.apache.spark.sql.expressions.Window
      // lower median of a (source, v, cnt) value-count frame, per source
      def lowerMedian(vc: DataFrame, out: String): DataFrame = {
        val tot = vc.groupBy("source").agg(sum("cnt").as("n"))
        val w = Window.partitionBy("source").orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        vc.join(broadcast(tot), "source")
          .withColumn("c", sum("cnt").over(w))
          .filter(col("c") * 2 >= col("n"))
          .groupBy("source").agg(min("v").as(out))
      }
      def asLocal(df: DataFrame): DataFrame =
        s.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)
      val docs = Tables.documents(s, dir)
      val vc = graft.Ckpt.eager(docs.groupBy(col("source"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("cnt")))
      val (med, mad) =
        try {
          val m = asLocal(lowerMedian(vc, "med"))
          (m, asLocal(lowerMedian(
            vc.join(broadcast(m), "source")
              .groupBy(col("source"), abs(col("v") - col("med")).as("v"))
              .agg(sum("cnt").as("cnt")), "mad")))
        } finally graft.Ckpt.free(vc)
      docs.join(broadcast(med), "source").join(broadcast(mad), "source")
        .withColumn("deviation", abs(col("n_chars") - col("med")))
        .filter(col("deviation") > col("mad") * 3)
        .select("doc_id", "source", "n_chars", "med", "mad", "deviation")
    },
    Some("""WITH vc AS (
        SELECT source, n_chars AS v, COUNT(1) AS cnt
        FROM documents GROUP BY source, n_chars
      ), tot AS (SELECT source, SUM(cnt) AS n FROM vc GROUP BY source),
      cum AS (
        SELECT vc.source, vc.v,
               SUM(cnt) OVER (PARTITION BY vc.source ORDER BY vc.v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c, t.n
        FROM vc JOIN tot t ON vc.source = t.source
      ), med AS (
        SELECT source, CAST(MIN(v) AS BIGINT) AS med
        FROM cum WHERE c * 2 >= n GROUP BY source
      ), dv AS (
        SELECT d.source, abs(d.n_chars - m.med) AS v, COUNT(1) AS cnt
        FROM documents d JOIN med m ON d.source = m.source
        GROUP BY d.source, abs(d.n_chars - m.med)
      ), dtot AS (SELECT source, SUM(cnt) AS n FROM dv GROUP BY source),
      dcum AS (
        SELECT dv.source, dv.v,
               SUM(cnt) OVER (PARTITION BY dv.source ORDER BY dv.v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c, t.n
        FROM dv JOIN dtot t ON dv.source = t.source
      ), mad AS (
        SELECT source, CAST(MIN(v) AS BIGINT) AS mad
        FROM dcum WHERE c * 2 >= n GROUP BY source
      )
      SELECT d.doc_id, d.source, d.n_chars, m.med, a.mad,
             abs(d.n_chars - m.med) AS deviation
      FROM documents d JOIN med m ON d.source = m.source
                       JOIN mad a ON d.source = a.source
      WHERE abs(d.n_chars - m.med) > a.mad * 3"""))

  // ---- q114: phrase search via positional inverted index -------------------
  /** The q114 query set — a blocklist-style batch of multi-word phrases
    * (variable lengths, so the positional join is exercised generally).
    * Shared verbatim with the generated oracle SQL. */
  private[graft] val searchPhrases: Seq[String] = Seq(
    "row column sort", "big order scan", "window fast query",
    "slow hash batch")

  /** Exact multi-phrase occurrence search — the positional-inverted-index
    * primitive behind both search and blocklist/contamination filtering
    * ("find every document containing any of these phrases, with counts").
    * A naive engine rescans every document per phrase; the index form is
    * one scan regardless of how many phrases are asked:
    *
    *   1. posexplode the token stream once → postings (doc_id, pos, term);
    *   2. the phrase set unrolls to a (phrase, offset, term) table — tiny
    *      BY NATURE (a query workload, not data), so it broadcasts;
    *   3. postings ⋈ broadcast(terms): each match proposes "phrase p could
    *      start at pos − offset"; a start backed by ALL phrase offsets
    *      (count == phrase length — each offset contributes exactly one
    *      posting row) is a real occurrence. Overlapping occurrences fall
    *      out naturally (starts are independent);
    *   4. two map-side-combined aggregations: (doc, phrase, start) → full
    *      matches, then (doc, phrase) → occurrence counts.
    *
    * Candidate volume is bounded by the postings matching any phrase term
    * (df-bounded), never all postings × phrases. The oracle is a different
    * ALGORITHM entirely — a per-document list scan over every position,
    * one generated SQL branch per phrase — so the index join's start/offset
    * arithmetic is checked against brute force at every SF. */
  private[graft] def phraseSearchOf(docs0: org.apache.spark.sql.DataFrame,
      phrases: Seq[String]): org.apache.spark.sql.DataFrame = {
    val s = docs0.sparkSession
    import s.implicits._
    val terms = phrases.flatMap { p =>
      val ws = p.split(" ")
      ws.zipWithIndex.map { case (w, off) => (p, off, w, ws.length) }
    }.toDF("phrase", "off", "term", "plen")
    val postings = docs0
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "term")))
    postings.join(broadcast(terms), "term")
      .withColumn("start", col("pos") - col("off"))
      .filter(col("start") >= 0)
      .groupBy(col("doc_id"), col("phrase"), col("start"))
      .agg(count(lit(1)).as("hits"), min("plen").as("plen"))
      .filter(col("hits") === col("plen"))
      .groupBy("doc_id", "phrase")
      .agg(count(lit(1)).as("n_occurrences"))
  }

  val phraseSearch: Q = Q(
    "q114_phrase_search",
    (s, dir) => phraseSearchOf(
      Tables.documents(s, dir).select(col("doc_id"), col("text")), searchPhrases),
    Some {
      val branches = searchPhrases.map { p =>
        val ws = p.split(" ")
        val conds = ws.zipWithIndex
          .map { case (w, i) => s"words[i + $i] = '$w'" }.mkString(" AND ")
        s"""SELECT doc_id, '$p' AS phrase,
              CAST(len(list_filter(range(1, len(words) - ${ws.length} + 2),
                i -> $conds)) AS BIGINT) AS n_occurrences
            FROM docs"""
      }.mkString("\n      UNION ALL\n      ")
      s"""WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
      ), hits AS (
      $branches
      )
      SELECT doc_id, phrase, n_occurrences FROM hits WHERE n_occurrences > 0"""
    })

  // ---- q116: corpus-trained bigram surprisal (LM-filter class) -------------
  /** Statistical-LM quality scoring, the CCNet/KenLM-filter class: train a
    * bigram model ON THE CORPUS ITSELF and score each document by how
    * surprising its token transitions are under that model — low scores mark
    * fluent/in-distribution text, high scores mark gibberish, shuffled or
    * out-of-domain docs. The production form scores against a reference-
    * corpus LM; self-training is the bootstrap every pipeline starts with.
    *
    * Per bigram occurrence (w1, w2) the add-1-smoothed inverse transition
    * probability is (c1(w1) + V) / (c2(w1,w2) + 1) — c1/c2 corpus-global
    * counts, V the vocabulary size — and the doc score is the MEAN of those.
    * Deliberately not log-perplexity: ln() is not bit-stable across engines
    * (Java Math.log vs libm disagree in the last ulp), while this rational
    * form needs only integer-ratio division and the repo's standard
    * round-sum float rule (per-row values rounded to 6 decimals, per-doc
    * sums re-rounded — association error ~1e-10 per ~100-token doc, five
    * orders below the rounding boundary), so the driver hash-compare is
    * exact. Monotone in the same direction as perplexity for ranking/
    * thresholding, which is all a filter consumes.
    *
    * Scale shape: one token explode; the bigram stream derives from a lead()
    * window per doc (doc-partitioned — parallel across docs regardless of
    * corpus size); counts are two map-side-combined aggregations; scoring
    * joins each bigram occurrence to the (w1) and (w1,w2) count tables —
    * both token-keyed shuffles, both data-proportional, no broadcast of
    * anything data-sized (vocab CAN be data-proportional; only the 1-row V
    * scalar broadcasts, the q104 pattern). */
  private[graft] def bigramSurprisalOf(docs0: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs0
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
    val bigrams = toks
      .withColumn("w2", lead("w1", 1).over(
        Window.partitionBy("doc_id").orderBy("pos")))
      .filter(col("w2").isNotNull)
    val uni = toks.groupBy("w1").agg(count(lit(1)).as("c1"))
    val bi = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    // V is by definition uni's row count — counting the already-aggregated
    // unigram table avoids a third full explode of the token stream
    val vocab = uni.agg(count(lit(1)).as("v"))
    bigrams
      .join(uni, "w1")
      .join(bi, Seq("w1", "w2"))
      .crossJoin(broadcast(vocab)) // 1-row scalar, never data-sized
      .withColumn("r", round((col("c1") + col("v")) / (col("c2") + lit(1)), 6))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"),
        (round(sum("r"), 6) / count(lit(1))).as("surprisal"))
  }

  val bigramSurprisal: Q = Q(
    "q116_bigram_surprisal",
    (s, dir) => bigramSurprisalOf(
      Tables.documents(s, dir).select(col("doc_id"), col("text"))),
    Some("""WITH toks AS (
        SELECT doc_id, i AS pos, w[i] AS w1, w[i + 1] AS w2
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             unnest(generate_series(1, len(w))) AS t(i)
      ), uni AS (
        SELECT w1, COUNT(1) AS c1 FROM toks GROUP BY w1
      ), v AS (
        SELECT COUNT(DISTINCT w1) AS v FROM toks
      ), bi AS (
        SELECT w1, w2, COUNT(1) AS c2 FROM toks
        WHERE w2 IS NOT NULL GROUP BY w1, w2
      ), sc AS (
        SELECT t.doc_id, ROUND((u.c1 + v.v) / (b.c2 + 1), 6) AS r
        FROM toks t
        JOIN uni u ON t.w1 = u.w1
        JOIN bi b ON t.w1 = b.w1 AND t.w2 = b.w2
        CROSS JOIN v
        WHERE t.w2 IS NOT NULL
      )
      SELECT doc_id, CAST(COUNT(1) AS BIGINT) AS n_bigrams,
             ROUND(SUM(r), 6) / COUNT(1) AS surprisal
      FROM sc GROUP BY doc_id"""))

  /** q142: the Gopher-style repetition rule battery (Rae et al. 2021,
    * arXiv:2112.11446 Table A1) — the n-gram-level complement to q41's
    * dominant-token fraction: per doc, the duplicate-2gram and
    * duplicate-3gram fractions (1 − distinct/total), the top-2gram mass
    * fraction, and mean word length, each gated by a fixed threshold into
    * one admission flag. Every metric is an int/int division from exact
    * counts → bit-identical cross-engine; zero-count grams are guarded to
    * 0.0 explicitly in BOTH engines (Spark long/0 → NULL, DuckDB would
    * raise — an unguarded short doc diverges the engines).
    *
    * Distributed shape: like q41, pure per-row array HOFs — no explode, no
    * shuffle AT ALL; the whole battery is one codegen'd projection over the
    * scan, so it composes into any ingest pass for free. Per-row cost is
    * O(distinct-grams × grams) for the top-mass term — document-sized, not
    * corpus-sized. */
  val gopherRules: Q = Q(
    "q142_gopher_rules",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .withColumn("n_words", size(col("words")).cast("long"))
        .withColumn("n_chars_words",
          expr("CAST(aggregate(words, 0L, (a, x) -> a + length(x)) AS BIGINT)"))
        .withColumn("g2", expr("CASE WHEN size(words) >= 2 THEN " +
          "transform(sequence(1, size(words)-1), i -> concat(element_at(words, i), '|', element_at(words, i+1))) " +
          "ELSE CAST(array() AS ARRAY<STRING>) END"))
        .withColumn("g3", expr("CASE WHEN size(words) >= 3 THEN " +
          "transform(sequence(1, size(words)-2), i -> concat(element_at(words, i), '|', element_at(words, i+1), '|', element_at(words, i+2))) " +
          "ELSE CAST(array() AS ARRAY<STRING>) END"))
        .withColumn("n2", size(col("g2")).cast("long"))
        .withColumn("n3", size(col("g3")).cast("long"))
        .withColumn("dup2_frac", when(col("n2") > 0,
          (col("n2") - size(array_distinct(col("g2"))).cast("long")) / col("n2"))
          .otherwise(lit(0.0)))
        .withColumn("dup3_frac", when(col("n3") > 0,
          (col("n3") - size(array_distinct(col("g3"))).cast("long")) / col("n3"))
          .otherwise(lit(0.0)))
        .withColumn("top2_frac", when(col("n2") > 0,
          expr("CAST(array_max(transform(array_distinct(g2), u -> size(filter(g2, x -> x = u)))) AS BIGINT)") / col("n2"))
          .otherwise(lit(0.0)))
        .withColumn("mean_word_len", col("n_chars_words") / col("n_words"))
        .withColumn("pass_gopher",
          col("n_words") >= 30 && col("mean_word_len") >= 3.0 &&
            col("mean_word_len") <= 6.0 && col("dup2_frac") <= 0.06 &&
            col("dup3_frac") <= 0.02 && col("top2_frac") <= 0.08)
        .select("doc_id", "n_words", "mean_word_len", "dup2_frac",
          "dup3_frac", "top2_frac", "pass_gopher")
    },
    Some("""WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
      ), g AS (
        SELECT doc_id, w, len(w) AS n_words,
          CASE WHEN len(w) >= 2 THEN list_transform(range(1, len(w)),
            i -> w[i] || '|' || w[i+1]) ELSE [] END AS g2,
          CASE WHEN len(w) >= 3 THEN list_transform(range(1, len(w)-1),
            i -> w[i] || '|' || w[i+1] || '|' || w[i+2]) ELSE [] END AS g3
        FROM d
      ), m AS (
        SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
          CAST(list_sum(list_transform(w, x -> len(x))) AS BIGINT) AS n_chars_words,
          CAST(len(g2) AS BIGINT) AS n2, CAST(len(g3) AS BIGINT) AS n3,
          CAST(len(list_distinct(g2)) AS BIGINT) AS d2,
          CAST(len(list_distinct(g3)) AS BIGINT) AS d3,
          CAST(COALESCE(list_max(list_transform(list_distinct(g2),
            u -> len(list_filter(g2, x -> x = u)))), 0) AS BIGINT) AS top2
        FROM g
      )
      SELECT doc_id, n_words,
        n_chars_words / n_words AS mean_word_len,
        CASE WHEN n2 > 0 THEN (n2 - d2) / n2 ELSE 0.0 END AS dup2_frac,
        CASE WHEN n3 > 0 THEN (n3 - d3) / n3 ELSE 0.0 END AS dup3_frac,
        CASE WHEN n2 > 0 THEN top2 / n2 ELSE 0.0 END AS top2_frac,
        (n_words >= 30 AND n_chars_words / n_words >= 3.0
          AND n_chars_words / n_words <= 6.0
          AND CASE WHEN n2 > 0 THEN (n2 - d2) / n2 ELSE 0.0 END <= 0.06
          AND CASE WHEN n3 > 0 THEN (n3 - d3) / n3 ELSE 0.0 END <= 0.02
          AND CASE WHEN n2 > 0 THEN top2 / n2 ELSE 0.0 END <= 0.08) AS pass_gopher
      FROM m"""))

  /** q154: per-source quantile normalization of the q116 surprisal score —
    * the calibration step before mixing quality-filtered sources: raw LM
    * scores are not comparable across domains (each source has its own
    * surprisal distribution), so each doc gets its within-source
    * percentile, making "keep the best 80% of every source" a single
    * global threshold. qnorm = PERCENT_RANK over (source; surprisal,
    * doc_id) — a tie-free total order, so the value is (rank−1)/(n−1),
    * integer-derived with one IEEE division, bit-identical cross-engine.
    *
    * Distributed shape: q116's one-pass scoring (its plan is reused
    * verbatim), one doc-keyed join for the source column, then one
    * source-partitioned window — partitions are per-source and the sort is
    * on the score only; at 100 TB replace the within-source sort by q113's
    * rank arithmetic if single sources outgrow a partition sort. */
  val quantileNorm: Q = Q(
    "q154_quantile_norm",
    (s, dir) => {
      val sc = bigramSurprisal.run(s, dir).select("doc_id", "surprisal")
      val src = Tables.documents(s, dir).select("doc_id", "source")
      sc.join(src, "doc_id")
        .withColumn("qnorm", percent_rank().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy("source").orderBy("surprisal", "doc_id")))
    },
    Some(s"""WITH sc AS (${bigramSurprisal.oracle.get})
      SELECT sc.doc_id, d.source, sc.surprisal,
             PERCENT_RANK() OVER (PARTITION BY d.source
               ORDER BY sc.surprisal, sc.doc_id) AS qnorm
      FROM sc JOIN documents d ON sc.doc_id = d.doc_id"""))

  private val kwicTerms = Seq("spark", "merge")
  private val kwicCtx = 3

  /** q162: keyword-in-context concordance — every occurrence of the query
    * terms with its ±3-token context window, the corpus-inspection view
    * behind "show me how this term is actually used" (and the
    * data-diligence tool for auditing what surrounds a contaminating
    * phrase). One scan: tokens explode WITH their source array retained,
    * so both context windows are row-local array slices — no self-join, no
    * window function, no second pass; the occurrence filter prunes before
    * any slicing. Emitted positions are 0-based token offsets; contexts
    * are exact string joins, truncated naturally at document edges. */
  val kwicConcordance: Q = Q(
    "q162_kwic",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), split(col("text"), " ").as("words"))
        .select(col("doc_id"), col("words"),
          posexplode(col("words")).as(Seq("pos", "term")))
        .filter(col("term").isin(kwicTerms: _*))
        .select(col("doc_id"), col("term"), col("pos").cast("long").as("pos"),
          array_join(expr(s"slice(words, greatest(pos - ${kwicCtx - 1}, 1), least(pos, $kwicCtx))"), " ")
            .as("left_ctx"),
          array_join(expr(s"slice(words, pos + 2, $kwicCtx)"), " ").as("right_ctx"))
    },
    Some(s"""WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
      ), p AS (
        SELECT doc_id, w, unnest(range(1, len(w)+1)) AS i FROM d
      )
      SELECT doc_id, w[i] AS term, CAST(i - 1 AS BIGINT) AS pos,
             COALESCE(array_to_string(w[greatest(i - $kwicCtx, 1) : i - 1], ' '), '') AS left_ctx,
             COALESCE(array_to_string(w[i + 1 : i + $kwicCtx], ' '), '') AS right_ctx
      FROM p WHERE w[i] IN (${kwicTerms.map(t => s"'$t'").mkString(", ")})"""))

  // ---- q204: per-source unigram divergence vs corpus -----------------------
  /** q204: how far each source's unigram word distribution sits from the
    * corpus-wide distribution — exact total variation plus Bhattacharyya /
    * Hellinger — the per-source "is this source linguistically weird"
    * signal a mixture designer reads next to q130/q203's length drift.
    * KL/perplexity is deliberately NOT used: ln() is not bit-stable across
    * engines (the q116/BM25 rule); TV and Hellinger carry the same ranking
    * with exact-integer and sqrt-only arithmetic.
    *
    * FP shape: TV is EXACT — Σ_{w∈src}|c_sw·N − c_w·n_s| is a
    * DECIMAL(38,0)/HUGEINT sum (BIGINT would wrap silently in Spark at
    * ~10^10 total tokens while DuckDB raises),
    * and the out-of-vocabulary mass Σ_{w∉src} c_w·n_s = (N − cov_s)·n_s
    * closes the sum without ever materializing the src×vocab complement;
    * one final division. The Bhattacharyya sum quantizes each
    * √(c_sw·c_w) term with FLOOR(·1000)→BIGINT (the q199 contract: sqrt
    * is correctly-rounded hence bit-identical, FLOOR has no tie) — exact
    * order-independent integer sum, one pinned division chain after.
    *
    * Distributed shape: one explode → (source, word) counts; corpus counts
    * roll up FROM the source counts (no second scan); one word-keyed join;
    * |sources| output rows. The scalar N broadcasts. */
  val sourceDivergence: Q = Q(
    "q204_source_divergence",
    (s, dir) => {
      val sw = Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
      val cw = sw.groupBy("w").agg(sum("c_sw").as("c_w"))
      val ns = sw.groupBy("source").agg(sum("c_sw").as("n_src"))
      val nTot = cw.agg(sum("c_w").as("n_tot"))
      val bc = col("bc_u").cast("double") / lit(1000.0) /
        sqrt(col("n_src").cast("double") * col("n_tot").cast("double"))
      sw.join(cw, "w")
        .join(broadcast(ns), "source")
        .crossJoin(broadcast(nTot))
        .groupBy("source", "n_src", "n_tot")
        .agg(count(lit(1)).as("vocab_src"),
          sum("c_w").as("cov"),
          // the cross-multiplied numerators in DECIMAL(38,0) (HUGEINT in
          // the oracle): in plain BIGINT, c_sw·N wraps silently in Spark
          // at ~10^10-10^11 total tokens while DuckDB raises — the q136/
          // q221 silent-wrap-vs-loud-raise divergence class (ADVICE r11).
          // FP-shape scale bound (ADVICE r12): the FINAL tv_in/bc_u →
          // double casts are correctly rounded in Spark (decimal→double)
          // but not in DuckDB (HUGEINT→double) once the integer exceeds
          // 2^53 — i.e. beyond ~10^16 summed cross-products the two
          // engines can differ in the last ulp of tv/bhattacharyya. Exact
          // at every tested sf (sums ≤ ~10^12 at sf1). The substitution if
          // that scale is ever oracled: divide in integer space first
          // (FLOOR(tv_in·10^9 / (2·n_src·n_tot)) — a quotient < 2^53 casts
          // exactly in both engines, the q240 technique).
          sum(abs(col("c_sw").cast("decimal(38,0)") * col("n_tot")
            - col("c_w").cast("decimal(38,0)") * col("n_src")))
            .as("tv_in"),
          sum(floor(sqrt((col("c_sw").cast("decimal(38,0)") * col("c_w"))
              .cast("double")) * 1000.0)
            .cast("decimal(38,0)")).as("bc_u"))
        .select(col("source"), col("n_src"), col("vocab_src"),
          ((col("tv_in") + (col("n_tot") - col("cov")).cast("decimal(38,0)")
              * col("n_src")).cast("double")
            / (lit(2.0) * col("n_src").cast("double") * col("n_tot").cast("double")))
            .as("tv"),
          bc.as("bhattacharyya"),
          sqrt(greatest(lit(1.0) - bc, lit(0.0))).as("hellinger"))
    },
    Some("""WITH sw AS (
        SELECT source, w, count(1) AS c_sw FROM (
          SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
        ) GROUP BY source, w
      ), cw AS (
        SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY w
      ), ns AS (
        SELECT source, CAST(SUM(c_sw) AS BIGINT) AS n_src FROM sw GROUP BY source
      ), nt AS (
        SELECT CAST(SUM(c_w) AS BIGINT) AS n_tot FROM cw
      ), per AS (
        SELECT sw.source, ns.n_src, nt.n_tot,
               count(1) AS vocab_src,
               CAST(SUM(cw.c_w) AS BIGINT) AS cov,
               SUM(ABS(CAST(sw.c_sw AS HUGEINT) * nt.n_tot
                 - CAST(cw.c_w AS HUGEINT) * ns.n_src)) AS tv_in,
               SUM(CAST(FLOOR(SQRT(CAST(CAST(sw.c_sw AS HUGEINT) * cw.c_w
                 AS DOUBLE)) * 1000.0) AS HUGEINT)) AS bc_u
        FROM sw JOIN cw ON sw.w = cw.w
        JOIN ns ON sw.source = ns.source
        CROSS JOIN nt
        GROUP BY 1, 2, 3
      )
      SELECT source, n_src, vocab_src,
             CAST(tv_in + CAST(n_tot - cov AS HUGEINT) * n_src AS DOUBLE)
               / (2.0 * CAST(n_src AS DOUBLE) * CAST(n_tot AS DOUBLE)) AS tv,
             CAST(bc_u AS DOUBLE) / 1000.0
               / SQRT(CAST(n_src AS DOUBLE) * CAST(n_tot AS DOUBLE))
               AS bhattacharyya,
             SQRT(GREATEST(1.0 - CAST(bc_u AS DOUBLE) / 1000.0
               / SQRT(CAST(n_src AS DOUBLE) * CAST(n_tot AS DOUBLE)), 0.0))
               AS hellinger
      FROM per"""))

  // ---- q205: language-ID confusion matrix ----------------------------------
  /** q205: the confusion matrix of q21's n-gram-heuristic language ID
    * against the declared `lang` column — per (declared, predicted) cell,
    * count plus the share of the declared language's documents — the
    * language-routing audit that decides whether the cheap classifier is
    * good enough to gate a per-language pipeline (and, off-diagonal, WHICH
    * confusions it makes). Reuses q21's scored frame verbatim, so the
    * matrix can never drift from the classifier it grades.
    *
    * Distributed shape: one (lang, predicted)-keyed count over q21's
    * per-row output, a broadcast per-lang total join; ≤|langs|² rows. */
  val langConfusion: Q = Q(
    "q205_lang_confusion",
    (s, dir) => {
      val p = textLangId.run(s, dir).select("lang", "predicted_lang")
      val cells = p.groupBy("lang", "predicted_lang").agg(count(lit(1)).as("n"))
      val totals = cells.groupBy("lang").agg(sum("n").as("n_lang"))
      cells.join(broadcast(totals), "lang")
        .select(col("lang"), col("predicted_lang"), col("n"), col("n_lang"),
          (col("n").cast("double") / col("n_lang").cast("double")).as("frac"),
          (col("lang") === col("predicted_lang")).as("is_diagonal"))
    },
    Some(s"""WITH p AS (${textLangId.oracle.get}),
      cells AS (
        SELECT lang, predicted_lang, count(1) AS n
        FROM p GROUP BY lang, predicted_lang
      ), totals AS (
        SELECT lang, CAST(SUM(n) AS BIGINT) AS n_lang FROM cells GROUP BY lang
      )
      SELECT c.lang, c.predicted_lang, c.n, t.n_lang,
             CAST(c.n AS DOUBLE) / CAST(t.n_lang AS DOUBLE) AS frac,
             c.lang = c.predicted_lang AS is_diagonal
      FROM cells c JOIN totals t ON c.lang = t.lang"""))

  // ---- q207: n-gram diversity (distinct-n) ---------------------------------
  /** q207: per-source distinct-n diversity for n = 1, 2, 3 — distinct
    * n-grams over total n-grams, the standard text-diversity ratio that
    * flags template-heavy or machine-generated sources (low distinct-2/3
    * with normal distinct-1 is the boilerplate signature; q41 scores the
    * same signal per document, this is the source-grain roll-up mixture
    * decisions act on). N-grams are md5-hashed before the distinct count,
    * so the shuffle carries 16-byte keys, never n-gram text.
    *
    * Distributed shape: one explode per n (the n=1 leg reuses the token
    * split), each a (source, hash)-keyed distinct + count — map-side
    * combined; 3·|sources| output rows. */
  val ngramDiversity: Q = Q(
    "q207_ngram_diversity",
    (s, dir) => {
      val words = Tables.documents(s, dir)
        .select(col("source"), split(col("text"), " ").as("ws"))
      def leg(n: Int): org.apache.spark.sql.DataFrame = {
        val grams =
          if (n == 1) words.select(col("source"), explode(col("ws")).as("g"))
          else words.filter(size(col("ws")) >= n)
            .select(col("source"), explode(expr(
              s"transform(sequence(0, size(ws) - $n), i -> array_join(slice(ws, i + 1, $n), ' '))"))
              .as("g"))
        grams.groupBy("source")
          .agg(count(lit(1)).as("n_total"),
            countDistinct(md5(col("g"))).as("n_distinct"))
          .select(lit(n.toLong).as("n"), col("source"), col("n_total"),
            col("n_distinct"),
            (col("n_distinct").cast("double") / col("n_total").cast("double"))
              .as("distinct_frac"))
      }
      leg(1).unionAll(leg(2)).unionAll(leg(3))
    },
    Some((1 to 3).map { n =>
      val grams =
        if (n == 1) "SELECT source, unnest(string_split(text, ' ')) AS g FROM documents"
        else s"""SELECT source, unnest(list_transform(
                   range(1, len(ws) - ${n - 2}),
                   i -> array_to_string(ws[i : i + ${n - 1}], ' '))) AS g
                 FROM (SELECT source, string_split(text, ' ') AS ws FROM documents
                       WHERE len(string_split(text, ' ')) >= $n)"""
      s"""SELECT CAST($n AS BIGINT) AS n, source, count(1) AS n_total,
            CAST(count(DISTINCT md5(g)) AS BIGINT) AS n_distinct,
            CAST(count(DISTINCT md5(g)) AS DOUBLE) / CAST(count(1) AS DOUBLE)
              AS distinct_frac
          FROM ($grams) GROUP BY source"""
    }.mkString("\nUNION ALL\n")))

  // ---- q226: code-vs-prose detection ---------------------------------------
  private val codeSymbols = "{}();=<>[]#&|"
  private val digitChars = "0123456789"

  /** q226: the cheap code-vs-prose router — per document, exact counts of
    * code-symbol chars (braces/semicolons/operators) and digit chars via
    * length-minus-translate (no regex engine in the hot path), flagged
    * `is_code` at ≥1.5% symbol density and `digit_heavy` at ≥20% digits;
    * rolled up per source. Code routed into a prose-tokenized mixture (or
    * vice versa) is a classic silent quality leak, and symbol density is
    * the standard first-pass router a pipeline runs before a real
    * classifier — this measures how much of each source it would divert.
    *
    * FP shape: counts are exact integers (translate deletes, length
    * subtracts — identical semantics in both engines); flags are integer
    * cross-multiplications (sym·1000 ≥ n·15, dig·100 ≥ n·20) with an n>0
    * guard; the two per-source fractions are one BIGINT/BIGINT division
    * each.
    *
    * Distributed shape: zero-shuffle per-row scoring, one source-keyed
    * rollup, |sources| rows out. */
  val codeDetect: Q = Q(
    "q226_code_detect",
    (s, dir) => {
      val n = length(col("text")).cast("long")
      val sym = (n - length(translate(col("text"), codeSymbols, ""))).cast("long")
      val dig = (n - length(translate(col("text"), digitChars, ""))).cast("long")
      val scoredDocs = Tables.documents(s, dir)
        .select(col("source"), n.as("n"), sym.as("sym"), dig.as("dig"))
        .withColumn("is_code", col("n") > 0 && col("sym") * 1000L >= col("n") * 15L)
        .withColumn("digit_heavy", col("n") > 0 && col("dig") * 100L >= col("n") * 20L)
      scoredDocs.groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("is_code"), 1L).otherwise(0L)).as("n_code"),
          sum(when(col("digit_heavy"), 1L).otherwise(0L)).as("n_digit_heavy"),
          sum("sym").as("sym_chars"), sum("dig").as("digit_chars"),
          sum("n").as("total_chars"))
        .withColumn("sym_frac",
          col("sym_chars").cast("double") / col("total_chars").cast("double"))
        .withColumn("digit_frac",
          col("digit_chars").cast("double") / col("total_chars").cast("double"))
    },
    Some(s"""WITH d AS (
        SELECT source, CAST(len(text) AS BIGINT) AS n,
               CAST(len(text) - len(translate(text, '$codeSymbols', '')) AS BIGINT)
                 AS sym,
               CAST(len(text) - len(translate(text, '$digitChars', '')) AS BIGINT)
                 AS dig
        FROM documents
      ), f AS (
        SELECT source, n, sym, dig,
               (n > 0 AND sym * 1000 >= n * 15) AS is_code,
               (n > 0 AND dig * 100 >= n * 20) AS digit_heavy
        FROM d
      )
      SELECT source, CAST(count(1) AS BIGINT) AS n_docs,
             CAST(SUM(CASE WHEN is_code THEN 1 ELSE 0 END) AS BIGINT) AS n_code,
             CAST(SUM(CASE WHEN digit_heavy THEN 1 ELSE 0 END) AS BIGINT)
               AS n_digit_heavy,
             CAST(SUM(sym) AS BIGINT) AS sym_chars,
             CAST(SUM(dig) AS BIGINT) AS digit_chars,
             CAST(SUM(n) AS BIGINT) AS total_chars,
             CAST(SUM(sym) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS sym_frac,
             CAST(SUM(dig) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS digit_frac
      FROM f GROUP BY source"""))

  // ---- q234: hapax / lexical-richness profile ------------------------------
  /** q234: the lexical long tail per source — token mass, distinct types,
    * words occurring exactly once WITHIN the source (source hapax: the
    * classic richness signal), and words occurring exactly once in the
    * WHOLE corpus (corpus hapax — necessarily exclusive to this source:
    * typos, OCR junk and genuinely rare vocabulary a tokenizer must carry
    * in its tail). A source whose hapax share collapses after dedup was
    * template mass; one whose corpus-hapax share spikes is noise. Reads
    * next to q204's divergence and q207's distinct-n diversity.
    *
    * FP shape: exact integers; two BIGINT/BIGINT divisions per row.
    *
    * Distributed shape: one explode → (source, word) counts; corpus
    * counts roll up FROM the source counts (no second scan, the q204
    * pattern); one word-keyed join; |sources| rows out. */
  val hapaxProfile: Q = Q(
    "q234_hapax_profile",
    (s, dir) => {
      val sw = Tables.documents(s, dir)
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .groupBy("source", "w").agg(count(lit(1)).as("c_sw"))
      val cw = sw.groupBy("w").agg(sum("c_sw").as("c_w"))
      sw.join(cw, "w")
        .groupBy("source")
        .agg(sum("c_sw").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when(col("c_sw") === 1L, 1L).otherwise(0L)).as("n_source_hapax"),
          sum(when(col("c_w") === 1L, 1L).otherwise(0L)).as("n_corpus_hapax"))
        .withColumn("source_hapax_type_frac",
          col("n_source_hapax").cast("double") / col("n_types").cast("double"))
        .withColumn("corpus_hapax_type_frac",
          col("n_corpus_hapax").cast("double") / col("n_types").cast("double"))
    },
    Some("""WITH sw AS (
        SELECT source, w, count(1) AS c_sw FROM (
          SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
        ) GROUP BY source, w
      ), cw AS (
        SELECT w, CAST(SUM(c_sw) AS BIGINT) AS c_w FROM sw GROUP BY w
      )
      SELECT sw.source,
             CAST(SUM(sw.c_sw) AS BIGINT) AS n_tokens,
             CAST(count(1) AS BIGINT) AS n_types,
             CAST(SUM(CASE WHEN sw.c_sw = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_source_hapax,
             CAST(SUM(CASE WHEN cw.c_w = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_corpus_hapax,
             CAST(SUM(CASE WHEN sw.c_sw = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(1) AS DOUBLE) AS source_hapax_type_frac,
             CAST(SUM(CASE WHEN cw.c_w = 1 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(1) AS DOUBLE) AS corpus_hapax_type_frac
      FROM sw JOIN cw ON sw.w = cw.w
      GROUP BY sw.source"""))

  // ---- q255: bigram collocation mining by lift -----------------------------
  private val collocMinSupport = 5L
  private val collocTopK = 50

  /** q255: the corpus's top bigram COLLOCATIONS — word pairs that co-occur
    * far above chance — ranked by lift p(w1w2)/(p(w1)·p(w2)) with a support
    * floor. This is the phrase-discovery pass that feeds tokenizer vocab
    * decisions (multi-word units worth single tokens) and q114's phrase
    * dictionary; q54 ranks n-grams by raw count (frequency ≠ association —
    * "of the" tops counts, named entities top lift). Lift is a monotone
    * transform of PMI, so it ranks identically while needing NO ln() —
    * the q116 log-free discipline.
    *
    * FP shape: all counts exact BIGINTs far under 2^53, so every cast is
    * value-exact; lift is the fixed five-op IEEE chain
    * (c2/Nb) / ((c1a/Nu)·(c1b/Nu)) written identically in both engines —
    * correctly-rounded ops in the same order are bit-identical.
    *
    * Distributed shape: one token explode (shared shape with q116: doc-
    * partitioned lead() for bigrams, two map-side-combined count
    * aggregates); scoring joins each support-floored bigram to the two
    * unigram counts (token-keyed shuffles); the two 1-row totals broadcast
    * (the q104 scalar pattern). The top-k is orderBy+limit — Spark's
    * distributed TakeOrdered, never a single-task global sort — and only
    * the 50 survivors see a row_number. */
  val collocationLift: Q = Q(
    "q255_collocation_lift",
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w1")))
      val bigrams = toks
        .withColumn("w2", lead("w1", 1).over(
          Window.partitionBy("doc_id").orderBy("pos")))
        .filter(col("w2").isNotNull)
      val uni = toks.groupBy("w1").agg(count(lit(1)).as("c1"))
      val bi = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
        .filter(col("c2") >= collocMinSupport)
      val nu = toks.agg(count(lit(1)).as("nu"))
      val nb = bigrams.agg(count(lit(1)).as("nb"))
      val lift = (col("c2").cast("double") / col("nb").cast("double")) /
        ((col("c1a").cast("double") / col("nu").cast("double"))
          * (col("c1b").cast("double") / col("nu").cast("double")))
      val top = bi
        .join(uni.select(col("w1"), col("c1").as("c1a")), Seq("w1"))
        .join(uni.select(col("w1").as("w2"), col("c1").as("c1b")), Seq("w2"))
        .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
        .select(col("w1"), col("w2"), col("c2"), col("c1a"), col("c1b"),
          lift.as("lift"))
        .orderBy(col("lift").desc, col("w1").asc, col("w2").asc)
        .limit(collocTopK)
      top.withColumn("rank", row_number().over(
          Window.orderBy(col("lift").desc, col("w1").asc, col("w2").asc)))
        .select("rank", "w1", "w2", "c2", "c1a", "c1b", "lift")
    },
    Some(s"""WITH toks AS (
        SELECT doc_id, i AS pos, w[i] AS w1, w[i + 1] AS w2
        FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
             unnest(generate_series(1, len(w))) AS t(i)
      ), uni AS (
        SELECT w1, CAST(count(1) AS BIGINT) AS c1 FROM toks GROUP BY w1
      ), bi AS (
        SELECT w1, w2, CAST(count(1) AS BIGINT) AS c2 FROM toks
        WHERE w2 IS NOT NULL GROUP BY w1, w2
        HAVING count(1) >= $collocMinSupport
      ), nu AS (
        SELECT CAST(count(1) AS BIGINT) AS nu FROM toks
      ), nb AS (
        SELECT CAST(count(1) AS BIGINT) AS nb FROM toks WHERE w2 IS NOT NULL
      ), scored AS (
        SELECT bi.w1, bi.w2, bi.c2, ua.c1 AS c1a, ub.c1 AS c1b,
               (CAST(bi.c2 AS DOUBLE) / CAST(nb.nb AS DOUBLE))
                 / ((CAST(ua.c1 AS DOUBLE) / CAST(nu.nu AS DOUBLE))
                    * (CAST(ub.c1 AS DOUBLE) / CAST(nu.nu AS DOUBLE))) AS lift
        FROM bi
        JOIN uni ua ON bi.w1 = ua.w1
        JOIN uni ub ON bi.w2 = ub.w1
        CROSS JOIN nu CROSS JOIN nb
        ORDER BY lift DESC, bi.w1 ASC, bi.w2 ASC
        LIMIT $collocTopK
      )
      SELECT CAST(row_number() OVER (ORDER BY lift DESC, w1 ASC, w2 ASC)
               AS BIGINT) AS rank,
             w1, w2, c2, c1a, c1b, lift
      FROM scored"""))

  // ---- q267: held-out n-gram LM perplexity filter (VERDICT r15 #4) ---------
  /** Stupid-backoff discount as an exact rational: 1/α with α = 0.4 → ×2.5,
    * a value every binary double represents exactly. */
  private val sbInvAlpha = 2.5

  /** q267 admission gate: mean inverse transition probability ≤ this.
    * Measured fluent-corpus maxima: 184 / 277 / 488 at sf0.001/0.01/0.1
    * (the max tracks the rarest in-corpus transition, so it grows slowly
    * with corpus size); gibberish/shuffled docs land at the backoff/OOV
    * ceilings — 2.5·T/c1 to 2.5·(T+V), thousands to millions (spec-pinned
    * with a planted fixture). The gate sits between the modes with ~4×
    * headroom on the fluent side at tested sfs. */
  private val lmPassMax = 2000.0

  /** q267: the per-document LM QUALITY FILTER (the CCNet/KenLM perplexity
    * gate every production corpus pipeline runs) with a HELD-OUT language
    * model: the corpus is split into two folds by doc_id parity and each
    * document is scored against the bigram model counted from the OTHER
    * fold — no self-scoring leak (q116 trains on the full corpus including
    * the scored doc; this is the held-out form the filter literature
    * actually uses). Smoothing is STUPID BACKOFF (Brants et al., EMNLP
    * 2007): per bigram occurrence (w1 → w2), the inverse-probability score
    *
    *   r = c1(w1) / c2(w1, w2)                 if the LM fold saw the bigram
    *     = 2.5 · T / c1(w2)                    else, if it saw the word w2
    *     = 2.5 · (T + V)                       else (OOV ceiling)
    *
    * with c1/c2/T/V counted on the LM fold only and 1/α = 2.5 exact. The
    * document score is the MEAN of the per-bigram r — the same monotone
    * perplexity proxy as q116, deliberately log-free: every r is a quotient
    * of exact integers (correctly-rounded IEEE division in both engines,
    * both operands ≤ 2^53) rounded to 6 decimals, doc sums re-rounded (the
    * Pipelines round-sum rule), while ln() differs across engines in the
    * last ulp. High score = surprising transitions under the held-out LM =
    * gibberish/shuffled/out-of-domain; the pass flag gates at the fixed
    * threshold. Composes with q142's Gopher rules and q237's DSIR exactly
    * like the production stack (perplexity gate → rule battery → mixture).
    *
    * Distributed shape: bigram pairs come from a per-row array transform
    * (one explode, NO per-doc window — cheaper than q116's lead()); LM
    * counts are two map-side-combined aggregations keyed by (fold, token);
    * scoring is token-keyed joins of the occurrence stream against those
    * count tables (left joins — misses ARE the backoff path); T/V are a
    * 2-row fold dimension, broadcast. Nothing data-sized is broadcast or
    * collected; every stage is corpus-partitioned. */
  private[graft] def lmPerplexityOf(docs0: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
      val docs = docs0
        .select(col("doc_id"), pmod(col("doc_id"), lit(2)).as("fold"),
          split(col("text"), " ").as("words"))
      val toks = docs.select(col("doc_id"), col("fold"),
        explode(col("words")).as("w"))
      val bigrams = docs.filter(size(col("words")) >= 2)
        .select(col("doc_id"), col("fold"), explode(expr(
          "transform(sequence(0, size(words)-2), " +
            "i -> named_struct('w1', words[i], 'w2', words[i+1]))")).as("bg"))
        .select(col("doc_id"), col("fold"), col("bg.w1"), col("bg.w2"))
      val uni = toks.groupBy("fold", "w").agg(count(lit(1)).as("c1"))
      val bi = bigrams.groupBy("fold", "w1", "w2").agg(count(lit(1)).as("c2"))
      // per-fold totals: T = token count, V = vocabulary size (2 rows)
      val tot = uni.groupBy("fold")
        .agg(sum("c1").as("t"), count(lit(1)).as("v"))
      val scored = bigrams
        .withColumn("lm", lit(1L) - col("fold")) // the OTHER fold is the LM
        .join(bi.select(col("fold").as("lm"), col("w1"), col("w2"), col("c2")),
          Seq("lm", "w1", "w2"), "left")
        .join(uni.select(col("fold").as("lm"), col("w").as("w1"),
          col("c1").as("c1w1")),
          Seq("lm", "w1"), "left")
        .join(uni.select(col("fold").as("lm"), col("w").as("w2"),
          col("c1").as("c1w2")),
          Seq("lm", "w2"), "left")
        .join(broadcast(tot.withColumnRenamed("fold", "lm")), Seq("lm"))
        .withColumn("r",
          when(col("c2").isNotNull, round(col("c1w1") / col("c2"), 6))
            .when(col("c1w2").isNotNull,
              round(lit(sbInvAlpha) * col("t") / col("c1w2"), 6))
            .otherwise(round(lit(sbInvAlpha) * (col("t") + col("v")), 6)))
      scored.groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"),
          sum(col("c2").isNotNull.cast("long")).as("n_hit"),
          sum((col("c2").isNull && col("c1w2").isNotNull).cast("long"))
            .as("n_backoff"),
          (round(sum("r"), 6) / count(lit(1))).as("ppl_proxy"))
        .withColumn("pass_lm", col("ppl_proxy") <= lmPassMax)
  }

  /** q267's scored-bigram CTE chain (`d` … `scored`), shared verbatim with
    * q270's oracle so both replay the identical held-out-LM arithmetic. */
  private val lmScoredCtesSql: String = s"""d AS (
        SELECT doc_id, doc_id % 2 AS fold, string_split(text, ' ') AS words
        FROM documents
      ), toks AS (
        SELECT doc_id, fold, unnest(words) AS w FROM d
      ), bg AS (
        SELECT doc_id, fold, words[i] AS w1, words[i + 1] AS w2
        FROM d, unnest(generate_series(1, len(words) - 1)) AS t(i)
        WHERE len(words) >= 2
      ), uni AS (
        SELECT fold, w, CAST(count(1) AS BIGINT) AS c1 FROM toks GROUP BY fold, w
      ), bi AS (
        SELECT fold, w1, w2, CAST(count(1) AS BIGINT) AS c2
        FROM bg GROUP BY fold, w1, w2
      ), tot AS (
        SELECT fold, CAST(SUM(c1) AS BIGINT) AS t, CAST(count(1) AS BIGINT) AS v
        FROM uni GROUP BY fold
      ), scored AS (
        SELECT b.doc_id,
               bi.c2, ua.c1 AS c1w1, ub.c1 AS c1w2,
               CASE
                 WHEN bi.c2 IS NOT NULL THEN
                   ROUND(CAST(ua.c1 AS DOUBLE) / bi.c2, 6)
                 WHEN ub.c1 IS NOT NULL THEN
                   ROUND($sbInvAlpha * tot.t / ub.c1, 6)
                 ELSE ROUND($sbInvAlpha * (tot.t + tot.v), 6)
               END AS r
        FROM bg b
        LEFT JOIN bi ON bi.fold = 1 - b.fold AND bi.w1 = b.w1 AND bi.w2 = b.w2
        LEFT JOIN uni ua ON ua.fold = 1 - b.fold AND ua.w = b.w1
        LEFT JOIN uni ub ON ub.fold = 1 - b.fold AND ub.w = b.w2
        JOIN tot ON tot.fold = 1 - b.fold
      )"""

  val lmPerplexity: Q = Q(
    "q267_lm_perplexity",
    (s, dir) => lmPerplexityOf(
      Tables.documents(s, dir).select(col("doc_id"), col("text"))),
    Some(s"""WITH $lmScoredCtesSql
      SELECT doc_id, CAST(count(1) AS BIGINT) AS n_bigrams,
             CAST(SUM(CASE WHEN c2 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
             CAST(SUM(CASE WHEN c2 IS NULL AND c1w2 IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_backoff,
             ROUND(SUM(r), 6) / count(1) AS ppl_proxy,
             ROUND(SUM(r), 6) / count(1) <= $lmPassMax AS pass_lm
      FROM scored GROUP BY doc_id"""))

  // ---- q270: DoReMi-style domain reweighting from held-out LM excess -------
  /** Uniform-mixture share of the q270 weight: the final mixture is
    * (1 − α)·uniform + α·(excess/Σexcess) with α = [[drAlphaPpm]]/10^6 —
    * DoReMi's trust-region mix that keeps every domain sampled. */
  private[graft] val drAlphaPpm = 500000L

  /** Deterministic clamp on the per-doc score before ppm scaling: keeps
    * floor(score·10^6) < 2^53 (double-exact integer range) even for
    * ceiling-dominated docs in extreme corpora, where q267's OOV ceiling
    * 2.5·(T+V) can exceed 10^10. Never binds at tested sfs (measured
    * corpus max 488 at sf0.1; even the planted-gibberish ceiling is ~10^7)
    * — spec-pinned, same idiom as the q117/q238 caps. */
  private[graft] val drClampMax = 2.0e9

  /** q270: DOMAIN REWEIGHTING from measured LM signal — the DoReMi-family
    * (Xie et al., 2023) data-mixture step that turns q267's held-out
    * perplexity scores into per-source sampling weights: domains whose
    * mean score EXCEEDS the corpus baseline (harder / more surprising
    * under the held-out LM — DoReMi's excess-loss signal) get
    * proportionally more of the α mass, mixed with a uniform floor so no
    * domain starves. Completes the mixture toolbox: q52/q232 SAMPLE given
    * weights, q237 selects by importance ratio — this COMPUTES the weights.
    *
    * Exactness: per-doc scores enter as floor(score·10^6) BIGINTs (the
    * q217 ppm idiom — double→integer once, then every mean/baseline/
    * excess/weight is integer arithmetic: `div` here ≡ `//` in DuckDB on
    * the non-negative operands), with per-source sums carried in
    * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) so no intermediate can wrap
    * at any corpus size (the q259/q253 overflow lesson applied at design
    * time). Weights are ppm integers; Σ weights ≤ 10^6 with the deficit
    * < n_sources + 1 from floor rounding — deterministic in both engines.
    *
    * Distributed shape: per-doc scoring is q267's corpus-partitioned plan
    * verbatim; everything after it is one map-side-combined groupBy on
    * `source` plus source-count-sized (≤ dimension) broadcast scalars —
    * zero additional data-sized shuffles, nothing fact-proportional on
    * the driver. */
  private[graft] def domainReweightOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val perDoc = lmPerplexityOf(docs.select("doc_id", "text"))
      .select(col("doc_id"),
        floor(least(col("ppl_proxy"), lit(drClampMax)) * 1000000.0)
          .cast("long").as("ppl_ppm"))
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
    val bySrc = perDoc.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ppl_ppm").cast("decimal(28,0)")).as("sum_ppm"))
      .withColumn("mean_ppl_ppm", expr("CAST(sum_ppm div n_docs AS BIGINT)"))
    val base = bySrc
      .agg(sum(col("sum_ppm")).as("ts"), sum(col("n_docs")).as("tn"),
        count(lit(1)).as("n_sources"))
      .select(expr("CAST(ts div tn AS BIGINT)").as("baseline_ppm"),
        col("n_sources"))
    val ex = bySrc.crossJoin(broadcast(base))
      .withColumn("excess_ppm",
        greatest(col("mean_ppl_ppm") - col("baseline_ppm"), lit(0L)))
    val tot = ex.agg(sum(col("excess_ppm").cast("decimal(28,0)"))
      .as("sum_excess"))
    ex.crossJoin(broadcast(tot))
      .withColumn("weight_ppm",
        expr(s"CAST((${1000000L - drAlphaPpm} div n_sources) + " +
          s"CASE WHEN sum_excess > 0 THEN CAST(($drAlphaPpm * " +
          "CAST(excess_ppm AS DECIMAL(28,0))) div sum_excess AS BIGINT) " +
          s"ELSE $drAlphaPpm div n_sources END AS BIGINT)"))
      .select("source", "n_docs", "mean_ppl_ppm", "baseline_ppm",
        "excess_ppm", "weight_ppm")
  }

  val domainReweight: Q = Q(
    "q270_domain_reweight",
    (s, dir) => domainReweightOf(
      Tables.documents(s, dir).select("doc_id", "source", "text")),
    Some(s"""WITH $lmScoredCtesSql, per_doc AS (
        SELECT doc_id,
               CAST(FLOOR(LEAST(ROUND(SUM(r), 6) / count(1), 2000000000.0)
                 * 1000000.0) AS BIGINT) AS ppl_ppm
        FROM scored GROUP BY doc_id
      ), src AS (
        SELECT d.source, CAST(count(1) AS BIGINT) AS n_docs,
               SUM(CAST(p.ppl_ppm AS HUGEINT)) AS sum_ppm
        FROM per_doc p JOIN documents d USING (doc_id) GROUP BY d.source
      ), base AS (
        SELECT SUM(sum_ppm) // SUM(n_docs) AS baseline_ppm,
               CAST(count(1) AS BIGINT) AS n_sources
        FROM src
      ), ex AS (
        SELECT s.source, s.n_docs,
               CAST(s.sum_ppm // s.n_docs AS BIGINT) AS mean_ppl_ppm,
               CAST(b.baseline_ppm AS BIGINT) AS baseline_ppm, b.n_sources,
               GREATEST(CAST(s.sum_ppm // s.n_docs AS BIGINT)
                 - CAST(b.baseline_ppm AS BIGINT), 0) AS excess_ppm
        FROM src s CROSS JOIN base b
      ), exc_tot AS (
        SELECT SUM(CAST(excess_ppm AS HUGEINT)) AS sum_excess FROM ex
      )
      SELECT e.source, e.n_docs, e.mean_ppl_ppm, e.baseline_ppm,
             CAST(e.excess_ppm AS BIGINT) AS excess_ppm,
             CAST((${1000000L - drAlphaPpm} // e.n_sources) +
                  CASE WHEN t.sum_excess > 0
                       THEN (CAST($drAlphaPpm AS HUGEINT) * e.excess_ppm)
                            // t.sum_excess
                       ELSE $drAlphaPpm // e.n_sources END
               AS BIGINT) AS weight_ppm
      FROM ex e CROSS JOIN exc_tot t"""))

  val all: Seq[Q] = Seq(textQuality, textLangId, tokenCount, docFingerprint,
    repetitionScore, lengthOutliers, robustOutliers, phraseSearch,
    bigramSurprisal, gopherRules, quantileNorm, kwicConcordance,
    sourceDivergence, langConfusion, ngramDiversity, codeDetect, hapaxProfile,
    collocationLift, lmPerplexity, domainReweight)
}
