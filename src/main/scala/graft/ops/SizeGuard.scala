package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Size guard for CORPUS-DERIVED key-set broadcasts (VERDICT r17 "what's
  * wrong" #2): the decontamination family (q51/q215/q231/q286/q289) joins
  * the training corpus against the eval slice's distinct shingle/gram set.
  * That eval slice is MODELED as `doc_id % 20 == 0` — 5% of the corpus,
  * PROPORTIONAL to it, not constant — so an unconditional `broadcast()`
  * hint is a latent driver/executor OOM at the 100 TB north star (a 5%
  * slice's distinct gram set is terabytes). The guard probes the key set
  * with a limit-bounded count and attaches the broadcast hint only below
  * [[defaultMaxKeyRows]]; above it the hint is withheld and Catalyst plans
  * a shuffled semi/inner join on the key — same answer by construction, no
  * driver-side materialization. Both paths are driven to identical output
  * by R18OpsSpec (the forced-shuffle leg also disables
  * `spark.sql.autoBroadcastJoinThreshold`, since at test scale the
  * auto-threshold would otherwise re-broadcast the tiny set on its own).
  */
object SizeGuard {

  /** Runtime-conf override for the row cap; `"0"` forces the shuffle path
    * unconditionally — the spec's lever, and an operator's at real scale
    * (e.g. a known-huge eval registry). */
  val confKey = "graft.broadcast.maxKeyRows"

  /** Default cap on broadcast key-set rows: 4M rows of ≤~50-byte
    * shingle/gram keys ≈ 200 MB serialized — inside a standard executor
    * broadcast budget (and far inside local[32]'s 128 GiB); past it a
    * shuffled join is the only safe plan. The cap is in ROWS, not bytes,
    * because the decision must be deterministic across engines and
    * geometries — byte sizes depend on compression and partition layout. */
  val defaultMaxKeyRows = 4000000L

  /** `keys` with a broadcast hint iff a limit-bounded count proves the set
    * small: `limit(max+1).count()` stops producing rows past the
    * threshold, so the probe's cost is one evaluation of the key-set
    * sub-plan (which the subsequent join re-evaluates — the price of a
    * deterministic plan choice; the sub-plans in this family sit on
    * PlanCache-warm projections). The hint rides the returned frame, so a
    * caller joining it twice (q215) probes once. */
  def keySide(keys: DataFrame): DataFrame = {
    val max = keys.sparkSession.conf.getOption(confKey)
      .map(_.toLong).getOrElse(defaultMaxKeyRows)
    if (max > 0 &&
        keys.limit(math.min(max + 1L, Int.MaxValue.toLong).toInt).count() <= max)
      broadcast(keys)
    else keys
  }
}
