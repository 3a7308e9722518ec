package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{concat, lit, md5, substring}

/** The engine-portable uniform-draw idiom used by the sampling/split/sketch
  * operators (q52 mixture sample, q69 cluster split, q78 count-min buckets):
  * the first `len` lowercase-hex chars of md5 over the '|'-joined parts.
  *
  * Why it is portable: Spark and DuckDB produce the identical md5 hex string
  * for the identical input string, and on lowercase hex the lexicographic
  * order IS the numeric order of the uniform bits — so threshold compares
  * ("draw < 'cccccccc'" ⇔ draw < 0.8) and bucket-equality joins behave
  * identically in both engines with no hex→int conversion (which DuckDB 1.0
  * lacks). Both builders emit null-PROPAGATING concatenation (Spark `concat`
  * == DuckDB `||`), so a null part yields a null draw in BOTH engines —
  * using concat_ws on one side would silently skip the null and diverge.
  *
  * Keeping the Column form and the oracle SQL fragment in one place locks
  * the two engine-side expressions together — that textual agreement is the
  * correctness contract of every operator built on this draw.
  */
object Md5Draw {

  /** Spark side: substring(md5(p1 || '|' || p2 ...), 1, len). */
  def draw(len: Int, parts: Column*): Column = {
    val joined = parts.map(_.cast("string"))
      .flatMap(p => Seq(p, lit("|"))).dropRight(1)
    substring(md5(concat(joined: _*)), 1, len)
  }

  /** Oracle side: the same draw as a DuckDB SQL fragment over SQL
    * expressions (literals must be passed pre-quoted, e.g. "'mix'"). */
  def drawSql(len: Int, parts: String*): String =
    s"substr(md5(${parts.map(p => s"CAST($p AS VARCHAR)").mkString(" || '|' || ")}), 1, $len)"
}
