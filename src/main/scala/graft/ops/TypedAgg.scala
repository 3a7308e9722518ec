package graft.ops

import java.math.RoundingMode

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Typed Dataset API surface: case-class Encoders + a custom
  * `Aggregator[IN, BUF, OUT]` through `groupByKey.agg` — the compile-time-safe
  * alternative to untyped groupBy for domain aggregation logic. The finish
  * step rounds with BigDecimal HALF_UP, matching Spark's `round` and therefore
  * the DuckDB oracle (same small-group FP rules as q11).
  */
object TypedAgg {

  final case class Line(
      l_suppkey: Long,
      l_returnflag: String,
      l_quantity: Double,
      l_extendedprice: Double)

  final case class Stats(n_lines: Long, total_qty: Double, total_price: Double)

  private def round2(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(2, RoundingMode.HALF_UP).doubleValue()

  object StatsAgg extends Aggregator[Line, Stats, Stats] {
    override def zero: Stats = Stats(0L, 0.0, 0.0)
    override def reduce(b: Stats, l: Line): Stats =
      Stats(b.n_lines + 1, b.total_qty + l.l_quantity, b.total_price + l.l_extendedprice)
    override def merge(x: Stats, y: Stats): Stats =
      Stats(x.n_lines + y.n_lines, x.total_qty + y.total_qty, x.total_price + y.total_price)
    override def finish(r: Stats): Stats =
      Stats(r.n_lines, round2(r.total_qty), round2(r.total_price))
    override def bufferEncoder: Encoder[Stats] = Encoders.product[Stats]
    override def outputEncoder: Encoder[Stats] = Encoders.product[Stats]
  }

  val typedAgg: Q = Q(
    "q42_typed_agg",
    (s, dir) => {
      import s.implicits._
      Tables.lineitem(s, dir)
        .select(col("l_suppkey"), col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        .as[Line]
        .groupByKey(_.l_suppkey)
        .agg(StatsAgg.toColumn.name("stats"))
        .select(col("key").as("l_suppkey"),
          col("stats.n_lines").as("n_lines"),
          col("stats.total_qty").as("total_qty"),
          col("stats.total_price").as("total_price"))
    },
    Some("""SELECT l_suppkey, COUNT(1) AS n_lines,
      ROUND(SUM(l_quantity), 2) AS total_qty,
      ROUND(SUM(l_extendedprice), 2) AS total_price
      FROM lineitem GROUP BY l_suppkey"""))

  val all: Seq[Q] = Seq(typedAgg)
}
