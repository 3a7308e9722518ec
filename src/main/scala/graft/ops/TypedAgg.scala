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

  final case class Order(o_custkey: Long, o_orderkey: Long, o_totalprice: Double)
  final case class TopItem(o_totalprice: Double, o_orderkey: Long)
  final case class TopBuf(items: List[TopItem])

  /** Bounded top-k buffer: the per-group state is never more than k rows, and
    * partial aggregation runs map-side — each input partition contributes at
    * most k candidates per key to the shuffle. The window formulation
    * (row_number ≤ k) must instead shuffle EVERY row of a group and sort it;
    * at 100 TB with large groups the aggregator moves k/|group| of the data.
    * Selection only (no arithmetic) → outputs are bit-exact pass-throughs. */
  object TopKAgg extends Aggregator[Order, TopBuf, TopBuf] {
    val k = 3
    private def trim(xs: List[TopItem]): List[TopItem] =
      xs.sortBy(t => (-t.o_totalprice, t.o_orderkey)).take(k)
    override def zero: TopBuf = TopBuf(Nil)
    override def reduce(b: TopBuf, o: Order): TopBuf =
      TopBuf(trim(TopItem(o.o_totalprice, o.o_orderkey) :: b.items))
    override def merge(x: TopBuf, y: TopBuf): TopBuf = TopBuf(trim(x.items ++ y.items))
    override def finish(r: TopBuf): TopBuf = TopBuf(trim(r.items))
    override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
  }

  /** Top-3 orders per customer by total price, via the bounded typed
    * aggregator rather than a window — same result as the row_number plan
    * (asserted in tests, plus the DuckDB window oracle), different shuffle
    * volume. Ties broken by order key, so the selection is total-ordered and
    * deterministic. */
  val topKPerGroup: Q = Q(
    "q58_topk_per_group",
    (s, dir) => {
      import s.implicits._
      Tables.orders(s, dir)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .as[Order]
        .groupByKey(_.o_custkey)
        .agg(TopKAgg.toColumn.name("top"))
        .select(col("key").as("o_custkey"), posexplode(col("top.items")))
        .select(col("o_custkey"), (col("pos") + 1).cast("long").as("rank"),
          col("col.o_orderkey").as("o_orderkey"),
          col("col.o_totalprice").as("o_totalprice"))
    },
    Some("""SELECT o_custkey, CAST(rn AS BIGINT) AS rank, o_orderkey, o_totalprice
      FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                 ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders)
      WHERE rn <= 3"""))

  val all: Seq[Q] = Seq(typedAgg, topKPerGroup)
}
