package graft

import org.scalatest.funsuite.AnyFunSuite

/** Schema canary for the WHOLE driver-provided table set.
  *
  * The driver regenerates /root/testdata between rounds under unchanged
  * paths, and has already changed a physical layout once (events.ts,
  * the r8 outage). This test pins what Spark currently sees for every
  * table so the NEXT drift — any table, any column — fails here with a
  * readable diff instead of as dozens of downstream analysis errors or,
  * worse, silently changed semantics. An intentional layout change must
  * re-pin AND adapt the readers/oracles (see Tables.normalizeTs for the
  * events.ts precedent).
  */
class TablesSpec extends AnyFunSuite {
  import SparkTestSession._

  private val expected: Map[String, Seq[(String, String)]] = Map(
    "region" -> Seq("r_regionkey" -> "int", "r_name" -> "string"),
    "nation" -> Seq("n_nationkey" -> "int", "n_name" -> "string",
      "n_regionkey" -> "int"),
    "customer" -> Seq("c_custkey" -> "bigint", "c_name" -> "string",
      "c_nationkey" -> "int", "c_acctbal" -> "double",
      "c_mktsegment" -> "string"),
    "supplier" -> Seq("s_suppkey" -> "bigint", "s_name" -> "string",
      "s_nationkey" -> "int", "s_acctbal" -> "double"),
    "part" -> Seq("p_partkey" -> "bigint", "p_name" -> "string",
      "p_brand" -> "string", "p_type" -> "string", "p_size" -> "int",
      "p_retailprice" -> "double"),
    "orders" -> Seq("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
      "o_orderstatus" -> "string", "o_totalprice" -> "double",
      "o_orderdate" -> "timestamp_ntz", "o_orderpriority" -> "string"),
    "lineitem" -> Seq("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
      "l_suppkey" -> "bigint", "l_linenumber" -> "int",
      "l_quantity" -> "double", "l_extendedprice" -> "double",
      "l_discount" -> "double", "l_tax" -> "double",
      "l_returnflag" -> "string", "l_linestatus" -> "string",
      "l_shipdate" -> "timestamp_ntz"),
    // ts is normalized by Tables.events — consumers see TimestampType
    // regardless of the physical layout (the dedicated contract test in
    // EventOpsSpec covers the raw-footer side)
    "events" -> Seq("event_id" -> "bigint", "ts" -> "timestamp",
      "user_id" -> "bigint", "event_type" -> "string",
      "value" -> "double", "props" -> "string"),
    "documents" -> Seq("doc_id" -> "bigint", "text" -> "string",
      "lang" -> "string", "source" -> "string", "n_chars" -> "bigint"),
    "embeddings" -> Seq("vec_id" -> "bigint",
      "embedding" -> "array<float>", "label" -> "int"))

  test("driver testdata schemas match the pinned layout snapshot") {
    val loaders: Map[String, () => org.apache.spark.sql.DataFrame] = Map(
      "region" -> (() => Tables.region(spark, sfDir)),
      "nation" -> (() => Tables.nation(spark, sfDir)),
      "customer" -> (() => Tables.customer(spark, sfDir)),
      "supplier" -> (() => Tables.supplier(spark, sfDir)),
      "part" -> (() => Tables.part(spark, sfDir)),
      "orders" -> (() => Tables.orders(spark, sfDir)),
      "lineitem" -> (() => Tables.lineitem(spark, sfDir)),
      "events" -> (() => Tables.events(spark, sfDir)),
      "documents" -> (() => Tables.documents(spark, sfDir)),
      "embeddings" -> (() => Tables.embeddings(spark, sfDir)))
    val diffs = expected.toSeq.sortBy(_._1).flatMap { case (t, want) =>
      val got = loaders(t)().schema.fields.toSeq
        .map(f => f.name -> f.dataType.simpleString)
      if (got == want) None
      else Some(s"$t:\n  expected $want\n  got      $got")
    }
    assert(diffs.isEmpty,
      "driver testdata layout changed — adapt readers/oracles, then " +
        "re-pin this snapshot:\n" + diffs.mkString("\n"))
  }
}
