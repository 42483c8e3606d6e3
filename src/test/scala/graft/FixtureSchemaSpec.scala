package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Testdata-drift tripwire.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed physical types once (events.ts: TIMESTAMP(NANOS) → timestamp[us]
  * NTZ in round 7, which broke three queries far from the loader). This
  * suite pins the POST-[[Tables]] logical schema of every fixture table, so
  * the next silent regeneration fails one obvious test here instead of a
  * handful of distant analysis errors.
  *
  * Contract pinned:
  *  - `Tables.events` always yields a session-local TimestampType `ts`
  *    (the loader normalizes both historical physical shapes);
  *  - `lineitem.l_shipdate` / `orders.o_orderdate` may surface as either
  *    LTZ or NTZ (both are date-comparison-safe and oracle-compatible, so
  *    the loader passes them through) — but never anything else;
  *  - `embeddings.embedding` is array<float>;
  *  - every other column keeps its name and type exactly.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  private def types(name: String): Map[String, DataType] = {
    val df = name match {
      case "events" => Tables.events(spark, sf)
      case other    => Tables.load(spark, sf, other)
    }
    df.schema.fields.map(f => f.name -> f.dataType).toMap
  }

  private def tsLike(t: DataType): Boolean =
    t == TimestampType || t == TimestampNTZType

  test("events: ts normalized to session-local TimestampType") {
    val t = types("events")
    assert(t("ts") == TimestampType,
      s"Tables.events must normalize ts to TimestampType, got ${t("ts")}")
    assert(t == Map(
      "event_id" -> LongType, "ts" -> TimestampType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
  }

  test("embeddings: embedding is array<float>") {
    val t = types("embeddings")
    assert(t("embedding") == ArrayType(FloatType, containsNull = true) ||
      t("embedding") == ArrayType(FloatType, containsNull = false),
      s"embedding must be array<float>, got ${t("embedding")}")
    assert(t("vec_id") == LongType && t("label") == IntegerType)
  }

  test("documents: exact schema") {
    assert(types("documents") == Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
  }

  test("lineitem: exact schema (shipdate timestamp-like)") {
    val t = types("lineitem")
    assert(tsLike(t("l_shipdate")), s"l_shipdate must be a timestamp, got ${t("l_shipdate")}")
    assert(t - "l_shipdate" == Map(
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType,
      "l_tax" -> DoubleType, "l_returnflag" -> StringType,
      "l_linestatus" -> StringType))
  }

  test("orders: exact schema (orderdate timestamp-like)") {
    val t = types("orders")
    assert(tsLike(t("o_orderdate")), s"o_orderdate must be a timestamp, got ${t("o_orderdate")}")
    assert(t - "o_orderdate" == Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType))
  }

  test("dimension tables: exact schemas") {
    assert(types("customer") == Map(
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType))
    assert(types("supplier") == Map(
      "s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType))
    assert(types("part") == Map(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
    assert(types("nation") == Map(
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType))
    assert(types("region") == Map(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
  }
}
