package graft

import graft.vlm.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Contract between the driver-regenerated testdata and the loader layer.
  *
  * Round 7 lost 28 queries when the driver re-encoded every timestamp
  * column (TIMESTAMP(NANOS)-as-long → TIMESTAMP_MICROS) after the last
  * commit; nothing failed until the whole catalog did. This spec pins the
  * *loader-normalized* schema of all ten tables against the live parquet,
  * so the next physical re-encoding fails one named test with a readable
  * diff instead of failing every events-family query at once.
  *
  * The contract is over what downstream queries see (post-`Tables.*`), not
  * the physical encoding: `Tables.events` must always surface `ts` as the
  * engine-internal epoch-micros LONG no matter how the parquet spells it.
  */
class TestdataContractSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def assertSchema(df: DataFrame, expected: Seq[(String, DataType)]): Unit = {
    val got = df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    assert(got === expected,
      s"\nloader-normalized schema drifted.\n  got:      $got\n  expected: $expected")
  }

  test("events: ts is normalized to epoch-micros LONG whatever the physical encoding") {
    assertSchema(Tables.events(spark, dir), Seq(
      "event_id" -> LongType, "ts" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType, "props" -> StringType))
    // and the values really are micros: all within [2020-01-01, 2030-01-01)
    val r = Tables.events(spark, dir)
      .agg(org.apache.spark.sql.functions.min("ts"), org.apache.spark.sql.functions.max("ts"))
      .head()
    val lo = 1577836800000000L // 2020-01-01 in epoch-micros
    val hi = 1893456000000000L // 2030-01-01
    assert(r.getLong(0) >= lo && r.getLong(1) < hi,
      s"ts range [${r.getLong(0)}, ${r.getLong(1)}] is not plausible epoch-micros")
  }

  test("orders/lineitem: date columns surface as TIMESTAMP_NTZ (queries use ntz literals)") {
    assertSchema(Tables.orders(spark, dir), Seq(
      "o_orderkey" -> LongType, "o_custkey" -> LongType, "o_orderstatus" -> StringType,
      "o_totalprice" -> DoubleType, "o_orderdate" -> TimestampNTZType,
      "o_orderpriority" -> StringType))
    assertSchema(Tables.lineitem(spark, dir), Seq(
      "l_orderkey" -> LongType, "l_partkey" -> LongType, "l_suppkey" -> LongType,
      "l_linenumber" -> IntegerType, "l_quantity" -> DoubleType,
      "l_extendedprice" -> DoubleType, "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType))
  }

  test("dimension tables: region/nation/customer/supplier/part") {
    assertSchema(Tables.region(spark, dir), Seq("r_regionkey" -> IntegerType, "r_name" -> StringType))
    assertSchema(Tables.nation(spark, dir), Seq(
      "n_nationkey" -> IntegerType, "n_name" -> StringType, "n_regionkey" -> IntegerType))
    assertSchema(Tables.customer(spark, dir), Seq(
      "c_custkey" -> LongType, "c_name" -> StringType, "c_nationkey" -> IntegerType,
      "c_acctbal" -> DoubleType, "c_mktsegment" -> StringType))
    assertSchema(Tables.supplier(spark, dir), Seq(
      "s_suppkey" -> LongType, "s_name" -> StringType, "s_nationkey" -> IntegerType,
      "s_acctbal" -> DoubleType))
    assertSchema(Tables.part(spark, dir), Seq(
      "p_partkey" -> LongType, "p_name" -> StringType, "p_brand" -> StringType,
      "p_type" -> StringType, "p_size" -> IntegerType, "p_retailprice" -> DoubleType))
  }

  test("documents/embeddings: text corpus and vector tables") {
    assertSchema(Tables.documents(spark, dir), Seq(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assertSchema(Tables.embeddings(spark, dir), Seq(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType, containsNull = true),
      "label" -> IntegerType))
  }

  test("toNtz handles all three physical encodings and rejects others") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val us = 1577836800000000L // 2020-01-01T00:00:00 UTC
    def ntzOf(df: org.apache.spark.sql.DataFrame): java.time.LocalDateTime = {
      val out = Tables.toNtz(df, "d")
      assert(out.schema("d").dataType === TimestampNTZType)
      out.head().getAs[java.time.LocalDateTime]("d")
    }
    val expect = java.time.LocalDateTime.of(2020, 1, 1, 0, 0)
    assert(ntzOf(Seq(us * 1000L).toDF("d")) === expect) // nanos long
    assert(ntzOf(Seq(us).toDF("u").select(timestamp_micros(col("u")).as("d"))) === expect)
    assert(ntzOf(Seq(us).toDF("u")
      .select(timestamp_micros(col("u")).cast(TimestampNTZType).as("d"))) === expect)
    intercept[IllegalStateException](Tables.toNtz(Seq("x").toDF("d"), "d"))
  }

  test("toEpochMicros handles all three physical encodings and rejects others") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // nanos-long fixture (the pre-round-8 physical encoding)
    val nanosDf = Seq(1577836800000000000L).toDF("ts")
    assert(Tables.toEpochMicros(nanosDf, "ts").head().getLong(0) === 1577836800000000L)
    // TIMESTAMP (tz-adjusted) fixture
    val tsDf = Seq(1577836800000000L).toDF("us").select(timestamp_micros(col("us")).as("ts"))
    assert(Tables.toEpochMicros(tsDf, "ts").head().getLong(0) === 1577836800000000L)
    // TIMESTAMP_NTZ fixture (the round-8 physical encoding; UTC session tz
    // makes the ntz→ts cast identity)
    val ntzDf = tsDf.select(col("ts").cast(TimestampNTZType).as("ts"))
    assert(Tables.toEpochMicros(ntzDf, "ts").head().getLong(0) === 1577836800000000L)
    // anything else is a loud failure, not a silent mis-read
    val strDf = Seq("2020-01-01").toDF("ts")
    intercept[IllegalStateException](Tables.toEpochMicros(strDf, "ts"))
  }
}
