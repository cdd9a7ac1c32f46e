package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** One verifiable operator query: a Spark DataFrame program plus (optionally)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Names follow SURVEY.md §2 row ids so coverage can be audited line
  * by line.
  *
  * Oracle-parity rules used throughout (Spark vs DuckDB must hash-match):
  *  - money/measure doubles are cast to DECIMAL(18,2) *before* aggregation —
  *    exact and summation-order-independent on both engines;
  *  - double divisions/ratios are computed on exact integer/decimal inputs
  *    and rounded, so both engines perform the identical IEEE operation;
  *  - hashing uses md5 (bit-identical across engines), never engine-native
  *    hash functions;
  *  - every rank/top-k has a total-order tiebreak on a unique key.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = ""
)

trait QueryModule {
  def defs: Seq[QueryDef]
}
