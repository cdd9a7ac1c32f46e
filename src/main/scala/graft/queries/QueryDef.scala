package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** One verifiable operator query: a Spark DataFrame program plus (optionally)
  * the equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Names follow SURVEY.md §2 row ids so coverage can be audited line
  * by line.
  *
  * Oracle-parity rules used throughout (Spark vs DuckDB must hash-match —
  *  and the driver hashes the parquet PHYSICAL TYPE, not just the values):
  *  - money/measure doubles are cast to DECIMAL(18,2) *before* aggregation —
  *    exact and summation-order-independent on both engines;
  *  - every decimal aggregate OUTPUT is pinned to an explicit DECIMAL(38,s)
  *    on BOTH sides: Spark's sum(DECIMAL(18,2)) lands on DECIMAL(28,2)
  *    while DuckDB's lands on DECIMAL(38,2), which hash-differently even
  *    when values are equal (the round-1 lesson — 12 queries failed on it);
  *  - integer outputs match width too: row_number/length/size are int in
  *    Spark but BIGINT in DuckDB → cast to long; DuckDB's bit_count is
  *    TINYINT → CAST AS INTEGER; DECIMAL subtraction is (19,2) in Spark vs
  *    (18,2) in DuckDB → cast down;
  *  - double divisions/ratios are computed on exact integer/decimal inputs
  *    and rounded, so both engines perform the identical IEEE operation;
  *  - hashing uses md5 (bit-identical across engines), never engine-native
  *    hash functions;
  *  - every rank/top-k has a total-order tiebreak on a unique key;
  *  - engine-specific sketches (HLL, quantile) are checked via a
  *    bounded-error contract against the exact value, never sketch-vs-sketch.
  *
  *  `tools/check.py` replicates the driver's type-sensitive compare
  *  (arrow-level schema equality + symmetric value compare) — run it before
  *  claiming parity.
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
