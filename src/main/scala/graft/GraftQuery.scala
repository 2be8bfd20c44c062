package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine operator: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle query over the same
  * parquet tables. Non-SQL-expressible ops (LSH, sketches, streaming) omit
  * the oracle and get the driver's weaker rows-only check.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)
