package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared engine operator: a Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) a DuckDB oracle query over the same
  * parquet tables. Non-SQL-expressible ops (LSH, sketches, streaming) omit
  * the oracle and get the driver's weaker rows-only check.
  *
  * `oracleGen` covers oracles whose SQL embeds data-derived constants
  * (e.g. fitted KMeans centroids as literals): Verify runs every query
  * BEFORE dumping oracle_sql.json, so a generator evaluated at dump time
  * can emit constants produced by the query run itself. A generator that
  * returns None (query never ran) degrades to the rows-only check.
  */
final case class GraftQuery(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    oracleGen: Option[() => Option[String]] = None
)
