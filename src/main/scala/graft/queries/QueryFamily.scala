package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of correctness-gate queries: Spark plans built from the
  * engine library + their DuckDB oracle SQL (keys of `oracles` ⊆ keys of
  * `queries`; missing keys get the driver's weaker rows-only check). */
final case class QueryFamily(
    name: String,
    queries: Map[String, (SparkSession, String) => DataFrame],
    oracles: Map[String, String])
