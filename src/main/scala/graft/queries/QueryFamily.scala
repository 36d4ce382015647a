package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of correctness-gate queries: Spark plans built from the
  * engine library + their DuckDB oracle SQL (keys of `oracles` ⊆ keys of
  * `queries`; missing keys get the driver's weaker rows-only check). */
final case class QueryFamily(
    name: String,
    queries: Map[String, (SparkSession, String) => DataFrame],
    oracles: Map[String, String])

/** Oracle-side mirrors of engine expressions that multiple query families
  * must keep bit-identical to the Scala side. */
object OracleSql {
  /** [[graft.ops.Shaping.knuth32]] in the dialect-neutral non-negative mod
    * form (((x % m) + m) % m — DuckDB % is signed, Spark-side is pmod). */
  def knuth32(idExpr: String): String =
    s"(((($idExpr % 1000000007) + 1000000007) % 1000000007) * 2654435761) % 4294967296"
}
