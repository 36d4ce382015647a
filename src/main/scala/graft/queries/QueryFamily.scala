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

  /** [[graft.ops.TextOps.languageId]] mirror: (per-language marker-count
    * select list, argmax-with-priority-ties CASE). `toksSql` is the
    * tokenizer expression over a `text` column. */
  def langId(toksSql: String): (String, String) = {
    def markerSql(ws: Seq[String]) =
      s"len(list_filter($toksSql, t -> list_contains(${ws.map(w => s"'$w'").mkString("[", ",", "]")}, t)))"
    val langScores = graft.ops.TextOps.LangMarkers.map { case (l, ws) => l -> markerSql(ws) }
    val scoreSel = langScores.map { case (l, e) => s"($e) AS s_$l" }.mkString(", ")
    val langCase = {
      val arms = langScores.zipWithIndex.map { case ((l, _), i) =>
        val later = langScores.drop(i + 1).map { case (l2, _) => s"s_$l2 <= s_$l" }
        val cond = (s"s_$l > 0" +: later).mkString(" AND ")
        s"WHEN $cond THEN '$l'"
      }
      s"CASE ${arms.mkString(" ")} ELSE 'und' END"
    }
    (scoreSel, langCase)
  }
}
