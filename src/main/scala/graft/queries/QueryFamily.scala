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

  /** Engine-neutral string hash: left fold h ← (h·31 + codepoint) mod
    * 1000000007 over the characters. Both engines fold the same ASCII
    * codes in the same order, so the bucket assignment is identical —
    * unlike xxhash64/md5, which only one engine exposes. Spark mirror:
    * [[graft.ops.Shaping.stringPolyHash]]. */
  def stringPolyHash(sExpr: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, length($sExpr) + 1), " +
      s"i -> CAST(unicode(substr($sExpr, CAST(i AS INT), 1)) AS BIGINT))), " +
      "(h, c) -> (h * 31 + c) % 1000000007)"

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
