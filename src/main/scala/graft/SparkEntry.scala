package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Each query family module contributes `queries` (Spark DataFrame plans built
  * from the engine library) and `oracles` (equivalent DuckDB ANSI SQL).
  */
object SparkEntry {

  private val families: Seq[QueryFamily] = Seq(CleanQueries.family, RelationalQueries.family, TextFuncQueries.family, ExtractQueries.family, EnrichQueries.family, DataOpsQueries.family, SessionQueries.family, StatsQueries.family, ShapeQueries.family, CorpusQueries.family, TrainPrepQueries.family, MixQueries.family, GraphQueries.family, EvalQueries.family, RecsysQueries.family)

  /** Flagship: full clean+rules pipeline over the charges fixture at
    * sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("clean_rows")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    families.map(_.queries).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → weaker rows-only check. */
  lazy val oracleSql: Map[String, String] =
    families.map(_.oracles).reduce(_ ++ _)
}
