package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.table
import graft.enrich.RegistryEnricher

/** J2 — the two-stage exact+fuzzy registry join through the REAL enricher,
  * with a provable DuckDB oracle: keys are md5-prefix strings (hash-random,
  * so cross-key SequenceMatcher ratios sit far below the 0.9 cutoff), and
  * "typos" drop one character (ratio exactly 22/23 against the original).
  * Every row's expected outcome is therefore a closed-form CASE.
  */
object EnrichQueries {

  def family: QueryFamily = QueryFamily("enrich", queries, oracles)

  private val PromoCount = 160
  private val keyE = "substr(md5(cast(c_custkey as string)), 1, 12)"
  private val scrapedKeyE =
    s"CASE WHEN c_custkey % 3 = 0 THEN concat(substr($keyE, 1, 2), substr($keyE, 4)) ELSE $keyE END"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "enrich_fuzzy_registry" -> ((s, dir) => {
      val c = table(s, dir, "customer")
      val scraped = c.select(col("c_custkey"), expr(scrapedKeyE).as("campus_id"))
      val cms = c.filter(col("c_custkey") % 10 === 0)
        .select(expr(keyE).as("campus_id"),
          expr("cast(c_custkey % 5 as string)").as("cms_rating"))
      RegistryEnricher.enrich(scraped, cms)
        .select(col("c_custkey"), col("campus_id"), col("match_kind"),
          col("match_ratio"), col("cms_rating"))
    }),

    // Jaro–Winkler record-linkage scores between each customer's name and
    // its successor's — graft's codegen'd expression vs DuckDB's NATIVE
    // jaro_winkler_similarity: two independent implementations must agree
    // (semantics pinned in JaroWinklerImpl; 6dp rounding for libm-order
    // neutrality).
    "text_jaro_winkler" -> ((s, dir) => {
      val c = table(s, dir, "customer").select(col("c_custkey"), col("c_name"))
      val d = c.select((col("c_custkey") - 1).as("c_custkey"),
        col("c_name").as("next_name"))
      c.join(d, Seq("c_custkey"))
        .select(col("c_custkey"),
          round(graft.functions.JaroWinklerSim.jaroWinkler(
            col("c_name"), col("next_name")), 6).as("jw"))
    }),

    // Promo-calendar enrichment via the plan-embedded StepLookup binary
    // search (map-side, ZERO joins/shuffles — the GeoIP shape) against a
    // pure-arithmetic oracle: two independent methods must agree. 10-day
    // windows every 17 days from epoch day 8035 (1992-01-01).
    "lookup_promo_period" -> ((s, dir) => {
      val starts = Array.tabulate(PromoCount)(p => 8035L + 17L * p)
      val ids = Array.tabulate(PromoCount)(_.toLong)
      table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"),
          datediff(to_date(col("l_shipdate")), lit("1970-01-01"))
            .cast("long").as("day"))
        .withColumn("__pid",
          graft.functions.StepLookup.stepLookup(col("day"), starts, ids))
        .select(col("l_orderkey"), col("l_linenumber"), col("day"),
          when(col("day") - (lit(8035L) + col("__pid") * 17L) <= 9L,
            col("__pid")).as("promo_id"))
    }))

  def oracles: Map[String, String] = Map(
    "enrich_fuzzy_registry" ->
      s"""SELECT c_custkey, $scrapedKeyE AS campus_id,
         | CASE WHEN c_custkey % 10 = 0 AND c_custkey % 3 <> 0 THEN 'exact'
         |      WHEN c_custkey % 10 = 0 AND c_custkey % 3 = 0 THEN 'fuzzy'
         |      ELSE 'none' END AS match_kind,
         | CASE WHEN c_custkey % 10 = 0 AND c_custkey % 3 <> 0 THEN 1.0
         |      WHEN c_custkey % 10 = 0 AND c_custkey % 3 = 0 THEN CAST(22.0 AS DOUBLE) / 23.0
         | END AS match_ratio,
         | CASE WHEN c_custkey % 10 = 0 THEN cast(c_custkey % 5 as string) END AS cms_rating
         |FROM customer""".stripMargin,

    "text_jaro_winkler" ->
      """SELECT c.c_custkey,
        |  round(jaro_winkler_similarity(c.c_name, d.c_name), 6) AS jw
        |FROM customer c JOIN customer d ON d.c_custkey = c.c_custkey + 1""".stripMargin,

    "lookup_promo_period" ->
      s"""WITH l AS (SELECT l_orderkey, l_linenumber,
         |    CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
         |  FROM lineitem)
         |SELECT l_orderkey, l_linenumber, day,
         |  CASE WHEN day >= 8035 AND (day - 8035) % 17 <= 9
         |        AND (day - 8035) // 17 < $PromoCount
         |       THEN (day - 8035) // 17 END AS promo_id
         |FROM l""".stripMargin)
}
