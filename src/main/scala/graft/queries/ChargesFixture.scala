package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

import graft.core.Tables

/** Deterministic canonical-charges fixture fabricated from `lineitem`.
  *
  * The cleaning/rules correctness gate needs a messy 22-column charges table
  * (FIXTURES.md §2.1) derivable from the driver's TPC-H-ish testdata on BOTH
  * engines. Every fabricated column below is a single SQL expression written
  * in the dialect-neutral intersection of Spark SQL and DuckDB SQL
  * (CASE / concat / cast(... as string) / lpad / % only), so the exact same
  * text runs on both sides — fabrication can never drift between the engine
  * and the oracle.
  *
  * Column values are pure functions of integer keys, so all prices parse to
  * exactly-representable doubles (hash-stable across engines), and distinct
  * lineitem rows can map to identical charge rows (exercising dedup).
  */
object ChargesFixture {

  /** (underscored column name, shared SQL expression). Underscored names keep
    * the oracle free of identifier-quoting dialect differences; the cleaner's
    * canonical space-separated names are restored via [[toCanonical]]. */
  val fabricated: Seq[(String, String)] = Seq(
    "hospital_name" -> "'General Hospital'",
    "zip_code" -> "'30303'",
    "code" -> ("""CASE l_partkey % 10
      | WHEN 0 THEN lpad(cast(l_partkey % 100000 as string), 5, '0')
      | WHEN 1 THEN concat('A', lpad(cast(l_partkey % 10000 as string), 4, '0'))
      | WHEN 2 THEN lpad(cast(l_partkey % 1000 as string), 3, '0')
      | WHEN 3 THEN concat('D', lpad(cast(l_partkey % 10000 as string), 4, '0'))
      | WHEN 4 THEN lpad(cast(l_partkey % 10000 as string), 4, '0')
      | WHEN 5 THEN lpad(cast(l_partkey as string), 10, '0')
      | WHEN 6 THEN concat('X', cast(l_partkey % 1000 as string))
      | WHEN 7 THEN '12'
      | WHEN 8 THEN NULL
      | ELSE 'ZZZZZZZZZZ' END""").stripMargin,
    "code_type" -> ("""CASE l_orderkey % 9
      | WHEN 0 THEN 'CPT' WHEN 1 THEN 'HCPCS' WHEN 2 THEN 'ICD'
      | WHEN 3 THEN 'DRG' WHEN 4 THEN 'CDT' WHEN 5 THEN 'NDC'
      | WHEN 6 THEN 'APC' WHEN 7 THEN 'MS-DRG' ELSE NULL END""").stripMargin,
    "description" -> ("CASE WHEN l_linenumber % 7 = 0 THEN NULL" +
      " ELSE concat('Item ', cast(l_partkey % 50 as string)) END"),
    "drug_unit" -> ("CASE WHEN l_partkey % 6 = 0 THEN 'ml'" +
      " WHEN l_partkey % 6 = 1 THEN 'N/A' ELSE NULL END"),
    "drug_type" -> "CASE WHEN l_partkey % 9 = 0 THEN 'liquid' ELSE NULL END",
    "insurance_payer_name" -> ("concat('Payer', cast(l_suppkey % 5 as string)," +
      " CASE WHEN l_suppkey % 2 = 0 THEN concat(' [P', cast(l_suppkey % 7 as string), ']')" +
      " ELSE '' END)"),
    "insurance_payer_id" -> "CASE WHEN l_suppkey % 4 = 0 THEN cast(l_suppkey % 100 as string) ELSE NULL END",
    "insurance_plan_name" -> ("CASE l_suppkey % 3 WHEN 0 THEN 'PPO'" +
      " WHEN 1 THEN 'HMO' ELSE NULL END"),
    "negotiated_price" -> ("""CASE l_orderkey % 5
      | WHEN 0 THEN concat('$', cast(l_partkey % 900 + 100 as string), '.50')
      | WHEN 1 THEN '999999999'
      | WHEN 2 THEN concat('-', cast(l_partkey % 50 + 1 as string))
      | WHEN 3 THEN NULL
      | ELSE cast(l_partkey % 900 + 100 as string) END""").stripMargin,
    "negotiated_percentage" -> ("CASE WHEN l_orderkey % 4 = 0" +
      " THEN concat(cast(l_partkey % 100 as string), '%') ELSE NULL END"),
    "negotiated_algorithm" -> ("""CASE l_partkey % 5
      | WHEN 0 THEN 'percent of billed charges'
      | WHEN 1 THEN '100$%'
      | WHEN 2 THEN 'fee schedule 2024'
      | ELSE NULL END""").stripMargin,
    "negotiated_methodology" -> ("CASE l_orderkey % 11 WHEN 0 THEN 'Other'" +
      " WHEN 1 THEN NULL ELSE 'fee schedule' END"),
    "gross_charge" -> ("CASE WHEN l_orderkey % 13 = 0 THEN 'n/a'" +
      " ELSE concat('$', cast(l_partkey % 900 + 110 as string)) END"),
    "discounted_cash_price" -> ("CASE WHEN l_orderkey % 17 = 0 THEN NULL" +
      " ELSE concat(cast(l_partkey % 900 + 105 as string), ',') END"),
    "min_price" -> ("CASE WHEN l_orderkey % 7 = 0 THEN NULL" +
      " ELSE cast(l_partkey % 900 + 90 as string) END"),
    "max_price" -> ("CASE WHEN l_orderkey % 19 = 0 THEN NULL" +
      " ELSE cast(l_partkey % 900 + 200 as string) END"),
    "estimated_amount" -> ("""CASE l_orderkey % 6
      | WHEN 0 THEN '999999999'
      | WHEN 1 THEN '-3'
      | WHEN 2 THEN NULL
      | ELSE cast(l_partkey % 900 + 95 as string) END""").stripMargin,
    "setting" -> "CASE WHEN l_linenumber % 2 = 0 THEN 'Inpatient' ELSE 'outpatient' END",
    "additional_notes" -> ("CASE WHEN l_linenumber % 3 = 0 THEN 'see policy'" +
      " ELSE NULL END"),
    "modifiers" -> ("CASE l_suppkey % 5 WHEN 0 THEN '26, tc'" +
      " WHEN 1 THEN '59|76' ELSE NULL END"))

  /** underscored → canonical (space-separated) column name. */
  val toCanonical: Map[String, String] =
    fabricated.map { case (n, _) => n -> n.replace('_', ' ') }.toMap

  /** Spark side: the fixture as a DataFrame with canonical column names. */
  def charges(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.table(spark, sfDir, "lineitem")
    li.select(fabricated.map { case (n, e) => expr(e).as(toCanonical(n)) }: _*)
  }

  /** Deterministic 1/`mod` slice of the fixture: the filter is on raw
    * lineitem keys so it pushes into the parquet scan, BEFORE fabrication.
    * For gates that exercise machinery downstream of the clean pipeline
    * (the devlog roundtrip) where the full-size pipeline is already gated
    * elsewhere. Mirror with [[sliceSql]]. */
  def sliceFilter(mod: Int): String = s"(l_orderkey + l_linenumber) % $mod = 0"

  def chargesSlice(spark: SparkSession, sfDir: String, mod: Int): DataFrame = {
    val li = Tables.table(spark, sfDir, "lineitem").filter(expr(sliceFilter(mod)))
    li.select(fabricated.map { case (n, e) => expr(e).as(toCanonical(n)) }: _*)
  }

  /** Oracle side of [[chargesSlice]]. */
  def sliceSql(mod: Int): String = s"$sql WHERE ${sliceFilter(mod)}"

  /** Oracle side: the identical fixture as a DuckDB CTE body (underscored
    * aliases; reads the `lineitem` view the driver registers). */
  def sql: String =
    fabricated.map { case (n, e) => s"($e) AS $n" }
      .mkString("SELECT ", ", ", " FROM lineitem")
}
