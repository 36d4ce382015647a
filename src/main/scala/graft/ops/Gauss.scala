package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Normal-distribution tail helpers for the hypothesis-testing gates.
  *
  * Neither Spark nor DuckDB ships erf, so both engines evaluate the SAME
  * Abramowitz–Stegun 7.1.26 rational approximation (max abs error
  * 1.5e-7 — far inside the gates' 6dp rounding): the Column form here and
  * the SQL mirror from [[erfSql]] share one set of literal constants, so
  * the two implementations cannot drift apart.
  */
object Gauss {

  // A&S 7.1.26 coefficients.
  private val P  = "0.3275911"
  private val A1 = "0.254829592"
  private val A2 = "-0.284496736"
  private val A3 = "1.421413741"
  private val A4 = "-1.453152027"
  private val A5 = "1.061405429"

  /** erf(x) for x >= 0 (callers pass |x|). */
  def erfAbs(x: Column): Column = {
    val t = lit(1.0) / (lit(1.0) + lit(P.toDouble) * x)
    val poly = ((((lit(A5.toDouble) * t + lit(A4.toDouble)) * t
      + lit(A3.toDouble)) * t + lit(A2.toDouble)) * t + lit(A1.toDouble)) * t
    lit(1.0) - poly * exp(-(x * x))
  }

  /** Two-sided normal p-value 2·(1 − Φ(|z|)) = 1 − erf(|z|/√2). */
  def twoSidedP(z: Column): Column = lit(1.0) - erfAbs(abs(z) / lit(math.sqrt(2.0)))

  /** SQL mirror of [[erfAbs]] over a non-negative expression. */
  def erfAbsSql(x: String): String = {
    val t = s"(1.0 / (1.0 + $P * ($x)))"
    val poly = s"((((($A5 * $t + $A4) * $t + $A3) * $t + $A2) * $t + $A1) * $t)"
    s"(1.0 - $poly * exp(-(($x) * ($x))))"
  }

  /** SQL mirror of [[twoSidedP]] over a z expression. */
  def twoSidedPSql(z: String): String =
    s"(1.0 - ${erfAbsSql(s"abs($z) / sqrt(2.0)")})"
}
