package graft.ops

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Markov-chain (removal-effect) attribution over event journeys — the
  * data-driven alternative to the last-touch / position-based heuristics:
  * build the first-order channel transition matrix from user paths, compute
  * each journey's conversion probability by K-step absorption, and credit
  * every channel by how much conversion drops when it is removed.
  *
  * Scale split: path truncation + transition counting is fully distributed
  * (one user-keyed window over the events, then hash aggregates — the same
  * shape as sessionization, so it holds at 100 TB). The transition matrix
  * itself is DOMAIN-bounded (≤ (|channels|+3)² rows, like the BPE merge
  * table), so the absorption recurrences run driver-local on the collected
  * matrix with exact BigDecimal arithmetic, 12dp-rounded per step — the
  * identical recurrence a SQL engine unrolls, so the numbers are
  * engine-exact, not approximately equal.
  */
object Markov {

  val Start = "__start"
  val Conv = "__conv"
  val Null = "__null"
  /** Absorption horizon: K-step truncated conversion probability. */
  val Steps = 16

  /** First-order transition probabilities over per-user journeys truncated
    * at the first `convType` event (which maps to the absorbing [[Conv]]
    * state; journeys without one terminate in [[Null]]). Output:
    * (src, dst, cnt, prob DECIMAL(18,12)) — probabilities are 12dp-rounded
    * double ratios of exact counts, so both engines materialize the same
    * decimals. */
  def transitions(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, convType: String): DataFrame = {
    val wu = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val ranked = events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol))
      .withColumn("__rk", row_number().over(wu))
      .withColumn("__rp",
        min(when(col(typeCol) === convType, col("__rk"))).over(
          wu.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .filter(col("__rp").isNull || col("__rk") <= col("__rp"))
      .withColumn("__st",
        when(col(typeCol) === convType, lit(Conv)).otherwise(col(typeCol)))
    // The filter keeps a PREFIX of each user's ranked events, so __rk = 1
    // always survives and lead() walks the kept sequence directly.
    val seq = ranked.withColumn("__nxt", lead(col("__st"), 1).over(wu))
    val edges = seq.filter(col("__st") =!= Conv)
      .select(col("__st").as("src"), coalesce(col("__nxt"), lit(Null)).as("dst"))
      .union(seq.filter(col("__rk") === 1)
        .select(lit(Start).as("src"), col("__st").as("dst")))
    val cnt = edges.groupBy(col("src"), col("dst")).agg(count(lit(1)).as("cnt"))
    val tot = cnt.groupBy(col("src")).agg(sum(col("cnt")).as("__tot"))
    cnt.join(broadcast(tot), "src")
      .select(col("src"), col("dst"), col("cnt"),
        round(col("cnt").cast("double") / col("__tot").cast("double"), 12)
          .cast("decimal(18,12)").as("prob"))
  }

  /** K-step absorption probability into [[Conv]] starting from [[Start]],
    * computed with exact decimal arithmetic (HALF_UP to 12dp per step —
    * DuckDB's positive-decimal round) over a sparse (src, dst, prob) map.
    * Removing a channel redirects its incoming mass to [[Null]] and drops
    * its outgoing rows (probabilities stay denominator-unchanged — the
    * standard removal-effect construction). */
  private def absorb(trans: Seq[(String, String, JBigDecimal)],
      removed: Option[String]): JBigDecimal = {
    val redirected = trans
      .filter { case (s, _, _) => !removed.contains(s) }
      .map { case (s, d, p) =>
        (s, if (removed.contains(d)) Null else d, p)
      }
    // deterministic fold order (src, dst) — decimal adds are exact anyway
    val bySrc = redirected.groupBy(_._1).map { case (s, rows) =>
      s -> rows.map { case (_, d, p) => (d, p) }.sortBy(_._1)
    }
    var p = Map[String, JBigDecimal](Conv -> JBigDecimal.ONE)
    (1 to Steps).foreach { _ =>
      val next = bySrc.map { case (s, outs) =>
        val acc = outs.foldLeft(JBigDecimal.ZERO) { case (a, (d, pr)) =>
          a.add(pr.multiply(p.getOrElse(d, JBigDecimal.ZERO)))
        }
        s -> acc.setScale(12, RoundingMode.HALF_UP)
      }
      p = next.toMap + (Conv -> JBigDecimal.ONE)
    }
    p.getOrElse(Start, JBigDecimal.ZERO)
  }

  /** Removal-effect attribution table: one row per channel with the full /
    * channel-removed K-step conversion probabilities, the removal effect
    * 1 − p_removed/p_full, and the positive-clamped normalized credit. */
  def removalEffects(spark: SparkSession, trans: DataFrame): DataFrame = {
    val rows = trans.select(col("src"), col("dst"), col("prob")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDecimal(2)))
      .toSeq.sortBy(t => (t._1, t._2))
    val channels = rows.map(_._1).distinct
      .filterNot(Set(Start, Conv, Null)).sorted
    val pFull = absorb(rows, None)
    val pFullD = pFull.doubleValue
    // JBigDecimal.valueOf (Double.toString form) mirrors Spark's Round
    // expression, which DuckDB's round(double, n) agrees with across the
    // oracle suite — never new JBigDecimal(double) (exact binary expansion
    // rounds differently on representation-boundary values).
    def r6(x: Double): Double =
      JBigDecimal.valueOf(x).setScale(6, RoundingMode.HALF_UP).doubleValue
    val re = channels.map { ch =>
      val pRem = absorb(rows, Some(ch)).doubleValue
      val eff = if (pFullD > 0.0) r6(1.0 - pRem / pFullD) else 0.0
      (ch, r6(pFullD), r6(pRem), eff)
    }
    // exact decimal total of the 6dp positive parts, then double shares
    val totPos = re.foldLeft(JBigDecimal.ZERO) { case (a, (_, _, _, e)) =>
      a.add(JBigDecimal.valueOf(math.max(e, 0.0))
        .setScale(6, RoundingMode.HALF_UP))
    }
    val totPosD = totPos.doubleValue
    val out = re.map { case (ch, pf, pr, eff) =>
      val attr = if (totPosD > 0.0) r6(math.max(eff, 0.0) / totPosD) else 0.0
      Row(ch, pf, pr, eff, attr)
    }
    val schema = StructType(Seq(
      StructField("channel", StringType, nullable = false),
      StructField("p_conv_full", DoubleType, nullable = false),
      StructField("p_conv_removed", DoubleType, nullable = false),
      StructField("removal_effect", DoubleType, nullable = false),
      StructField("attribution", DoubleType, nullable = false)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(out, 1), schema)
  }
}
