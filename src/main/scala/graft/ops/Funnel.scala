package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-event analytics over an event stream: conversion funnels and
  * cohort retention — the product-analytics queries a clickstream
  * warehouse answers all day.
  */
object Funnel {

  /** Strict-order funnel: per user, the earliest time of stage 0, then the
    * earliest stage-1 event STRICTLY AFTER it, then the earliest stage-2
    * event strictly after THAT, … (the no-lookback conversion definition —
    * an early purchase before the first view does not count).
    *
    * One filtered min-aggregate per stage, each joined user-to-user with
    * the previous stage's time — every shuffle is on the user key (AQE
    * co-partitions the chain), no per-user window and no event-list
    * collection, so a user with millions of events costs only her
    * per-stage minima. Output: (user, t_<stage>… nullable, stage) where
    * `stage` counts completed steps. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String]): DataFrame = {
    require(stages.size >= 2, "need at least two funnel stages")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    def tcol(i: Int) = s"t_${stages(i)}"
    (stages.indices.map(tcol) :+ "stage").foreach { c =>
      require(!events.columns.contains(c),
        s"funnel emits a $c column; rename the existing one")
    }
    var acc = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as(tcol(0)))
    for (i <- 1 until stages.size) {
      val next = events.filter(col(typeCol) === stages(i))
        .join(acc.select(col(userCol), col(tcol(i - 1))), Seq(userCol))
        .filter(col(tsCol) > col(tcol(i - 1)))
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(tcol(i)))
      acc = acc.join(next, Seq(userCol), "left")
    }
    val stageExpr = (stages.size to 1 by -1).foldRight(lit(0)) {
      case (i, els) => when(col(tcol(i - 1)).isNotNull, lit(i)).otherwise(els)
    }
    acc.withColumn("stage", stageExpr.cast("int"))
  }

  /** Windowed funnel ([[funnel]] with a conversion deadline): the chain is
    * anchored at the user's FIRST stage-0 event and every later stage must
    * land within `windowSec` of that anchor — the "converted within 48h"
    * product metric, where an eventual purchase a month later no longer
    * counts. Same per-stage min-aggregate chain (user-keyed shuffles only,
    * no per-user windows or event lists); `stage` counts completed steps
    * inside the window. */
  def windowFunnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, stages: Seq[String], windowSec: Long): DataFrame = {
    require(stages.size >= 2, "need at least two funnel stages")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    require(windowSec > 0, s"windowSec must be positive: $windowSec")
    def tcol(i: Int) = s"t_${stages(i)}"
    (stages.indices.map(tcol) :+ "stage").foreach { c =>
      require(!events.columns.contains(c),
        s"windowFunnel emits a $c column; rename the existing one")
    }
    var acc = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as(tcol(0)))
    for (i <- 1 until stages.size) {
      val next = events.filter(col(typeCol) === stages(i))
        .join(acc.select(col(userCol), col(tcol(0)), col(tcol(i - 1))),
          Seq(userCol))
        .filter(col(tsCol) > col(tcol(i - 1)) &&
          col(tsCol) <= col(tcol(0)) + windowSec)
        .groupBy(col(userCol)).agg(min(col(tsCol)).as(tcol(i)))
      acc = acc.join(next, Seq(userCol), "left")
    }
    val stageExpr = (stages.size to 1 by -1).foldRight(lit(0)) {
      case (i, els) => when(col(tcol(i - 1)).isNotNull, lit(i)).otherwise(els)
    }
    acc.withColumn("stage", stageExpr.cast("int"))
  }

  /** Cohort retention matrix: users cohort by their FIRST-ever activity
    * day; each (cohort, age-in-days) cell counts distinct users active
    * that day. Two user-keyed shuffles (first-day aggregate, join back) +
    * one distinct + one count — nothing is per-user-serial. Output:
    * (cohort yyyy-MM-dd, age_days, n_active). */
  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    Seq("__cohort", "__day").foreach { c =>
      require(!events.columns.contains(c),
        s"cohortRetention uses an internal $c column; rename the existing one")
    }
    val first = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("__cohort"))
    events.select(col(userCol), to_date(col(tsCol)).as("__day"))
      .join(first, Seq(userCol))
      .select(col("__cohort"), datediff(col("__day"), col("__cohort")).as("age_days"),
        col(userCol))
      .distinct()
      .groupBy(col("__cohort"), col("age_days"))
      .agg(count(lit(1)).as("n_active"))
      .select(date_format(col("__cohort"), "yyyy-MM-dd").as("cohort"),
        col("age_days").cast("long").as("age_days"), col("n_active"))
  }

  /** Session path mining: gap-sessionize the event stream, render each
    * session's first `maxLen` event types as a `>`-joined path string,
    * and count sessions per path — the "what journeys do users actually
    * take" table behind funnel design.
    *
    * The per-session event order comes from `sort_array` over collected
    * (ts, tie, type) structs — the tie column totalizes the order, so the
    * path string is deterministic on any engine. Sessions are keyed by
    * (user, running-start-count); one user-keyed window + two hash
    * aggregates, nothing global. Output: (path, n_sessions). */
  def sessionPaths(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String, gapSec: Long,
      maxLen: Int): DataFrame = {
    require(gapSec > 0 && maxLen >= 1, s"bad gap/maxLen: $gapSec/$maxLen")
    Seq("__prev", "__new", "__sid", "__evs", "path").foreach { c =>
      require(!events.columns.contains(c),
        s"sessionPaths uses/emits a $c column; rename the existing one")
    }
    val order = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol).asc, col(tieCol).asc)
    val running = order.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.currentRow)
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(order))
      .withColumn("__new",
        when(col("__prev").isNull ||
          unix_timestamp(col(tsCol)) - unix_timestamp(col("__prev")) > gapSec,
          1L).otherwise(0L))
      .withColumn("__sid", sum(col("__new")).over(running))
      .groupBy(col(userCol), col("__sid"))
      .agg(sort_array(collect_list(
        struct(col(tsCol), col(tieCol), col(typeCol)))).as("__evs"))
      .select(concat_ws(">",
        slice(transform(col("__evs"), e => e.getField(typeCol)), 1, maxLen))
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).as("n_sessions"))
  }
}
