package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables.table
import graft.ops.{LangModel, RangeJoin, Robust, Sampling}

/** Corpus-mixing and scoring gates, round 6 continuation: weighted
  * sampling without replacement (Efraimidis–Spirakis), temperature-scaled
  * source mixing, bigram language-model perplexity scoring, the
  * interval-overlap join, and per-group winsorization.
  */
object MixQueries {

  def family: QueryFamily = QueryFamily("mix", queries, oracles)

  private val WeightedK = 40
  private val MixAlpha = 0.7
  private val MixBudget = 0.5
  private val LmAddK = 0.5
  private val PromoCount = 160L
  private val PromoPeriod = 17L
  private val PromoLen = 9L // window is [start, start + 9] — 10 days
  private val OverlapBucket = 16L
  private val WinsorLo = 0.05
  private val WinsorHi = 0.95

  def queries: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(

    // Weight-proportional sample without replacement: 40 docs per source,
    // weight = n_chars (longer docs proportionally likelier). Winners are
    // ranked by the bounded TopKAgg, not a window.
    "sample_weighted" -> ((s, dir) =>
      Sampling.weightedSample(table(s, dir, "documents"),
        "source", "doc_id", "n_chars", WeightedK)),

    // α = 0.7 temperature rebalance of the four document sources at a 50%
    // total budget: small sources keep a larger share than natural.
    "sample_temperature" -> ((s, dir) =>
      Sampling.temperatureMix(
        table(s, dir, "documents").select(col("doc_id"), col("source")),
        "source", "doc_id", MixAlpha, MixBudget)
        .select(col("doc_id"), col("source"))),

    // Self-scored bigram LM: mean negative log-likelihood per bigram,
    // add-0.5 smoothing — the perplexity-filter score.
    "text_lm_score" -> ((s, dir) => {
      val docs = table(s, dir, "documents")
      LangModel.scoreDocs(docs, docs, "doc_id", "text", LmAddK)
    }),

    // Order-activity windows ([orderdate, orderdate + key%30 days]) ⋈
    // overlapping 10-day promo windows every 17 days — the bucketized
    // interval-overlap join; output carries the overlap length.
    "overlap_join_promos" -> ((s, dir) => {
      val ords = table(s, dir, "orders")
        .select(col("o_orderkey"),
          datediff(to_date(col("o_orderdate")), lit("1970-01-01"))
            .cast("long").as("o_start"))
        .withColumn("o_end", col("o_start") + pmod(col("o_orderkey"), lit(30L)))
      // Promo grid anchored at the TPC-H epoch day 8035 (1992-01-01).
      val promos = s.range(PromoCount)
        .select(col("id").as("promo_id"),
          (lit(8035L) + col("id") * PromoPeriod).as("p_start"))
        .withColumn("p_end", col("p_start") + PromoLen)
      RangeJoin.overlapBucketed(ords, "o_start", "o_end",
        promos, "p_start", "p_end", OverlapBucket)
        .select(col("o_orderkey"), col("promo_id"),
          (least(col("o_end"), col("p_end")) -
            greatest(col("o_start"), col("p_start")) + 1).as("overlap_days"))
    }),

    // Winsorized quantities: clamp each lineitem's quantity into its
    // return-flag group's exact [p05, p95] envelope.
    "winsorize_quantity" -> ((s, dir) =>
      Robust.winsorize(
        table(s, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
            col("l_returnflag"), col("l_quantity")),
        "l_returnflag", "l_quantity", WinsorLo, WinsorHi)))

  private val uniformSql =
    s"((${OracleSql.knuth32("doc_id")}) + 0.5) / 4294967296.0"

  private val toksSql =
    "list_filter(string_split_regex(lower(text), '\\s+'), t -> t <> '')"

  def oracles: Map[String, String] = Map(

    "sample_weighted" ->
      s"""WITH keyed AS (
         |  SELECT doc_id, text, lang, source, n_chars,
         |    ln($uniformSql) / CAST(n_chars AS DOUBLE) AS k
         |  FROM documents WHERE n_chars > 0),
         |r AS (SELECT *, row_number() OVER
         |    (PARTITION BY source ORDER BY k DESC, doc_id ASC) AS rk
         |  FROM keyed)
         |SELECT doc_id, text, lang, source, n_chars
         |FROM r WHERE rk <= $WeightedK""".stripMargin,

    "sample_temperature" ->
      s"""WITH c AS (SELECT source, CAST(count(*) AS DOUBLE) AS n
         |  FROM documents GROUP BY source),
         |t AS (SELECT sum(pow(n, $MixAlpha)) AS z, sum(n) AS tot FROM c),
         |r AS (SELECT source, CAST(round(least(1.0,
         |    $MixBudget * tot * pow(n, $MixAlpha) / z / n) * 1000000.0)
         |    AS BIGINT) AS rate_micro
         |  FROM c, t)
         |SELECT d.doc_id, d.source
         |FROM documents d JOIN r USING (source)
         |WHERE (((${OracleSql.knuth32("d.doc_id")}) * 1000000) >> 32) < rate_micro""".stripMargin,

    "text_lm_score" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |guard AS (SELECT CASE WHEN max(len(toks)) > 4096
         |    THEN error('bigram range(1,4096) cap exceeded') ELSE 1 END AS g
         |  FROM t),
         |bg AS (SELECT doc_id, CAST(i - 1 AS INT) AS pos,
         |    toks[CAST(i AS INT)] AS w1, toks[CAST(i + 1 AS INT)] AS w2
         |  FROM t, range(1, 4096) r(i)
         |  WHERE i + 1 <= len(toks) AND (SELECT g FROM guard) = 1),
         |m2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
         |m1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
         |v AS (SELECT CAST(count(DISTINCT u) AS DOUBLE) AS vsz
         |  FROM (SELECT unnest(toks) AS u FROM t)),
         |sc AS (SELECT bg.doc_id, bg.pos,
         |    ln((CAST(coalesce(c2, 0) AS DOUBLE) + $LmAddK) /
         |       (CAST(coalesce(c1, 0) AS DOUBLE) + $LmAddK * vsz)) AS lp
         |  FROM bg LEFT JOIN m2 USING (w1, w2) LEFT JOIN m1 USING (w1)
         |  CROSS JOIN v),
         |g AS (SELECT doc_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list(lp ORDER BY pos)), (a, b) -> a + b) AS s,
         |    count(*) AS n
         |  FROM sc GROUP BY doc_id)
         |SELECT t.doc_id, CAST(coalesce(n, 0) AS BIGINT) AS n_bigrams,
         |  round(-s / CAST(n AS DOUBLE), 6) AS nll
         |FROM t LEFT JOIN g USING (doc_id)""".stripMargin,

    "overlap_join_promos" ->
      s"""WITH o AS (SELECT o_orderkey,
         |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS o_start,
         |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)
         |      + o_orderkey % 30 AS o_end
         |  FROM orders),
         |p AS (SELECT i AS promo_id, 8035 + i * $PromoPeriod AS p_start,
         |    8035 + i * $PromoPeriod + $PromoLen AS p_end
         |  FROM range($PromoCount) r(i))
         |SELECT o_orderkey, promo_id,
         |  least(o_end, p_end) - greatest(o_start, p_start) + 1 AS overlap_days
         |FROM o JOIN p ON o_start <= p_end AND p_start <= o_end""".stripMargin,

    "winsorize_quantity" ->
      s"""WITH b AS (SELECT l_returnflag,
         |    quantile_cont(l_quantity, $WinsorLo) AS lo,
         |    quantile_cont(l_quantity, $WinsorHi) AS hi
         |  FROM lineitem GROUP BY 1)
         |SELECT l_orderkey, l_linenumber, l.l_returnflag, l_quantity,
         |  least(greatest(CAST(l_quantity AS DOUBLE), lo), hi) AS l_quantity_w
         |FROM lineitem l JOIN b USING (l_returnflag)""".stripMargin)
}
