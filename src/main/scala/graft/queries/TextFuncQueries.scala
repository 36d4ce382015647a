package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables.table
import graft.enrich.Naming

/** Scalar-function operator families (SURVEY §2.8) + modifier/presence
  * aggregations (A1/A2) + JSON field access, over testdata with fabricated
  * inputs shared dialect-neutrally between engine and oracle. */
object TextFuncQueries {

  def family: QueryFamily = QueryFamily("textfunc", queries, oracles)

  // Fabricated inputs (dialect-neutral SQL, usable verbatim in both engines).
  private val fabName = "concat('The ', c_name, CASE c_custkey % 4" +
    " WHEN 0 THEN ' Medical Center' WHEN 1 THEN ' General Hospital'" +
    " WHEN 2 THEN ' Health System' ELSE ' Clinic & Care' END)"
  private val fabAddress = "concat(cast(c_custkey % 900 + 100 as string)," +
    " ' Main St, Atlanta, GA ', lpad(cast(c_custkey % 100000 as string), 5, '0')," +
    " CASE WHEN c_custkey % 3 = 0 THEN concat('-', lpad(cast(c_custkey % 10000 as string), 4, '0'))" +
    " ELSE '' END)"
  private val fabPayer = "CASE WHEN c_custkey % 2 = 0" +
    " THEN concat('Payer ', cast(c_custkey % 50 as string), ' [P', cast(c_custkey % 7 as string), ']')" +
    " ELSE concat('Payer ', cast(c_custkey % 50 as string)) END"
  private val fabModifiers = "CASE l_suppkey % 5 WHEN 0 THEN '26, tc'" +
    " WHEN 1 THEN '59|76' WHEN 2 THEN ' 26 |59, JW' WHEN 3 THEN 'TC'" +
    " ELSE NULL END"

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // F8/F9/F10/F11/F15 — key derivation over fabricated hospital
    // names/addresses (F10 fed a padded variant so the collapse has
    // real runs to normalize).
    "text_campus_keys" -> ((s, dir) => {
      table(s, dir, "customer")
        .withColumn("hname", expr(fabName))
        .withColumn("haddress", expr(fabAddress))
        .select(col("c_custkey"),
          Naming.campusId(col("hname")).as("campus_id"),
          Naming.extractZip(col("haddress")).as("zip"),
          Naming.alnumSquash(col("hname")).as("squash"),
          Naming.systemSlug(col("hname")).as("system_slug"),
          Naming.collapseWhitespace(
            concat(lit("  "), col("hname"), lit("   x "))).as("ws_collapsed"))
    }),

    // F1 — payer `Name [ID]` bracket split.
    "text_payer_split" -> ((s, dir) => {
      table(s, dir, "customer")
        .withColumn("payer", expr(fabPayer))
        .select(col("c_custkey"),
          Naming.payerName(col("payer")).as("payer_name"),
          Naming.payerId(col("payer")).as("payer_id"))
    }),

    // F2/A1 — modifier tokenize + frequency count.
    "text_modifier_counts" -> ((s, dir) => {
      table(s, dir, "lineitem")
        .withColumn("modifiers", expr(fabModifiers))
        .select(explode(Naming.tokenizeModifiers(col("modifiers"))).as("modifier"))
        .groupBy(col("modifier")).agg(count(lit(1)).as("n"))
    }),

    // A2 — field-presence summary over the raw charges fixture (non-empty
    // count per canonical column, extractor semantics: null ≡ "").
    "text_presence_counts" -> ((s, dir) => {
      val raw = ChargesFixture.charges(s, dir)
      val aggs = ChargesFixture.fabricated.map { case (n, _) =>
        sum(when(coalesce(col(ChargesFixture.toCanonical(n)), lit("")) =!= "", 1L)
          .otherwise(0L)).as(n)
      }
      raw.agg(aggs.head, aggs.tail: _*)
    }),

    // F14 + date_trunc + JSON scalar access over the events table.
    "events_hourly_stats" -> ((s, dir) => {
      table(s, dir, "events")
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("hour"),
          col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"),
          sum(get_json_object(col("props"), "$.k").cast("long")).as("sum_k"))
    }),

    // Character-class census per language — the script/composition profile
    // a corpus-curation pipeline reads before routing documents to
    // language-specific filters (a "ja" shard that is 90% ASCII letters is
    // mislabeled; a shard drowning in digits is tables, not prose).
    // Per-doc class counts are length-difference subtractions (one regexp
    // strip per class — no tokenization); fractions are 9dp decimals so
    // the per-language mean is an exact decimal fold. One hash aggregate.
    // Mojibake (encoding-artifact) census per source: plant the classic
    // UTF-8-as-Latin-1 corruption on every 7th doc (replace 'e' → 'Ã©'),
    // then detect via the marker-alternation count — the screen that
    // catches double-encoded crawl segments before they poison a corpus.
    // Pure per-row regexp counting + one source-keyed aggregate.
    "text_mojibake" -> ((s, dir) => {
      val p = table(s, dir, "documents")
        .select(col("source"),
          when(col("doc_id") % 7 === 0,
            expr("replace(text, 'e', 'Ã©')")).otherwise(col("text")).as("t"))
      p.select(col("source"), graft.ops.TextOps.mojibakeCount(col("t")).as("mk"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum((col("mk") > 0).cast("long")).as("n_mojibake"),
          sum(col("mk")).as("n_markers"))
        .select(col("source"), col("n_docs"), col("n_mojibake"),
          col("n_markers"),
          round(col("n_mojibake").cast("double") /
            col("n_docs").cast("double"), 6).as("rate"))
    }),

    "text_script_profile" -> ((s, dir) => {
      import org.apache.spark.sql.Column
      def cnt(cls: String) =
        (length(col("text")) -
          length(regexp_replace(col("text"), cls, ""))).cast("long")
      val d = table(s, dir, "documents").select(col("lang"),
        length(col("text")).cast("long").as("len"),
        cnt("[A-Za-z]").as("ca"), cnt("[0-9]").as("cd"),
        cnt("\\s").as("cs"), cnt("[.,;:!?]").as("cp"))
      def frac(c: Column) = when(col("len") > 0L,
        round(c.cast("double") / col("len").cast("double"), 9))
        .otherwise(lit(0.0)).cast("decimal(18,9)")
      val perDoc = d.select(col("lang"),
        frac(col("ca")).as("fa"), frac(col("cd")).as("fd"),
        frac(col("cs")).as("fs"), frac(col("cp")).as("fp"),
        frac(col("len") - col("ca") - col("cd") - col("cs") - col("cp"))
          .as("fo"))
      def m(c: Column) =
        round(sum(c).cast("double") / count(lit(1)).cast("double"), 6)
      perDoc.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"),
        m(col("fa")).as("mean_alpha"), m(col("fd")).as("mean_digit"),
        m(col("fs")).as("mean_space"), m(col("fp")).as("mean_punct"),
        m(col("fo")).as("mean_other"))
    }))

  def oracles: Map[String, String] = {
    val stop = graft.core.Conf.GenericWords.map(w => s"'$w'").mkString("[", ", ", "]")
    Map(
      "text_campus_keys" ->
        s"""WITH f AS (SELECT c_custkey, $fabName AS hname, $fabAddress AS haddress FROM customer)
           |SELECT c_custkey,
           | array_to_string(list_filter(string_split(regexp_replace(lower(hname), '[\\.,''\\-&]', '', 'g'), ' '),
           |   t -> t <> '' AND NOT list_contains($stop, t)), '_') AS campus_id,
           | regexp_extract(haddress, '(\\d{5})(?:-\\d{4})?$$', 1) AS zip,
           | regexp_replace(lower(trim(hname)), '[^\\w]', '', 'g') AS squash,
           | replace(lower(hname), ' ', '_') AS system_slug,
           | trim(regexp_replace(concat('  ', hname, '   x '), '\\s+', ' ', 'g')) AS ws_collapsed
           |FROM f""".stripMargin,
      "text_payer_split" ->
        s"""WITH f AS (SELECT c_custkey, $fabPayer AS payer FROM customer)
           |SELECT c_custkey,
           | CASE WHEN regexp_matches(payer, '(.*)\\[(.*?)\\]')
           |   THEN trim(regexp_extract(payer, '(.*)\\[(.*?)\\]', 1)) ELSE payer END AS payer_name,
           | CASE WHEN regexp_matches(payer, '(.*)\\[(.*?)\\]')
           |   THEN trim(regexp_extract(payer, '(.*)\\[(.*?)\\]', 2)) ELSE '' END AS payer_id
           |FROM f""".stripMargin,
      "text_modifier_counts" ->
        s"""WITH f AS (SELECT $fabModifiers AS modifiers FROM lineitem),
           |tok AS (SELECT trim(u) AS modifier FROM (SELECT unnest(string_split_regex(modifiers, '[,|]')) AS u FROM f))
           |SELECT modifier, count(*) AS n FROM tok WHERE modifier <> '' GROUP BY modifier""".stripMargin,
      "text_presence_counts" -> {
        val sums = ChargesFixture.fabricated.map { case (n, _) =>
          s"CAST(sum(CASE WHEN coalesce($n, '') <> '' THEN 1 ELSE 0 END) AS BIGINT) AS $n"
        }.mkString(", ")
        s"WITH raw AS (${ChargesFixture.sql}) SELECT $sums FROM raw"
      },
      "events_hourly_stats" ->
        """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
          | count(*) AS n,
          | CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
          | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k
          |FROM events GROUP BY 1, 2""".stripMargin,
      "text_mojibake" ->
        """WITH p AS (SELECT source,
          |    CASE WHEN doc_id % 7 = 0 THEN replace(text, 'e', 'Ã©')
          |         ELSE text END AS t
          |  FROM documents),
          |m AS (SELECT source, CAST(len(regexp_extract_all(t,
          |    'Ã©|Ã¨|Ã¼|â€™|â€œ')) AS BIGINT) AS mk FROM p)
          |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
          |  CAST(sum(CASE WHEN mk > 0 THEN 1 ELSE 0 END) AS BIGINT)
          |    AS n_mojibake,
          |  CAST(sum(mk) AS BIGINT) AS n_markers,
          |  round(CAST(sum(CASE WHEN mk > 0 THEN 1 ELSE 0 END) AS DOUBLE) /
          |    CAST(count(*) AS DOUBLE), 6) AS rate
          |FROM m GROUP BY 1""".stripMargin,

      "text_script_profile" -> {
        def cnt(cls: String) =
          s"(length(text) - length(regexp_replace(text, '$cls', '', 'g')))"
        def frac(e: String) =
          s"CAST(CASE WHEN len > 0 THEN round(CAST($e AS DOUBLE) / CAST(len AS DOUBLE), 9) ELSE 0.0 END AS DECIMAL(18,9))"
        s"""WITH d AS (SELECT lang, CAST(length(text) AS BIGINT) AS len,
           |    CAST(${cnt("[A-Za-z]")} AS BIGINT) AS ca,
           |    CAST(${cnt("[0-9]")} AS BIGINT) AS cd,
           |    CAST(${cnt("\\s")} AS BIGINT) AS cs,
           |    CAST(${cnt("[.,;:!?]")} AS BIGINT) AS cp
           |  FROM documents),
           |f AS (SELECT lang,
           |    ${frac("ca")} AS fa, ${frac("cd")} AS fd,
           |    ${frac("cs")} AS fs, ${frac("cp")} AS fp,
           |    ${frac("len - ca - cd - cs - cp")} AS fo
           |  FROM d)
           |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           |  round(CAST(sum(fa) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_alpha,
           |  round(CAST(sum(fd) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_digit,
           |  round(CAST(sum(fs) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_space,
           |  round(CAST(sum(fp) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_punct,
           |  round(CAST(sum(fo) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_other
           |FROM f GROUP BY 1""".stripMargin
      })
  }
}
