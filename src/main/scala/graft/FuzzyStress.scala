package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Registry-scale fuzzy-join stress canary
  * (`FuzzyStress <sfDir> [scrapedN=100000] [cmsN=50000] [cutoff=0.9]`):
  * enrich_fuzzy_registry gates the enricher on the small charges fixture;
  * this drives [[graft.enrich.RegistryEnricher.enrich]] at the
  * reference's real envelope (CMS fetch cap ~50k providers, a 100k-row
  * scraped side) and reports the numbers that decide scalability:
  *
  *  - candidate pairs admitted by the length-band + length-ratio bound
  *    (computed independently from the per-length histograms — the same
  *    arithmetic as the enricher's banded join, so it counts exactly the
  *    pairs the BroadcastHashJoin emits);
  *  - the naive |misses|×|CMS| pair count it replaces;
  *  - end-to-end wall seconds and the match-kind census.
  *
  * Key fabrication is deterministic from the part-name vocabulary:
  * squashed p_name + a replica suffix for the CMS side; the scraped side
  * cycles the CMS keys through id%4 ∈ {exact copy, one dropped char
  * (fuzzy ≥0.9), two dropped tail chars (fuzzy), reversed+junk (none)}.
  */
object FuzzyStress {

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val scrapedN = if (args.length > 1) args(1).toLong else 100000L
    val cmsN = if (args.length > 2) args(2).toLong else 50000L
    // Optional cutoff override — the low-cutoff cost-shape canary
    // (VERDICT r13 item 5): at low cutoffs the pigeonhole L* degrades
    // toward 1-grams and the length band widens, so the index admits
    // more candidates; this measures that cost on the same corpus.
    val cutoff = if (args.length > 3) args(3).toDouble
      else graft.enrich.RegistryEnricher.DefaultCutoff
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$dir/part.parquet")
      .select((col("p_partkey") - 1).cast("long").as("k"),
        regexp_replace(lower(col("p_name")), "[^a-z0-9]", "").as("nm"))
    val nBase = base.count()

    def keyed(n: Long) = spark.range(n)
      .withColumn("k", col("id") % nBase)
      .join(base, "k")
      .select(col("id"),
        concat(col("nm"), lit("c"), (col("id") / nBase).cast("long"))
          .as("key0"))

    val cms = keyed(cmsN)
      .select(col("key0").as("campus_id"), (col("id") % 5).as("cms_rating"))
    val scraped = keyed(scrapedN).select(col("id").as("sid"),
      when(col("id") % 4 === 0, col("key0"))
        .when(col("id") % 4 === 1,
          concat(substring(col("key0"), 1, 2), expr("substring(key0, 4)")))
        .when(col("id") % 4 === 2,
          expr("substring(key0, 1, length(key0) - 2)"))
        .otherwise(concat(lit("qq"), reverse(col("key0"))))
        .as("campus_id"))

    // Independent candidate count from per-length histograms: Σ over
    // (la, lb) passing the 2·min/(la+lb) ≥ cutoff bound of
    // nMiss(la)·nCms(lb). The enricher's misses are scraped keys absent
    // from the cms key set (exact stage removes them first).
    val cmsKeys = cms.select(col("campus_id").as("ck")).distinct()
    val miss = scraped.join(cmsKeys,
      scraped("campus_id") === cmsKeys("ck"), "left_anti")
    val mh = miss.groupBy(length(col("campus_id")).as("la"))
      .agg(count(lit(1)).as("na"))
    val ch = cms.groupBy(length(col("campus_id")).as("lb"))
      .agg(count(lit(1)).as("nb"))
    val bound = (lit(2.0) * least(col("la"), col("lb")) /
      (col("la") + col("lb"))) >= cutoff
    val candPairs = mh.crossJoin(ch).filter(bound)
      .agg(sum(col("na") * col("nb"))).head().getLong(0)
    val nMiss = miss.count()
    val naivePairs = nMiss * cmsN

    val t0 = System.nanoTime()
    val census = graft.enrich.RegistryEnricher.enrich(scraped, cms, cutoff)
      .groupBy(col("match_kind")).agg(count(lit(1)).as("n"))
      .collect().map(r => s"${r.getString(0)}=${r.getLong(1)}")
      .sorted.mkString(" ")
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"""{"scraped":$scrapedN,"cms":$cmsN,"cutoff":$cutoff,"misses":$nMiss,""" +
      f""""cand_pairs":$candPairs,"naive_pairs":$naivePairs,""" +
      f""""reduction":${naivePairs.toDouble / math.max(candPairs, 1)}%.1f,""" +
      f""""wall_sec":$wall%.2f,"census":"$census"}""")
    spark.stop()
  }
}
