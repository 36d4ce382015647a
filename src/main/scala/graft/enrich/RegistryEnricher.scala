package graft.enrich

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Registry build: scraped hospitals enriched against the CMS provider table
  * (hospital_enricher.py:117-186) — exact campus_id lookup (J1) with a fuzzy
  * SequenceMatcher fallback at cutoff 0.9 (J2), top-1 per scraped row.
  *
  * Scale shape: the exact stage is a broadcast hash join (CMS ≤ 50k rows by
  * the reference's own fetch cap). The fuzzy stage generates candidates via
  * an INVERTED-INDEX join on per-length-class signatures (deletion variants
  * for the sharp classes, pigeonhole L*-grams otherwise — proofs at the
  * stage-2 comments), then confirms with the exact ratio and takes top-1 per
  * source row as a min(struct) aggregate over (ok desc, ratio desc, cms key
  * asc), so the quadratic |misses|×|CMS| band cross product never
  * materializes. difflib's get_close_matches breaks
  * score ties by candidate order; we use the CMS key as the deterministic
  * stand-in (documented divergence only when two candidates tie EXACTLY at
  * the best score).
  */
object RegistryEnricher {

  val DefaultCutoff = 0.9

  /** Columns copied from the CMS side on a match
    * (hospital_enricher.py:160-164). */
  val EnrichedColumns: Seq[String] =
    Seq("cms_rating", "hospital_type", "county", "telephone_num", "cms_zip")

  /** Left: scraped rows with a `campus_id` key column. Right: CMS rows with
    * `campus_id` + EnrichedColumns. Returns left columns + EnrichedColumns
    * (null when unmatched) + `match_kind` (exact | fuzzy | none) +
    * `match_ratio` (1.0 exact, score for fuzzy, null none).
    *
    * NOTE: the hit/miss branches both descend from the exact join, so one
    * action scans the scraped side twice (the broadcast relation is reused).
    * For a very large scraped side, `.cache()` it before calling. */
  def enrich(scraped: DataFrame, cms: DataFrame,
      cutoff: Double = DefaultCutoff): DataFrame = {
    val cmsCols = EnrichedColumns.filter(cms.columns.contains)
    // Deterministic one-row-per-key CMS side: duplicate campus_id keys (real
    // after the lossy key normalization) must not fan scraped rows out. The
    // reference's dict-style index keeps one row; we keep the struct-min row
    // (deterministic under any partitioning, unlike dropDuplicates).
    val cmsSel = cms.select((col("campus_id").as("__cms_key") +:
      cmsCols.map(col)): _*)
      .groupBy(col("__cms_key"))
      .agg(min(struct(cmsCols.map(col): _*)).as("__r"))
      .select((col("__cms_key") +: cmsCols.map(c => col(s"__r.$c").as(c))): _*)

    // Stage 1 — exact broadcast hash join.
    val exact = scraped.join(broadcast(cmsSel),
      scraped("campus_id") === cmsSel("__cms_key"), "left")
    val hit = exact.filter(col("__cms_key").isNotNull)
      .withColumn("match_kind", lit("exact"))
      .withColumn("match_ratio", lit(1.0))
    // Misses inherit the (often single-partition) scan layout but fan out
    // into |misses|×|CMS| ratio evaluations — spread them first.
    // PERSISTED (not just shared): __srcid is monotonically_increasing_id,
    // which is only stable within one materialization — the gram branch
    // and the confirm join below both key on it, so an unpinned recompute
    // could hand the two branches different ids and silently mispair.
    val miss = graft.core.Memo.ownedPersist(
      exact.filter(col("__cms_key").isNull)
        .drop("__cms_key" +: cmsCols: _*)
        .repartition(scraped.sparkSession.sparkContext.defaultParallelism)
        .withColumn("__srcid", monotonically_increasing_id()))

    // Stage 2 — fuzzy fallback on misses only: INVERTED-INDEX candidate
    // join + exact confirm, replacing the length-banded cross product
    // (which stayed |misses|×|CMS| within each band: ~87× wall at the 10×
    // canary, reps² by construction).
    //
    // The pigeonhole theorem behind the index: difflib's ratio is
    // 2M/(la+lb) where M — the total size of its matching blocks — is the
    // size of SOME common subsequence, hence M ≤ LCS(a,b). ratio ≥ c
    // therefore forces LCS ≥ mc := ⌈c·(la+lb)/2⌉, leaving at most
    // u := la+lb−2·mc unmatched characters; the u unmatched characters
    // split the common subsequence into at most u+1 contiguous blocks, so
    // some SHARED CONTIGUOUS SUBSTRING has length ≥ L* := ⌈mc/(u+1)⌉.
    // Joining on L*-grams is thus a sound prefilter (no ≥cutoff pair is
    // lost); the exact seqRatioAtLeast confirm decides. At high cutoffs
    // L* is large and the index is sharp (the gate's 12-char keys at
    // c = 0.9 give L* = 6 → random collisions ~16⁻⁶); at low cutoffs L*
    // degrades toward 1-grams — still correct, weaker pruning.
    //
    // Float care: mc is computed as ceil(product − 1e-9) so binary
    // rounding can never push the ceiling ABOVE the exact value
    // (overstating mc would prune true pairs — unsound); understating by
    // 1 in razor-edge cases only weakens pruning. L* from mc is pure
    // integer arithmetic. A pair with mc > min(la,lb) cannot reach the
    // cutoff at all — u < 0 encodes it as an unreachable gram length.
    def mcOf(la: Column, lb: Column): Column =
      ceil((la + lb).cast("double") * lit(cutoff) / 2.0 - lit(1e-9))
        .cast("long")
    def lstarOf(la: Column, lb: Column): Column = {
      val mc = mcOf(la, lb)
      val u = (la + lb).cast("long") - mc * 2L
      when(u >= 0L, greatest(
          floor((mc + u).cast("double") / (u + 1L).cast("double")).cast("int"),
          lit(1)))
        .otherwise(lit(Int.MaxValue))
    }
    def gramsOf(key: Column, gramLen: Column): Column =
      when(key.isNotNull && length(key) >= gramLen,
        array_distinct(transform(
          sequence(lit(1), length(key) - gramLen + lit(1)),
          i => key.substr(i, gramLen))))
        .otherwise(array().cast("array<string>"))
    // Deletion-variant signatures for the SHARP classes (the SymSpell /
    // FastSS device): when a class allows at most ONE unmatched char per
    // side (Da ≤ 1 and Db ≤ 1), deleting each side's unmatched chars
    // leaves the matched subsequence ITSELF on both sides — an equal
    // string of length M. Joining delete-{0,1} variants is therefore a
    // complete candidate generator for those classes, with a signature
    // as long as the key (collision-free on hashed ids) where the gram
    // fallback's L* would collapse to 4 chars and pay linear bucket
    // density — the residual quadratic decoded at the 100× canary.
    def delVariantsOf(key: Column, maxDel: Column): Column =
      when(key.isNull, array().cast("array<string>"))
        .when(maxDel === 0, array(key))
        .otherwise(array_distinct(concat(array(key),
          transform(sequence(lit(1), length(key)),
            i => concat(key.substr(lit(1), i - 1),
              key.substr(i + 1, length(key)))))))
    // Per-class signature set for one side: the class is (la, lb); the
    // side's own deletion budget is Da = la − mc for the miss side,
    // Db = lb − mc for the CMS side. Tags keep the two mechanisms'
    // keyspaces disjoint; a class with a negative budget cannot reach
    // the cutoff at all (mc exceeds one key's length) and emits nothing.
    def sigsOf(key: Column, la: Column, lb: Column,
        ownIsMissSide: Boolean): Column = {
      val mc = mcOf(la, lb)
      val da = la.cast("long") - mc
      val db = lb.cast("long") - mc
      val own = if (ownIsMissSide) da else db
      when(da < 0L || db < 0L, array().cast("array<string>"))
        .when(da <= 1L && db <= 1L,
          transform(delVariantsOf(key, own), s => concat(lit("D:"), s)))
        .otherwise(
          transform(gramsOf(key, lstarOf(la, lb)), s => concat(lit("G:"), s)))
    }
    // Both sides explode into per-(la, lb) CLASS signature rows — the
    // class lengths ride the join key, so each class decides its own
    // mechanism consistently on both sides. Bands (±1 widened) come from
    // the ratio's own length bound: 2·min(la,lb)/(la+lb) ≥ c restricts
    // the partner length to [len·c/(2−c), len·(2−c)/c].
    def bandOf(len: Column): Column = sequence(
      greatest(floor(len * lit(cutoff) / (lit(2.0) - cutoff)).cast("int")
        - 1, lit(1)),
      ceil(len * (lit(2.0) - cutoff) / lit(cutoff)).cast("int") + 1)
    val cmsSigs = cmsSel.select(col("__cms_key"))
      .withColumn("__lb", length(col("__cms_key")))
      .withColumn("__la", explode(bandOf(col("__lb"))))
      .select(col("__cms_key"), col("__la"), col("__lb"),
        explode(sigsOf(col("__cms_key"), col("__la"), col("__lb"),
          ownIsMissSide = false)).as("__sig"))
    // The miss side only emits classes whose lb actually EXISTS on the
    // CMS side: the distinct CMS key lengths collapse to ONE array row
    // (at most a few dozen values under the reference's 50k fetch cap)
    // broadcast onto the misses, and pruning dead classes cuts the
    // signature explode volume by the dead-band factor — at the 100×
    // canary the CMS histogram is a single length, so this drops ~4/5
    // of the exploded rows before the shuffle. A 1-row broadcast rather
    // than a driver collect: enrich() stays build-lazy like every other
    // query builder (no Spark job until the first action).
    val cmsLenArr = cmsSel
      .select(length(col("__cms_key")).as("l")).na.drop()
      .agg(sort_array(collect_set(col("l"))).as("__cms_lens"))
    val missSigs = miss.select(col("__srcid"), col("campus_id"))
      .crossJoin(broadcast(cmsLenArr))
      .withColumn("__la", length(col("campus_id")))
      .withColumn("__lb", explode(array_intersect(bandOf(col("__la")),
        col("__cms_lens"))))
      .select(col("__srcid"), col("__la"), col("__lb"),
        explode(sigsOf(col("campus_id"), col("__la"), col("__lb"),
          ownIsMissSide = true)).as("__sig"))
    // The candidate join is keyed (la, lb, signature) — the
    // inverted-index shape (Dedup's shingle joins): no broadcast forced,
    // so at the 50k production cap the exploded index shuffles instead
    // of blowing the driver. AQE broadcasts it when it is actually small.
    val candidates = missSigs.join(cmsSigs, Seq("__la", "__lb", "__sig"))
      .select(col("__srcid"), col("__cms_key")).distinct()
    // Exact confirm + attribute re-attach; LEFT join back onto the miss
    // rows so zero-candidate misses still emit their 'none' row. Pairs
    // the index pruned are all sub-cutoff: they could never outrank an
    // __ok row in the window, and a miss whose candidates are ALL
    // sub-cutoff emits the identical nulled 'none' row either way —
    // output is bit-identical to the banded cross product's.
    val scored = miss.join(
        candidates.join(broadcast(cmsSel), Seq("__cms_key")),
        Seq("__srcid"), "left")
      .withColumn("__ratio",
        when(col("__cms_key").isNotNull,
          SequenceMatcherRatio.seqRatioAtLeast(
            col("campus_id"), col("__cms_key"), cutoff)))
      .withColumn("__ok", col("__ratio") >= cutoff)
    // Top-1 per SOURCE ROW (__srcid, not the key: duplicate scraped keys
    // each keep their own match row) as one min(struct) hash aggregate —
    // the same ordering the ranking window expressed ((__ok desc,
    // __ratio desc, __cms_key asc) ≡ lexicographic min of (!__ok,
    // −__ratio, __cms_key)), but map-side combinable and with no
    // per-partition sort. Zero-candidate rows are their own group, so
    // the null key fields never compare against anything.
    val payload = struct(
      (scraped.columns.map(col) ++ cmsCols.map(col) :+
        col("__ratio") :+ col("__ok")): _*)
    val fuzzy = scored
      .groupBy(col("__srcid"))
      .agg(min(struct(
        when(col("__ok"), 0).otherwise(1).as("k1"),
        (-coalesce(col("__ratio"), lit(-1.0))).as("k2"),
        col("__cms_key").as("k3"),
        payload.as("p"))).as("m"))
      .selectExpr("m.p.*")
      .withColumn("match_kind", when(col("__ok"), lit("fuzzy")).otherwise(lit("none")))
      .withColumn("match_ratio", when(col("__ok"), col("__ratio")))
    val nulled = cmsCols.foldLeft(fuzzy)((d, c) =>
      d.withColumn(c, when(col("__ok"), col(c))))

    val outCols: Seq[Column] =
      (scraped.columns.map(col) ++ cmsCols.map(col) :+
        col("match_kind") :+ col("match_ratio")).toSeq
    hit.select(outCols: _*).union(nulled.select(outCols: _*))
  }

  /** The registry's full 30-column projection with ""-fill for anything the
    * enrichment didn't produce (hospital_enricher.py:174-185) — the sink
    * shape of the §3.2 registry-build trace. */
  val RegistryColumns: Seq[String] = Seq(
    "hospital_name", "campus_id", "healthcare_system", "hospital_type",
    "city", "county", "metro_area", "state", "hospital_address", "zip_code",
    "telephone_num", "latitude", "longitude", "cms_rating", "leapfrog_grade",
    "leapfrog_grade_term", "leapfrog_grade_url", "last_updated_on", "version",
    "etl_status", "processed_by", "last_processed_on", "issues_encountered",
    "transparency_score", "raw_filename", "file_format", "structure",
    "download_url", "contact_num", "email_id")

  def toRegistryProjection(enriched: DataFrame): DataFrame = {
    val cols = RegistryColumns.map {
      case "zip_code" if enriched.columns.contains("cms_zip") =>
        coalesce(Seq("zip_code").filter(enriched.columns.contains).map(col) :+
          col("cms_zip") :+ lit(""): _*).as("zip_code")
      case c if enriched.columns.contains(c) => coalesce(col(c), lit("")).as(c)
      case c => lit("").as(c)
    }
    enriched.select(cols: _*)
  }
}
