package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Randomized parity for the er_nearest_name exact-name collapse
  * (EnrichQueries): the distinct-name argmin + min1/min2 expansion must
  * equal the naive record-level pair argmin on duplication-heavy
  * catalogs — the collapse's whole point is that duplicates (m ≥ 2)
  * take the within-group branch while unique names take the cross-name
  * branch, and the tie-breaks (distance asc, partkey asc) must survive
  * both. Seeded corpora mix heavy duplicates, near-names and loners. */
class NearestNameSpec extends SparkSpec {
  import spark.implicits._

  test("er_nearest_name matches the naive pair argmin on a randomized " +
      "duplication-heavy catalog") {
    val rnd = new scala.util.Random(424213)
    val brands = Seq("B1", "B2", "B3")
    val baseNames = (1 to 8).map(i => s"part ${"abcdef".charAt(rnd.nextInt(6))}$i")
    val rows = (1L to 120L).map { k =>
      val brand = brands(rnd.nextInt(brands.length))
      val name = rnd.nextInt(10) match {
        case 0 => baseNames(rnd.nextInt(baseNames.length)) + " x" // near-name
        case 1 => s"loner ${k}"                                   // unique
        case _ => baseNames(rnd.nextInt(baseNames.length))        // duplicate-heavy
      }
      (k, brand, name)
    }
    val dir = java.nio.file.Files.createTempDirectory("nn_spec").toString
    rows.toDF("p_partkey", "p_brand", "p_name")
      .write.mode("overwrite").parquet(s"$dir/part.parquet")

    val got = EnrichQueries.queries("er_nearest_name")(spark, dir)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap

    // Naive truth: all same-brand pairs, argmin by (levenshtein, partkey).
    val p = rows.toDF("k", "b", "n")
    val naive = p.select(col("b"), col("k").as("pa"), col("n").as("na"))
      .join(p.select(col("b"), col("k").as("pb"), col("n").as("nb")), Seq("b"))
      .filter(col("pa") =!= col("pb"))
      .groupBy(col("pa"))
      .agg(min(struct(levenshtein(col("na"), col("nb")).as("d"),
        col("pb"))).as("m"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getStruct(1).getLong(1), r.getStruct(1).getInt(0))).toMap
    assert(got == naive)
  }
}
