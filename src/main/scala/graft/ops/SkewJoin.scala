package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the structural fix when one join key
  * holds a disproportionate share of the fact rows and a plain shuffle join
  * puts that key's entire volume in one task.
  *
  * Shape: the (small-ish) dimension side is replicated `salts` times with a
  * salt column; each fact row picks ONE salt pseudo-randomly from a
  * high-cardinality column; the join key becomes (key, salt), so a hot key's
  * rows spread over `salts` tasks instead of one. The output is provably
  * identical to the unsalted join — every fact row still meets exactly the
  * dimension rows with its key (once, at its chosen salt) — which is what
  * the oracle gate checks.
  *
  * When to reach for it over AQE skew-join: AQE only splits skewed
  * SHUFFLE-join partitions it can observe post-shuffle; salting also covers
  * aggregate-under-join shapes, deterministic-layout requirements, and
  * engines/paths where AQE is off. Cost: dimension side × salts (keep the
  * dimension broadcast-small or salts modest).
  */
object SkewJoin {

  /** Inner equi-join `facts.key = dim.key`, salted `salts` ways. `spreadCol`
    * is a high-cardinality fact column (ids work well) whose hash picks the
    * fact row's salt; it only affects WHICH task a row lands in, never the
    * join result. */
  def saltedJoin(facts: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, spreadCol: String, salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    require(!facts.columns.contains("__salt") && !dim.columns.contains("__salt"),
      "saltedJoin uses an internal __salt column; rename the existing one")
    val overlap = facts.columns.toSet.intersect(dim.columns.toSet)
    require(overlap.isEmpty,
      s"saltedJoin column collision: ${overlap.mkString(", ")}; rename first " +
        "(the joined output would carry ambiguous duplicate columns)")
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val saltedFacts = facts.withColumn("__salt",
      pmod(xxhash64(col(spreadCol)), lit(salts)).cast("int"))
    saltedFacts
      .join(saltedDim, saltedFacts(factKey) === saltedDim(dimKey) &&
        saltedFacts("__salt") === saltedDim("__salt"))
      .drop("__salt")
  }
}
