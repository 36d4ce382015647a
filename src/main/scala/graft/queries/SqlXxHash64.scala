package graft.queries

/** Spark's XXH64 (seed 42 — the builtin `xxhash64`) for SHORT ASCII
  * strings, re-expressed as DuckDB SQL fragments so the SimHash gate can
  * be oracle-checked bit-exact. Unsigned 64-bit values ride as HUGEINTs
  * in [0, 2^64): adds/rotates are exact HUGEINT arithmetic mod 2^64,
  * multiplies split the variable into 32-bit halves ([[mul64]] — a
  * u64 × u64 product overflows even HUGEINT), and xor works on the two
  * 32-bit BIGINT halves ([[xor64]]).
  *
  * ONLY the < 32-byte path is generated (no 4-lane stripe loop): one
  * 8-byte block iff len = 8, one 4-byte block iff 4 ≤ len < 8, then
  * per-byte tail, then the avalanche. Callers MUST pair it with a loud
  * length/charset guard (`error(...)` when a token exceeds 8 bytes or
  * ASCII) — the simhash oracle does. Validated end-to-end: the gate's
  * 73 near-dup pairs match the engine bit-exact at sf0.01.
  */
private[queries] object SqlXxHash64 {

  private val M64 = "18446744073709551616" // 2^64
  val P1 = "11400714785074694791"
  val P2 = "14029467366897019727"
  val P3 = "1609587929392839161"
  val P4 = "9650029242287828579"
  val P5 = "2870177450012600261"

  /** (a * c) mod 2^64: 32-bit-half split keeps every product < 2^97,
    * inside HUGEINT range. `c` is a u64 constant literal. */
  def mul64(a: String, c: String): String =
    s"((($a) % 4294967296) * $c " +
      s"+ (((($a) // 4294967296) * $c) % 4294967296) * 4294967296) % $M64"

  def add64(a: String, b: String): String = s"(($a) + ($b)) % $M64"

  /** rotl64: the two shifted parts occupy disjoint bit ranges, so plain
    * + is the OR. */
  def rotl64(a: String, n: Int): String = {
    val lo = BigInt(2).pow(64 - n)
    s"((($a) % $lo) * ${BigInt(2).pow(n)} + ($a) // $lo)"
  }

  /** xor via 32-bit BIGINT halves (DuckDB xor is BIGINT-only). */
  def xor64(a: String, b: String): String =
    s"(CAST(xor(CAST(($a) // 4294967296 AS BIGINT), " +
      s"CAST(($b) // 4294967296 AS BIGINT)) AS HUGEINT) * 4294967296 " +
      s"+ CAST(xor(CAST(($a) % 4294967296 AS BIGINT), " +
      s"CAST(($b) % 4294967296 AS BIGINT)) AS HUGEINT))"

  def shr64(a: String, n: Int): String = s"(($a) // ${BigInt(2).pow(n)})"

  /** The 8-byte little-endian block over a HUGEINT byte list `bs`. */
  val block8: String =
    "bs[1] + bs[2]*256 + bs[3]*65536 + bs[4]*16777216" +
      " + bs[5]*4294967296 + bs[6]*1099511627776" +
      " + bs[7]*281474976710656 + bs[8]*72057594037927936"

  /** The 4-byte little-endian block over `bs`. */
  val block4: String = "bs[1] + bs[2]*256 + bs[3]*65536 + bs[4]*16777216"

  /** Tail-byte fold step over (h, k): h' = rotl11(h ⊕ k·P5) · P1. */
  val byteStep: String =
    mul64(rotl64(xor64("h", s"((k * $P5) % $M64)"), 11), P1)

  /** The full ≤8-byte hash as a CTE chain over `tk(t, n, bs)` (t the
    * string, n its HUGEINT length, bs its HUGEINT byte list), emitting
    * `hsh(t, h)` with h the u64 xxhash64(t, seed=42). Seed is baked:
    * 2870177450012600303 = (42 + P5) mod 2^64. */
  val hashCtes: String = {
    val step8 = add64(
      mul64(rotl64(xor64("h", mul64("kk", P1)), 27), P1), P4)
    val step4 = add64(
      mul64(rotl64(xor64("h", mul64(block4, P1)), 23), P2), P3)
    s"""s0 AS (SELECT t, n, bs, (2870177450012600303 + n) % $M64 AS h
       |  FROM tk),
       |s1 AS (SELECT t, n, bs,
       |    CASE WHEN n = 8 THEN $step8 ELSE h END AS h
       |  FROM (SELECT t, n, bs, h,
       |      CASE WHEN n = 8 THEN ${rotl64(mul64(block8, P2), 31)}
       |      ELSE CAST(0 AS HUGEINT) END AS kk
       |    FROM s0)),
       |s2 AS (SELECT t, n, bs,
       |    CASE WHEN n >= 4 AND n < 8 THEN $step4 ELSE h END AS h
       |  FROM s1),
       |s3 AS (SELECT t,
       |    list_reduce(list_prepend(h,
       |      CASE WHEN n = 8 THEN bs[9:]
       |           WHEN n >= 4 THEN bs[5:]
       |           ELSE bs END),
       |      (h, k) -> $byteStep) AS h
       |  FROM s2),
       |s4 AS (SELECT t, ${xor64("h", shr64("h", 33))} AS h FROM s3),
       |s5 AS (SELECT t, ${mul64("h", P2)} AS h FROM s4),
       |s6 AS (SELECT t, ${xor64("h", shr64("h", 29))} AS h FROM s5),
       |s7 AS (SELECT t, ${mul64("h", P3)} AS h FROM s6),
       |hsh AS MATERIALIZED (SELECT t, ${xor64("h", shr64("h", 32))} AS h
       |  FROM s7)""".stripMargin
  }
}
