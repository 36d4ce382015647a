package graft.queries

/** Spark's Murmur3_x86_32-over-bytes re-expressed as DuckDB SQL
  * fragments, so sketch gates whose slot hash is murmur (Count-Min,
  * MinHash) can be oracle-checked bit-exact instead of rows-only.
  *
  * Spark's `Murmur3_x86_32.hashUnsafeBytes` consumes 4-byte
  * little-endian blocks and then feeds each REMAINING byte through the
  * same mixK1/mixH1 as a block (unlike standard murmur3's tail), then
  * applies fmix(h, len). Every step is 32-bit wrapping arithmetic:
  * values ride as 0..2^32−1 BIGINTs masked after each op, with
  * multiplies routed through HUGEINT ([[mul32]]) because a 32-bit value
  * times a 32-bit constant exceeds INT64. The final signed-int view is
  * `CASE WHEN h >= 2^31 THEN h − 2^32 ELSE h END`.
  *
  * Validated against the engine: profile_cm_topk and
  * minhash_nation_orderdates both hash-exact vs live Spark dumps.
  */
private[queries] object SqlMurmur {

  /** `(a * c) mod 2^32`, overflow-safe via HUGEINT. */
  def mul32(a: String, c: Long): String =
    s"CAST((CAST($a AS HUGEINT) * $c) % 4294967296 AS BIGINT)"

  /** 32-bit rotate-left on a masked BIGINT. */
  def rotl32(v: String, r: Int): String =
    s"((($v) << $r) | (($v) >> ${32 - r})) & 4294967295"

  /** One murmur3 mix step as a DuckDB lambda body over (h, k):
    * h' = mixH1(h, mixK1(k)). Use inside
    * `list_reduce(list_prepend(seed, items), (h, k) -> ...)`. */
  val mixStep: String = {
    val mk1 = mul32("k", 3432918353L)                      // k * c1
    val kk = mul32(s"(${rotl32(mk1, 15)})", 461845907L)    // rotl15 * c2
    val x = s"xor(h, $kk)"
    s"(${mul32(s"((${rotl32(x, 13)}))", 5L)} + 3864292196) % 4294967296"
  }

  /** The per-string item list for the fold: 4-byte LE blocks then tail
    * bytes, over a VARCHAR column expression `k` (ASCII contents — the
    * gates hash digit strings and ISO dates). */
  val itemsOfK: String =
    """list_concat(
      |    list_transform(range(0, length(k) // 4), j ->
      |      CAST(ascii(substr(k, CAST(4*j+1 AS INT), 1))
      |        + 256 * ascii(substr(k, CAST(4*j+2 AS INT), 1))
      |        + 65536 * ascii(substr(k, CAST(4*j+3 AS INT), 1))
      |        + 16777216 * ascii(substr(k, CAST(4*j+4 AS INT), 1))
      |        AS BIGINT)),
      |    list_transform(range(length(k) // 4 * 4, length(k)), i ->
      |      CAST(ascii(substr(k, CAST(i+1 AS INT), 1)) AS BIGINT)))"""
      .stripMargin

  /** fmix + signed-int view as three chained CTEs over a relation
    * `raw(…, h0, n)` (h0 = the fold result, n = byte length); emits
    * `f3(…, hv)` with hv the SIGNED 32-bit hash as BIGINT. `carry` is
    * the comma-joined passthrough columns (e.g. "k, d"). */
  def fmixCtes(carry: String): String = {
    val m1 = mul32("h", 2246822507L)
    val m2 = mul32("h", 3266489909L)
    s"""f1 AS (SELECT $carry, xor(xor(h0, n), xor(h0, n) >> 16) AS h
       |  FROM raw),
       |f2 AS (SELECT $carry, xor($m1, ($m1) >> 13) AS h FROM f1),
       |f3 AS (SELECT $carry,
       |    CASE WHEN xor($m2, ($m2) >> 16) >= 2147483648
       |      THEN xor($m2, ($m2) >> 16) - 4294967296
       |      ELSE xor($m2, ($m2) >> 16) END AS hv
       |  FROM f2)""".stripMargin
  }
}
