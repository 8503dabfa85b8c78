package graft.ops

/** Engine-portable hash primitives shared by the dedup family and the
  * training-pipeline sampling/split operators.
  *
  * The only hash both Spark and DuckDB compute identically is md5 over a
  * string (lowercase hex in both). To get an *integer* out of it portably
  * (DuckDB has no conv()), we expand the first 12 hex digits positionally:
  * digit value = position in '0123456789abcdef' minus 1, via `instr` (Spark)
  * / `strpos` (DuckDB) — identical 1-based semantics. 12 digits < 2^48, so
  * products with 30-bit multipliers stay under 2^63 in both engines.
  */
private[ops] object PortableHash {

  /** Largest 32-bit prime — the universal-hash modulus. */
  val P = 4294967291L

  /** SQL expression: first 12 hex digits of digest column/expr `m` → integer
    * in [0, P). `posFn` is `instr` (Spark) / `strpos` (DuckDB). Reference
    * `m` by name (a materialized column), not an inline md5 call — the
    * expression substrings it 12 times. */
  def hexHeadToLong(m: String, posFn: String): String = {
    val terms = (1 to 12).map { i =>
      s"($posFn('0123456789abcdef', substring($m, $i, 1)) - 1) * CAST(${1L << (4 * (12 - i))} AS BIGINT)"
    }
    s"(${terms.mkString(" + ")}) % $P"
  }

  /** Deterministic [0, 100) bucket of digest column `m` — the gate used for
    * split assignment and rate-based sampling. */
  def pctBucket(m: String, posFn: String): String =
    s"(${hexHeadToLong(m, posFn)}) % 100"
}
