package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine text/hash primitives for the LLM-data-pipeline operators.
  *
  * Every primitive has a Spark `Column` form and a DuckDB SQL form computing
  * the IDENTICAL value, so MinHash/SimHash/fingerprint queries can be
  * oracle-checked exactly:
  *
  *  - words:     split on runs of whitespace (after trim)
  *  - h32:       first 8 hex chars of md5 as a non-negative BIGINT — the
  *               only 32-bit string hash both engines share bit-for-bit
  *               (Spark's `hash`/`xxhash64` and DuckDB's `hash` differ)
  *  - shingles:  k-word grams (k=3), space-joined
  *  - minhash:   min over shingle hashes of (a*h + b) mod P per hash fn
  *  - hround:    deterministic half-up rounding floor(x*10^n + 0.5)/10^n —
  *               a chain of IEEE ops bit-identical on both engines (see
  *               Num.avg2 for why bround/round_even can diverge)
  *
  * All are pure Catalyst expressions (no UDFs) → whole-stage codegen.
  */
object Text {

  /** Mersenne prime 2^31 - 1: modulus for the minhash/fingerprint family. */
  val P: Long = 2147483647L

  /** MinHash coefficients: signature length 12 = 4 bands x 3 rows.
    * a = first 12 odd primes, b_j = 7j + 1 (arbitrary but fixed; the same
    * constants are baked into the DuckDB oracle SQL).
    */
  val MinhashA: Seq[Int] = Seq(3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41)
  def minhashB(j: Int): Int = 7 * j + 1
  val Bands = 4
  val Rows  = 3
  val SigLen: Int = Bands * Rows

  // ---- Spark side -----------------------------------------------------

  /** Whitespace tokenization (the `text` column → array<string>). */
  def words(c: Column): Column = split(trim(c), "\\s+")

  /** 32-bit md5-prefix hash of a string, as BIGINT in [0, 2^32). */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Driver/executor-JVM twin of [[h32]]/[[sqlH32]]: first 4 md5 bytes,
    * big-endian unsigned — bit-identical to the Column and DuckDB forms,
    * for code that hashes OUTSIDE a Spark plan (the reservoir Aggregator).
    */
  def jvmH32(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** k-word shingles of a words array COLUMN NAME (requires size >= k).
    * transform-with-sequence keeps this inside codegen; sequence is safe
    * because callers filter size(w) >= k first (Spark's sequence(1, 0)
    * would DESCEND, unlike DuckDB's empty generate_series).
    */
  def shingles(w: String, k: Int = 3): Column =
    expr(s"transform(sequence(1, size($w) - ${k - 1}), " +
      s"i -> concat_ws(' ', slice($w, i, $k)))")

  /** Deterministic half-up rounding to n dp: floor(x*10^n + 0.5)/10^n. */
  def hround(c: Column, n: Int): Column = {
    val f = math.pow(10.0, n)
    floor(c * lit(f) + lit(0.5)) / lit(f)
  }

  // ---- DuckDB oracle side ---------------------------------------------

  def sqlWords(x: String): String =
    s"string_split_regex(trim($x), '\\s+')"

  def sqlH32(x: String): String =
    s"CAST(('0x' || substr(md5($x), 1, 8)) AS UBIGINT)::BIGINT"

  /** k-word shingles via a DuckDB list comprehension (1-based, inclusive
    * slice bounds: w[i:i+k-1] is k elements).
    */
  def sqlShingles(w: String, k: Int = 3): String =
    s"[array_to_string($w[i:i+${k - 1}], ' ') " +
      s"FOR i IN generate_series(1, greatest(len($w)-${k - 1}, 0))]"

  def sqlHround(x: String, n: Int): String = {
    val f = "1" + "0" * n + ".0"
    s"floor(($x) * $f + 0.5) / $f"
  }
}
