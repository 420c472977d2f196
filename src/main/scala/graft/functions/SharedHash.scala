package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic cross-engine hashing primitives.
  *
  * The correctness gate compares Spark results against DuckDB running the
  * oracle SQL, so every hash used in dedup/similarity operators must be
  * computable — bit-identically — in both engines. Native hashes differ
  * (Spark xxhash64 vs DuckDB's), so we derive integers from `md5` hex
  * (identical everywhere): take the first 15 hex chars (60 bits, fits a
  * signed 64-bit int), parse base-16.
  *
  *   Spark:  conv(substring(md5(x), 1, 15), 16, 10)::BIGINT
  *   DuckDB: ('0x' || substring(md5(x), 1, 15))::BIGINT
  *
  * At 100 TB, md5-per-shingle is ~2× the cost of xxhash64 but still cheap
  * relative to the shuffle it feeds; swap to xxhash64 when oracle parity
  * stops being a constraint.
  */
object SharedHash {
  /** Mersenne prime 2^31 − 1: modulus for the minhash permutation family. */
  val P31: Long = 2147483647L

  /** 60-bit integer hash of a string column (cross-engine deterministic). */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** A second, independent 60-bit word from the SAME md5 (hex chars
    * 16-30) — doubles usable hash bits at zero extra hashing cost. */
  def hash60b(c: Column): Column =
    conv(substring(md5(c), 16, 15), 16, 10).cast("long")

  /** Hash reduced into the [0, P31) permutation domain. */
  def h31(c: Column): Column = hash60(c) % P31

  /** DuckDB SQL for the same value. */
  def hash60Sql(e: String): String = s"('0x' || substring(md5($e), 1, 15))::BIGINT"
  def hash60bSql(e: String): String = s"('0x' || substring(md5($e), 16, 15))::BIGINT"
  def h31Sql(e: String): String = s"(${hash60Sql(e)} % ${P31})"

  /** Minhash permutation family: perm_i(h) = (a_i·h + b_i) mod P31.
    * a_i ≤ ~1.3M so a_i·h < 2^62 — no 64-bit overflow on either engine.
    * Constants are generated HERE and spliced into both the Spark plan and
    * the oracle SQL text, so the two sides cannot drift.
    */
  val NumHashes = 16
  def permA(i: Int): Long = (2L * i + 1L) * 40503L + 1L
  def permB(i: Int): Long = i * 7919L + 13L

  def perm(i: Int, h: Column): Column = (h * permA(i) + permB(i)) % P31
  def permSql(i: Int, e: String): String = s"(($e * ${permA(i)} + ${permB(i)}) % ${P31})"
}
