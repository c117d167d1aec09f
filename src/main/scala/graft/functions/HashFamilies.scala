package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable 64-bit hash family for the hash-based dedup / fingerprint
  * operators (MinHash, SimHash, content fingerprints).
  *
  * Two members:
  *  - [[XxHash64Family]] — Spark's codegen'd xxhash64; the production
  *    default (fastest, but engine-specific output).
  *  - [[Md5Family]] — a 60-bit hash from md5's leading 15 hex chars.
  *    Costlier than xxhash64, but bit-identical in any engine with an
  *    md5 function — DuckDB:
  *    `CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)` — which is
  *    what lets the driver's DuckDB oracle hash-verify the minhash /
  *    simhash / fingerprint queries end-to-end instead of a weaker
  *    rows-only check. 15 hex chars keep the value non-negative and
  *    inside a signed 64-bit range in both engines.
  */
sealed trait HashFamily {
  /** Hash a string column to a long. */
  def hash(c: Column): Column

  /** A second, independent hash of the string (for double hashing). */
  def hash2(c: Column): Column

  /** Re-hash an already-hashed long with a compile-time seed — the
    * minhash permutation step (hashes 8 bytes / a short decimal string,
    * not the original document text).
    */
  def rehash(h: Column, seed: Int): Column

  /** Hash a string column together with a salt column (e.g. a band id,
    * so equal band contents in different bands don't collide).
    */
  def hashWithSalt(c: Column, salt: Column): Column

  /** Minhash permutation `p` from TWO bound base hashes —
    * Kirsch-Mitzenmacher double hashing, g_p(x) = h1(x) + p·h2(x):
    * after the two base hashes are bound once, every extra permutation
    * is plain arithmetic, not another string hash. Default delegates to
    * `rehash` for families whose seeded rehash is already cheap.
    */
  def permute(h1: Column, h2: Column, p: Int): Column = rehash(h1, p)

  /** Whether `permute` actually reads h2 — callers skip binding the
    * second base-hash array when it doesn't.
    */
  def needsSecondHash: Boolean = false
}

/** Production default: xxhash64 (codegen'd, seeds natively — `permute`
  * keeps the native seeded rehash and ignores h2).
  */
case object XxHash64Family extends HashFamily {
  def hash(c: Column): Column = xxhash64(c)
  def hash2(c: Column): Column = xxhash64(c, lit(0x9e3779b9L))
  def rehash(h: Column, seed: Int): Column = xxhash64(h, lit(seed))
  def hashWithSalt(c: Column, salt: Column): Column = xxhash64(c, salt)
}

/** Cross-engine md5-derived hash; values in [0, 2^60). The decimal
  * renderings used for rehash/salt (`CAST(x AS VARCHAR)`) are identical
  * in Spark and DuckDB, so derived hashes match too.
  *
  * `permute` works in a 2^50 ring so `h1 + p·h2` stays far from signed
  * overflow (ANSI mode throws on wrap): max is 2^50 + 15·2^50 < 2^55.
  * DuckDB rendering: `((h1 % B) + p * (h2 % B)) % B`, B = 2^50.
  */
case object Md5Family extends HashFamily {
  /** Modulus of the permutation arithmetic (public: the fused
    * MinhashSignatureExpr is parameterized on it).
    */
  val Ring: Long = 1L << 50
  def hash(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
  def hash2(c: Column): Column = hash(concat(lit("2_"), c))
  def rehash(h: Column, seed: Int): Column =
    hash(concat(h.cast("string"), lit("_" + seed)))
  def hashWithSalt(c: Column, salt: Column): Column =
    hash(concat(c, lit("_"), salt.cast("string")))
  override def permute(h1: Column, h2: Column, p: Int): Column =
    pmod(pmod(h1, lit(Ring)) + lit(p.toLong) * pmod(h2, lit(Ring)), lit(Ring))
  override def needsSecondHash: Boolean = true
}
