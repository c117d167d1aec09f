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

  /** Re-hash an already-hashed long with a compile-time seed — the
    * minhash permutation step (hashes 8 bytes / a short decimal string,
    * not the original document text).
    */
  def rehash(h: Column, seed: Int): Column

  /** Hash a string column together with a salt column (e.g. a band id,
    * so equal band contents in different bands don't collide).
    */
  def hashWithSalt(c: Column, salt: Column): Column
}

/** Production default: xxhash64 (codegen'd, seeds natively). */
case object XxHash64Family extends HashFamily {
  def hash(c: Column): Column = xxhash64(c)
  def rehash(h: Column, seed: Int): Column = xxhash64(h, lit(seed))
  def hashWithSalt(c: Column, salt: Column): Column = xxhash64(c, salt)
}

/** Cross-engine md5-derived hash; values in [0, 2^60). The decimal
  * renderings used for rehash/salt (`CAST(x AS VARCHAR)`) are identical
  * in Spark and DuckDB, so derived hashes match too.
  */
case object Md5Family extends HashFamily {
  def hash(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("long")
  def rehash(h: Column, seed: Int): Column =
    hash(concat(h.cast("string"), lit("_" + seed)))
  def hashWithSalt(c: Column, salt: Column): Column =
    hash(concat(c, lit("_"), salt.cast("string")))
}
