package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pluggable base hash for the blocking/fingerprint kernels ([[Dedup]]'s
  * MinHash/SimHash families, [[Similarity]]'s sign-random-projection).
  *
  * The production default is [[BaseHash.Xx]] — Spark's codegen'd
  * `xxhash64`, the fastest option — but xxhash64 exists in no other SQL
  * engine, which made every query built on it verifiable only by
  * weaker rows-only checks. [[BaseHash.Md5]] trades a constant factor of
  * per-shingle hash cost for *engine portability*: the first 15 hex chars
  * of the (universally implemented) MD5 digest, parsed as a 60-bit
  * integer, reproduce bit-for-bit in DuckDB
  * (`CAST(concat('0x', substr(md5(s), 1, 15)) AS BIGINT)`), PostgreSQL,
  * or any engine with `md5` + hex parsing — so the ENTIRE downstream
  * pipeline (permutation arithmetic, banding, bucket joins, Jaccard /
  * Hamming verification) becomes exactly oracle-checkable, not just
  * "returns rows". Everything past the base hash is shared between the
  * two variants; the choice only swaps the leaf hash expressions.
  *
  * 60 bits (not 64) is deliberate: it keeps every derived value
  * non-negative and below 2^60, so `1 << bit` never overflows in engines
  * that check shift overflow (DuckDB errors on `1::BIGINT << 63`), and
  * the SimHash bit votes confine themselves to bits 0-59 on both sides.
  */
sealed trait BaseHash {
  /** Hash of one string value (shingle / token). Xx: full 64 bits
    * (signed); Md5: 60 bits (always non-negative). */
  def full(c: Column): Column

  /** 31-bit reduction — a safe operand for the mod-(2^31-1) minhash
    * permutation arithmetic (products stay under 2^62, ANSI-safe). */
  final def bits31(c: Column): Column = full(c).bitwiseAND(lit(0x7fffffffL))

  /** Band hash of a (long-array) signature slice, salted by the band
    * index so identical slices in different bands bucket independently. */
  def band(slice: Column, bandIx: Column): Column

  /** ±1 hyperplane selector for (plane, dimension): 0 → +1, 1 → -1.
    * Deterministic and storage-free — no hyperplane matrix to ship. */
  def planeBit(plane: Column, dim: Column): Column

  /** Whether the native codegen'd kernels that EMBED xxhash64
    * ([[graft.functions.SignProjection]]) may serve this variant. The
    * hash-agnostic kernels (minhash_sig, simhash64,
    * sorted_intersect_count) consume pre-hashed arrays and serve both. */
  def native: Boolean
}

object BaseHash {

  /** Production default: xxhash64 — codegen'd, no string materialization
    * beyond the shingle itself. Not reproducible outside Spark, so
    * queries built on it get rows-only oracle checks. */
  case object Xx extends BaseHash {
    def full(c: Column): Column = xxhash64(c)
    def band(slice: Column, bandIx: Column): Column = xxhash64(slice, bandIx)
    def planeBit(plane: Column, dim: Column): Column =
      pmod(xxhash64(plane, dim), lit(2))
    def native: Boolean = true
  }

  /** Engine-portable 60-bit hash: `conv(substr(md5(s), 1, 15), 16, 10)`.
    * Several times the per-shingle cost of xxhash64 (digest + hex
    * round-trip), so the hot production path should stay on [[Xx]]; use
    * this where external verifiability is worth the constant factor —
    * the DuckDB-oracled gate queries, cross-engine reproduction of a
    * dedup run, or auditing a pipeline from another stack. On a session
    * with the engine functions registered, the hash computes via the
    * native [[graft.functions.Md5Bits60]] kernel (digest bytes → long,
    * no hex round-trip — bit-identical by construction, parity pinned
    * in BaseHashSpec); the pure-Column form is the registration-free
    * fallback AND the cross-engine reference. */
  case object Md5 extends BaseHash {
    private def md5long(c: Column): Column =
      if (graft.functions.GraftFunctions
          .registeredOnActiveSession("md5_bits60"))
        call_function("md5_bits60", c.cast("string"))
      else
        conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")
    def full(c: Column): Column = md5long(c)
    def band(slice: Column, bandIx: Column): Column =
      md5long(concat(bandIx.cast("string"), lit(":"),
        concat_ws(",", transform(slice, x => x.cast("string")))))
    def planeBit(plane: Column, dim: Column): Column =
      pmod(md5long(concat(plane.cast("string"), lit(":"),
        dim.cast("string"))), lit(2))
    def native: Boolean = false
  }
}
