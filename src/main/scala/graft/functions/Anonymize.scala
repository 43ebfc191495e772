package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Anonymization primitives for PII-safe exports and aggregates: prefix-
  * truncated IPs (the standard k-anonymity move for address columns —
  * dnsdist/PowerDNS anonymize to /24 v4 and /56 v6 the same way) and
  * salted-hash pseudonyms for stable-but-unlinkable identities. Pure
  * column expressions: per-row map, codegen'd, no shuffle.
  */
object Anonymize {

  /** Zero the host bits of a u32 IPv4 (as a long), keeping `prefixBits`
    * of network prefix: /24 keeps a.b.c.0. Pure integer arithmetic so any
    * SQL oracle reproduces it exactly. */
  def ipv4Truncate(u32: Column, prefixBits: Int): Column = {
    require(prefixBits >= 0 && prefixBits <= 32, "prefixBits in [0,32]")
    val host = 1L << (32 - prefixBits)
    u32 - (u32 % lit(host))
  }

  /** Salted SHA-256 pseudonym: deterministic (joinable across tables
    * sharing the salt) yet not reversible to the raw identity without
    * the salt. */
  def pseudonym(id: Column, salt: String): Column =
    sha2(concat(lit(salt + ":"), id.cast("string")), 256)
}
