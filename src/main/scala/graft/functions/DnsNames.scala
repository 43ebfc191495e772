package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.codec.DnsTables

/** Column-level qtype/rcode rendering (P3/P4, SURVEY §2.2).
  *
  * Spark-first shape: a broadcast literal map via `element_at(typedlit(...))`
  * would work, but a `CASE` chain built from the same table is fully
  * codegen'd into a lookup switch and needs no map allocation per row;
  * unknown codes fall back to the miekg/dns-style "TYPE<code>"/"RCODE<code>".
  */
object DnsNames {

  private def caseChain(table: Map[Int, String], fallbackPrefix: String)
                       (c: Column): Column = {
    val sorted = table.toSeq.sortBy(_._1)
    val base: Column = concat(lit(fallbackPrefix), c.cast("string"))
    sorted.foldRight(base) { case ((code, name), acc) =>
      when(c === lit(code), lit(name)).otherwise(acc)
    }
  }

  def qtype_name(c: Column): Column = caseChain(DnsTables.QTypeNames, "TYPE")(c)
  def rcode_name(c: Column): Column = caseChain(DnsTables.RcodeNames, "RCODE")(c)
}
