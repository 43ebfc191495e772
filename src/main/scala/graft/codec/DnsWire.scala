package graft.codec

/** DNS wire-format parser (RFC 1035 §4.1) for exactly the fields the
  * reference reads through miekg/dns (/root/reference/src/dnstap/
  * dnstap.go:275-281,289-300,331-361): transaction id, rcode, and the
  * question section (qname + qtype). Names render miekg/dns-style: labels
  * dot-joined with a trailing dot; the root name is ".". Compression
  * pointers are followed with a loop guard. Malformed input → None
  * (reference behavior: log + drop the record).
  */
object DnsWire {

  final case class Question(name: String, qtype: Int)
  final case class DnsMeta(id: Int, rcode: Int, questions: Seq[Question])

  def parse(b: Array[Byte]): Option[DnsMeta] =
    try {
      if (b.length < 12) return None
      val id = ((b(0) & 0xff) << 8) | (b(1) & 0xff)
      val flags = ((b(2) & 0xff) << 8) | (b(3) & 0xff)
      val rcode = flags & 0xf
      val qdcount = ((b(4) & 0xff) << 8) | (b(5) & 0xff)
      var pos = 12
      val qs = Vector.newBuilder[Question]
      var q = 0
      while (q < qdcount) {
        val (name, next) = readName(b, pos)
        if (next + 4 > b.length) throw new IllegalArgumentException("question overruns buffer")
        val qtype = ((b(next) & 0xff) << 8) | (b(next + 1) & 0xff)
        pos = next + 4 // skip qtype + qclass
        qs += Question(name, qtype)
        q += 1
      }
      Some(DnsMeta(id, rcode, qs.result()))
    } catch { case _: Exception => None }

  /** @return (rendered name, position after the name at `pos`) */
  private def readName(b: Array[Byte], pos0: Int): (String, Int) = {
    val sb = new java.lang.StringBuilder(64)
    var pos = pos0
    var after = -1 // set when the first compression pointer is followed
    var hops = 0
    var done = false
    while (!done) {
      if (pos >= b.length) throw new IllegalArgumentException("name overruns buffer")
      val len = b(pos) & 0xff
      if (len == 0) {
        if (after < 0) after = pos + 1
        done = true
      } else if ((len & 0xc0) == 0xc0) {
        if (pos + 1 >= b.length) throw new IllegalArgumentException("pointer overruns buffer")
        val target = ((len & 0x3f) << 8) | (b(pos + 1) & 0xff)
        if (after < 0) after = pos + 2
        hops += 1
        // pointers must point strictly backwards (loop prevention)
        if (hops > 64 || target >= pos)
          throw new IllegalArgumentException("bad compression pointer")
        pos = target
      } else if ((len & 0xc0) != 0) {
        throw new IllegalArgumentException(s"unsupported label type ${len >> 6}")
      } else {
        if (pos + 1 + len > b.length) throw new IllegalArgumentException("label overruns buffer")
        sb.append(new String(b, pos + 1, len, java.nio.charset.StandardCharsets.US_ASCII))
        sb.append('.')
        pos += 1 + len
      }
    }
    val name = if (sb.length() == 0) "." else sb.toString
    (name, after)
  }

  /** Encode a minimal query/response message (fixtures + tests). */
  def encode(id: Int, rcode: Int, isResponse: Boolean,
             questions: Seq[Question]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    u16(id)
    u16((if (isResponse) 0x8000 else 0) | (rcode & 0xf))
    u16(questions.size); u16(0); u16(0); u16(0)
    questions.foreach { q =>
      q.name.split('.').filter(_.nonEmpty).foreach { label =>
        val lb = label.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
        out.write(lb.length); out.write(lb, 0, lb.length)
      }
      out.write(0)
      u16(q.qtype); u16(1) // class IN
    }
    out.toByteArray
  }
}
