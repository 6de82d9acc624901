package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** PII scrub: placeholder substitution, audit counts, and the
  * email-before-digits ordering guarantee.
  */
class PiiSpec extends SparkSpec {
  import spark.implicits._

  private def redact(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id") +: TextOps.redactPii(col("text")): _*)
      .as[(Long, String, Long, Long, Long)].collect().sortBy(_._1).toSeq

  test("emails, IPs, and phones are replaced with typed placeholders") {
    val out = redact(
      "write to alice.smith+x@mail.example.org today",
      "server 192.168.0.1 then 10.0.0.2 answered",
      "call 555-0142 about the order",
      "clean text with no pii at all")
    assert(out(0)._2 == "write to <EMAIL> today" && out(0)._3 == 1)
    assert(out(1)._2 == "server <IP> then <IP> answered" && out(1)._4 == 2)
    assert(out(2)._2 == "call <PHONE> about the order" && out(2)._5 == 1)
    assert(out(3)._2 == "clean text with no pii at all" &&
      out(3)._3 == 0 && out(3)._4 == 0 && out(3)._5 == 0)
  }

  test("email is scrubbed before digit patterns can re-match its content") {
    // the local part contains both an IP-shaped and a phone-shaped run;
    // scrubbing email first means neither is double-counted
    val out = redact("ping 1.2.3.4.bob@ex.com and 555-1234.c@d.io end")
    assert(out(0)._2 == "ping <EMAIL> and <EMAIL> end")
    assert(out(0)._3 == 2 && out(0)._4 == 0 && out(0)._5 == 0)
  }
}
