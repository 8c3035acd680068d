package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe: q74 PII-redaction component breakdown — is the wall
  * the regex engine (which passes? email vs ipv4, count vs replace), the
  * UTF8String→String copy, or the scan itself? Driver-side single-thread
  * MB/s per component over the real corpus texts, then the full
  * distributed query for reference. */
object PerfProbe74 {
  import PerfProbe.time
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/tmp/sf1gen")
    val s = SparkSession.builder().master("local[32]")
      .appName("probe74")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    val docs = s.read.parquet(s"$d/documents.parquet")
    time("scan warmup")(docs.count())
    // driver-side corpus slice: single-thread component costs
    val texts = docs.select("text").filter(col("text").isNotNull)
      .limit(20000).collect().map(_.getString(0))
    // UTF-8 byte total (not UTF-16 char count) so MB/s is labeled right
    // for non-ASCII text
    val bytes = texts.map(
      _.getBytes(java.nio.charset.StandardCharsets.UTF_8).length.toLong).sum
    println(s"corpus slice: ${texts.length} docs, $bytes utf8 bytes")
    def mbps(name: String)(f: String => Unit): Unit = {
      f(texts(0)) // JIT warm
      var i = 0
      while (i < texts.length) { f(texts(i)); i += 1 } // warm pass
      val t0 = System.nanoTime()
      i = 0
      while (i < texts.length) { f(texts(i)); i += 1 }
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-28s ${sec}%8.3f s  ${bytes / 1e6 / sec}%8.1f MB/s")
    }
    var sink = 0L
    mbps("baseline: length only")(t => sink += t.length)
    mbps("indexOf('@') probe")(t => sink += t.indexOf('@'))
    mbps("email matcher find-all") { t =>
      val m = graft.functions.PiiScan.emailPattern.matcher(t)
      while (m.find()) sink += 1
    }
    mbps("ipv4 matcher find-all") { t =>
      val m = graft.functions.PiiScan.ipv4Pattern.matcher(t)
      while (m.find()) sink += 1
    }
    mbps("full scanRow") { t =>
      sink += graft.functions.PiiScan
        .scanRow(org.apache.spark.unsafe.types.UTF8String.fromString(t))
        .getLong(0)
    }
    println(s"sink=$sink")
    // distributed breakdown: where do the 2.5 s go?
    time("dist: md5(text) only")(docs
      .select(col("doc_id"), md5(col("text")))
      .queryExecution.toRdd.count())
    val replaced = docs
      .withColumn("text",
        replace(col("text"), lit(" data "), lit(" bob@example.com ")))
      .withColumn("text",
        replace(col("text"), lit(" scan "), lit(" 10.0.0.1 ")))
    time("dist: replaces + md5")(replaced
      .select(col("doc_id"), md5(col("text")))
      .queryExecution.toRdd.count())
    time("dist: replaces + scan struct")(replaced
      .withColumn("__pii", graft.functions.PiiFunctions.pii_scan(col("text")))
      .select(col("doc_id"), col("__pii.n_emails"))
      .queryExecution.toRdd.count())
    // distributed reference: the q74 pipeline end to end
    time("q74 full")(SparkEntry.queries("q74_pii_redact")(s, d)
      .queryExecution.toRdd.count())
    time("q74 full again")(SparkEntry.queries("q74_pii_redact")(s, d)
      .queryExecution.toRdd.count())
    graft.OpCaches.releaseAll()
    s.stop()
  }
}
