package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.{Tables, EtlSession}
import graft.ops.Dedup

/** One-off check: does minHashNearDupPairs equal the exact Jaccard pair
  * set on the fixtures at each SF? (Licenses the q71/q78 oracle
  * promotion — the hash family is deterministic, so matching once means
  * matching every run.) Exits nonzero on any mismatch so it can gate a
  * script; the same assertion also runs in OpsSuite at sf0.001/sf0.01
  * ("q71/q78 oracle guard") — this tool adds the sf0.1 pass. */
object CheckMinhashOracle {
  def main(args: Array[String]): Unit = {
    var failed = false
    val spark = EtlSession.create("local[32]", 32, "check-minhash")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val docs = Tables.table(spark, dir, "documents")
      graft.functions.Registry.registerAll(spark)
      docs.createOrReplaceTempView("docs_chk")
      def exactPairs(filter: String): Set[(Long, Long)] = spark.sql(
        s"""WITH sh AS (
           |  SELECT DISTINCT doc_id, shingle AS s
           |  FROM (SELECT doc_id, shingles(text, 3) FROM docs_chk $filter)),
           |cnt AS (SELECT doc_id, COUNT(*) n FROM sh GROUP BY doc_id),
           |inter AS (
           |  SELECT a.doc_id da, b.doc_id db, COUNT(*) ix
           |  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
           |  GROUP BY a.doc_id, b.doc_id)
           |SELECT da, db FROM inter
           |JOIN cnt ca ON ca.doc_id = da JOIN cnt cb ON cb.doc_id = db
           |WHERE CAST(ix AS DOUBLE) / (ca.n + cb.n - ix) >= 0.8""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      def lshPairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        Dedup.minHashNearDupPairs(df, "doc_id", "text", 3, 0.8, 16)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val e71 = exactPairs("WHERE doc_id < 150")
      val l71 = lshPairs(docs.filter(col("doc_id") < 150))
      val e78 = exactPairs("")
      val l78 = lshPairs(docs)
      println(s"$sf q71: exact=${e71.size} lsh=${l71.size} equal=${e71 == l71}")
      println(s"$sf q78: exact=${e78.size} lsh=${l78.size} equal=${e78 == l78}")
      if (e71 != l71) println(s"  q71 diff: missed=${(e71 -- l71).take(5)} extra=${(l71 -- e71).take(5)}")
      if (e78 != l78) println(s"  q78 diff: missed=${(e78 -- l78).take(5)} extra=${(l78 -- e78).take(5)}")
      failed ||= e71 != l71 || e78 != l78
    }
    spark.stop()
    if (failed) sys.exit(1)
  }
}
