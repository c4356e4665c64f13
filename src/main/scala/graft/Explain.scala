package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-review tool: dumps the formatted physical plan of corpus queries.
  *
  *   java -cp ... graft.Explain [sfDir] [queryName ...]
  *
  * Used each round to check the plans stay the ones we want at scale:
  * filters pushed into the parquet scans (PushedFilters), small sides
  * broadcast (BroadcastHashJoin), whole-stage codegen spans wide, no
  * accidental CartesianProduct on equi-joinable shapes.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.tail.toSeq
      else Seq("q21_pricing_summary", "q11_star_join", "q18_range_join",
        "q10_join_agg", "q62_cosine_topk", "q61_ngram_jaccard")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      println(SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(FormattedMode))
    }
    spark.stop()
  }
}
