package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    // SPARK_GRAFT_EXPLAIN_EXEC=1: run the query (noop sink) first, then
    // print the EXECUTED plan — shows AQE's final shape (coalesced /
    // skew-split exchanges), which the static formatted plan cannot
    for (name <- args) {
      println(s"########## $name")
      val df = SparkEntry.queries(name)(spark, dir)
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN_EXEC")) {
        df.write.format("noop").mode("overwrite").save()
        println(df.queryExecution.executedPlan.toString)
      } else {
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
