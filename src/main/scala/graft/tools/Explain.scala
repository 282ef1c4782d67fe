package graft.tools
import org.apache.spark.sql.SparkSession

object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    args.foreach { name =>
      println(s"########## $name ##########")
      val df = graft.SparkEntry.queries(name)(spark, d)
      println(df.queryExecution.executedPlan.toString.take(6000))
    }
    spark.stop()
  }
}
