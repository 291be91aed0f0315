package graft
import org.apache.spark.sql.SparkSession
object ReproFail {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir", graft.Scratch.dir("graft_wh"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q_ts_session","q_ts_sliding","q_ts_time_weighted","q_ts_trend",
      "q_ts_gap_fill","q_ts_ohlc","q_ts_asof_forward","q_ts_asof_nearest",
      "q_join_band","q_join_interval_overlap")
    var bad = 0
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        val c = df.count()
        println(s"OK $n rows=$c schema=${df.schema.map(f => f.name+":"+f.dataType.simpleString).mkString(",")}")
      } catch { case e: Throwable =>
        bad += 1
        println(s"FAIL $n: ${e.getClass.getName}: ${String.valueOf(e.getMessage).take(300)}")
      }
    }
    println(s"bad=$bad")
    spark.stop()
  }
}
