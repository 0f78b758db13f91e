package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Diagnostic: run a declared query (optionally repeated) and print
  * every Spark job's wall time + first-stage name, so a slow query's
  * seconds can be attributed to specific jobs (guide §1 "measure
  * first"). Not part of the driver contract — a measurement tool only.
  *
  * Usage: runMain graft.JobTime <query> [repeat]
  */
object JobTime {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: JobTime <query> [repeat]")
    val name = args(0)
    val repeat = if (args.length > 1) args(1).toInt else 2
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = SparkEntry.queries(name)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val stageOf = new java.util.concurrent.ConcurrentHashMap[Int, String]()
    @volatile var record = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (record) {
          val desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(js.stageInfos.lastOption.map(_.name.take(80)))
            .getOrElse("?")
          jobs.put(js.jobId, (js.time, desc.take(100)))
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        if (record && jobs.containsKey(je.jobId)) {
          val (t0, desc) = jobs.get(je.jobId)
          println(f"[job] ${je.jobId}%4d ${(je.time - t0) / 1000.0}%8.3f s  $desc")
        }
    }
    spark.sparkContext.addSparkListener(listener)
    (0 until repeat).foreach { i =>
      if (i == repeat - 1) { record = true }
      val t0 = System.nanoTime()
      q(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      org.apache.spark.sql.graft.Shim.waitListenerBus(spark)
      println(f"[run] $i%d  $name  $dt%.3f s")
    }
    spark.stop()
  }
}
