package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway: per-round timing of the two sssp probe shapes. */
object TmpSsspDebug {
  def main(args: Array[String]): Unit = {
    val n = 1000000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val par = spark.sparkContext.defaultParallelism
    val maxJ = 19
    def jumpEdges = spark.range(0, n, 1, par)
      .select(col("id").as("src"),
        explode(array((0 to maxJ).map(j => lit(1L << j)): _*)).as("_step"))
      .where(col("id") + col("_step") < n)
      .select(col("src"), (col("src") + col("_step")).as("dst"), col("_step"))
    def drive(weighted: Boolean): Unit = {
      val w = if (weighted) (col("_step") + 1).cast("long") else lit(1L)
      val e = jumpEdges.select(col("src"), col("dst"), w.as("_w"))
      var dist = spark.range(0, 1).select(col("id").as("node"))
        .withColumn("dist", lit(0L)).localCheckpoint(true)
      var frontier = dist
      var rounds = 0
      var done = false
      while (!done && rounds < 25) {
        val t0 = System.nanoTime()
        val cand = frontier.join(e, frontier("node") === e("src"))
          .select(col("dst").as("node"), (col("dist") + col("_w")).as("_nd"))
          .groupBy("node").agg(min(col("_nd")).as("_nd"))
        val improvedLazy = cand.join(dist, Seq("node"), "left")
          .where(col("dist").isNull || col("_nd") < col("dist"))
          .select(col("node"), col("_nd").as("dist"))
        if (rounds == 3) println(s"[tmpplan] weighted=$weighted\n" +
          improvedLazy.queryExecution.executedPlan.toString)
        val improved = improvedLazy.localCheckpoint(true)
        val ni = improved.count()
        val t1 = System.nanoTime()
        if (ni == 0) done = true
        else {
          dist = dist.union(improved).groupBy("node")
            .agg(min(col("dist")).as("dist")).localCheckpoint(true)
          frontier = improved
          rounds += 1
        }
        val t2 = System.nanoTime()
        println(f"[tmp] weighted=$weighted round=$rounds improved=$ni " +
          f"relax=${(t1 - t0) / 1e9}%.2f merge=${(t2 - t1) / 1e9}%.2f")
      }
    }
    drive(weighted = args.headOption.contains("weighted"))
    spark.stop()
  }
}
