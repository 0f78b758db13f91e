package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// throwaway measurement main — NOT part of the engine; deleted after use
object Scratch {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[t] $name ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
  }
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def load() = {
      val o = spark.read.parquet(s"$sfDir/orders.parquet").where(col("o_orderkey") <= 6000000L)
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      o.join(li, col("o_orderkey") === col("l_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_partkey") * 2 + 1).as("dst"),
          col("l_quantity").cast("long").as("w"))
        .localCheckpoint(true)
    }
    val edges = t("load+checkpoint")(load())
    (0 until 2).foreach { rep =>
      println(s"== rep $rep ==")
      val undRaw = edges.select(
          least(col("src"), col("dst")).as("u"),
          greatest(col("src"), col("dst")).as("v"),
          col("w").cast("long").as("_w"))
        .where(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      t("validate-ish agg")(undRaw.agg(sum(col("_w").cast("decimal(38,0)"))).head())
      val und = undRaw.groupBy(col("u"), col("v")).agg(sum(col("_w")).as("_w"))
      val eb = t("eb checkpoint")(
        org.apache.spark.sql.graft.CheckpointStats.withMeasuredStats(
          und.select(col("u").as("src"), col("v").as("dst"), col("_w"))
            .union(und.select(col("v").as("src"), col("u").as("dst"), col("_w")))
            .localCheckpoint(true)))
      val n = t("count")(eb.count())
      val arr = t("collect+map")(
        eb.where(col("src") < col("dst")).collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))))
      println(s"canon edges: ${arr.length} (eb $n)")
      import scala.collection.mutable
      val lab = mutable.HashMap.empty[Long, Long]
      arr.foreach { e => lab.update(e._1, e._1); lab.update(e._2, e._2) }
      t("3 sweeps boxed") {
        for (_ <- 0 until 3) {
          val votes = mutable.HashMap.empty[Long, mutable.HashMap[Long, Long]]
          def addVote(src: Long, dst: Long, w: Long): Unit = {
            val m = votes.getOrElseUpdate(dst, mutable.HashMap.empty)
            val l = lab(src)
            m.update(l, m.getOrElse(l, 0L) + w)
          }
          arr.foreach { case (u, v, w) => addVote(u, v, w); addVote(v, u, w) }
          votes.foreach { case (nn, vs) =>
            var bestL = 0L; var bestC = 0L; var any = false
            vs.foreach { case (l, c) =>
              if (!any || c > bestC || (c == bestC && l < bestL)) {
                any = true; bestL = l; bestC = c } }
            lab.update(nn, bestL)
          }
        }
      }
      val df = t("toDF")(lab.toSeq.toDF("node", "label"))
      t("final count")(df.orderBy(col("node")).count())
      eb.unpersist(false)
    }
    spark.stop()
  }
}
