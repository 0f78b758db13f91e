package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Root-directory parquet rewrite for the stored indexes whose data
  * files live at the index dir's top level beside `_`-prefixed
  * metadata (the minhash signature store and the IVF inverted file).
  * Spark cannot overwrite a path it is reading, so the rewrite stages
  * into an underscore-prefixed subdirectory — invisible to parquet
  * readers, so a crash mid-compaction leaves at worst a stale `.stage`
  * remnant under an already-invalidated sidecar, never a directory
  * mixing old and new rows — then swaps: delete the old data files,
  * move the staged ones up, leave every `_`-metadata file untouched.
  * Callers hold the sidecar DOWN around the whole operation (the same
  * invalidate-then-revalidate discipline as the appends). */
private[operators] object IndexFiles {

  private val StageDir = "_graft_compact.stage"

  def rewriteRoot(spark: SparkSession, dir: String,
      shape: DataFrame => DataFrame): Unit = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val stage = new org.apache.hadoop.fs.Path(root, StageDir)
    fs.delete(stage, true)
    shape(spark.read.parquet(dir))
      .write.mode("overwrite").parquet(stage.toString)
    fs.listStatus(root)
      .filter(s => s.isFile && !s.getPath.getName.startsWith("_"))
      .foreach(s => fs.delete(s.getPath, false))
    fs.listStatus(stage)
      .filter(s => !s.getPath.getName.startsWith("_"))
      .foreach { s =>
        val dest = new org.apache.hadoop.fs.Path(root, s.getPath.getName)
        if (!fs.rename(s.getPath, dest))
          throw new java.io.IOException(s"failed to move ${s.getPath} to $dest")
      }
    fs.delete(stage, true)
  }

  /** Whether `dir` holds data files (non-hidden, non-metadata) — the
    * one store-detection predicate every bootstrap/torn-commit check
    * shares, so the stores cannot diverge on what "has data" means. */
  def hasDataFiles(spark: SparkSession, dir: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    fs.exists(path) && fs.listStatus(path).exists(s =>
      s.isFile && !s.getPath.getName.startsWith("_") &&
        !s.getPath.getName.startsWith("."))
  }

  /** Left-anti erasure shape shared by the compactions. */
  def minus(drop: Option[DataFrame], idCol: String)(df: DataFrame): DataFrame =
    drop match {
      case None => df
      case Some(ids) => df.join(
        ids.select(org.apache.spark.sql.functions.col(idCol)).distinct(),
        Seq(idCol), "left_anti")
    }
}
