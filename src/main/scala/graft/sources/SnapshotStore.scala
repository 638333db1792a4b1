package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Checkpointed stage snapshots with per-partition lineage rows and
  * counters — Iceberg-shaped semantics (atomic commit, manifest, resume)
  * over plain Parquet directories, because /opt/spark/jars carries no
  * Iceberg runtime (SURVEY §7). On a real cluster the same contract binds
  * to an Iceberg catalog: `write` = snapshot commit, `manifest` = snapshot
  * metadata, `getOrCreate` = time-travel-to-latest.
  *
  * Commit protocol: data files land under `<root>/<stage>/data`, then the
  * manifest is written last; a stage without `_MANIFEST.json` is considered
  * uncommitted and is recomputed — which is what makes every stage
  * resumable after a mid-stage kill (north rule).
  */
final class SnapshotStore(spark: SparkSession, root: String) {

  private def stageDir(stage: String) = new Path(root, stage)
  private def dataDir(stage: String) = new Path(stageDir(stage), "data")
  private def manifestPath(stage: String) = new Path(stageDir(stage), "_MANIFEST.json")
  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def exists(stage: String): Boolean = fs.exists(manifestPath(stage))

  def read(stage: String): DataFrame =
    spark.read.parquet(dataDir(stage).toString)

  /** Write a stage snapshot: parquet data + manifest with row counters and
    * per-file (= per-partition) lineage rows. Returns the re-read frame so
    * downstream stages consume the materialized snapshot, truncating
    * lineage like a checkpoint. */
  def write(stage: String, df: DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    df.write.mode("overwrite").parquet(dataDir(stage).toString)
    val reread = spark.read.parquet(dataDir(stage).toString)
    // Per-file lineage counters from the PARQUET FOOTERS (exact row
    // counts the writer already committed), not a second full scan of
    // the stage output — at 100 TB the old groupBy(input_file_name)
    // re-read doubled every stage's read cost just to fill the manifest.
    // One bounded footer read per file (= per partition), driver-side —
    // the same O(files) metadata pass an Iceberg snapshot commit does.
    val perFile = footerCounts(stage).sortBy(_._1)
    val totalRows = perFile.map(_._2).sum
    val elapsedMs = (System.nanoTime() - t0) / 1000000
    val filesJson = perFile.map { case (f, n) =>
      s"""{"file":"${f.replace("\\", "/")}","rows":$n}"""
    }.mkString("[", ",", "]")
    val manifest =
      s"""{"stage":"$stage","rows":$totalRows,"numFiles":${perFile.length},""" +
        s""""elapsedMs":$elapsedMs,"partitions":$filesJson}"""
    // atomic commit: write to a temp name, then rename — a kill between
    // create and close must not leave a truncated _MANIFEST.json that
    // `exists()` treats as committed (the class contract: the manifest is
    // written LAST and appears atomically; VERDICT r06 #4)
    val tmp = new Path(stageDir(stage), "_MANIFEST.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(manifest.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    if (fs.exists(manifestPath(stage))) fs.delete(manifestPath(stage), false)
    if (!fs.rename(tmp, manifestPath(stage)))
      throw new java.io.IOException(
        s"could not commit manifest for stage $stage (rename failed)")
    reread
  }

  /** Exact (file, rows) pairs from the parquet footers of a stage's data
    * files. Falls back to a distributed count scan if any footer is
    * unreadable (never fails a commit over a metadata hiccup). */
  private def footerCounts(stage: String): Array[(String, Long)] = {
    val dir = dataDir(stage)
    val files = fs.listStatus(dir).filter { st =>
      val n = st.getPath.getName
      st.isFile && n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    }
    try files.map { st =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromStatus(st, spark.sparkContext.hadoopConfiguration)
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try (st.getPath.toString, reader.getRecordCount)
      finally reader.close()
    } catch {
      case e: Exception =>
        System.err.println(
          s"[snapshot] footer count failed for $stage (${e.getMessage}); " +
            "falling back to a count scan")
        import org.apache.spark.sql.functions._
        spark.read.parquet(dir.toString)
          .groupBy(input_file_name().as("file")).count()
          .collect()
          .map(r => (r.getString(0), r.getLong(1)))
    }
  }

  /** Resume-or-compute: replay the committed snapshot when present. */
  def getOrCreate(stage: String)(compute: => DataFrame): DataFrame =
    if (exists(stage)) read(stage) else write(stage, compute)

  /** Counters recorded for a committed stage (rows, files, elapsedMs). */
  def manifest(stage: String): Option[String] =
    if (!exists(stage)) None
    else {
      val path = manifestPath(stage)
      val len = fs.getFileStatus(path).getLen.toInt
      val buf = new Array[Byte](len)
      val in = fs.open(path)
      try in.readFully(0, buf)
      finally in.close()
      Some(new String(buf, java.nio.charset.StandardCharsets.UTF_8))
    }
}
