package graft.util

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Driver-side data-file census of a `key=value`-partitioned parquet
  * dataset — the file-fragmentation half of every index family's
  * occupancy report ([[graft.query.IvfIndex.stats]] and friends). One
  * filesystem listing of ≤ #partitions directories: query-compilation
  * scale, no Spark jobs, no data bytes read.
  */
object PartitionFiles {

  /** (partition value, data-file count) per `prefix=`-named partition
    * directory under `dir`; empty when `dir` does not exist. Hidden
    * files (`_`/`.`-prefixed: commit markers, checksums) are not
    * counted.
    */
  def counts(spark: SparkSession, dir: String, prefix: String): Seq[(Long, Long)] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(root)) return Nil
    fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"$prefix="))
      .map { s =>
        val id = s.getPath.getName.stripPrefix(s"$prefix=").toLong
        val n = fs.listStatus(s.getPath).count(f => f.isFile &&
          !f.getPath.getName.startsWith("_") && !f.getPath.getName.startsWith("."))
        (id, n.toLong)
      }
  }
}
