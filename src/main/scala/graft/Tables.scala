package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Fixture-table loaders (TESTDATA.md). One place normalizes the quirks of
  * `events.ts`, which has shipped in two parquet shapes across fixture
  * regenerations:
  *   - TIMESTAMP(NANOS): Spark cannot represent it; with
  *     `spark.sql.legacy.parquet.nanosAsLong=true` it arrives as LongType
  *     nanoseconds and is converted here to microsecond TimestampType
  *     (the DuckDB oracle only compares second-resolution derivations, so
  *     the ns->us truncation is oracle-safe).
  *   - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark 4 infers
  *     TIMESTAMP_NTZ by default, which `unix_micros`/`withWatermark`
  *     reject. `spark.sql.parquet.inferTimestampNTZ=false` in
  *     [[configure]] restores TimestampType inference (session TZ is
  *     pinned to UTC, so the instant semantics match the oracle); the
  *     NTZ cast arm below covers sessions configured elsewhere.
  */
object Tables {

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case _ => spark.read.parquet(s"$dir/$name.parquet")
    }

  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/events.parquet")
    df.schema("ts").dataType match {
      case LongType =>
        // integral division: `/` would promote ~1.7e18 ns longs to double
        // (53-bit mantissa) and lose up to ~256 ns before dividing, which
        // can flip a sessionization gap sitting exactly on the boundary
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: org.apache.spark.sql.types.TimestampNTZType =>
        // session TZ is UTC, so NTZ wall-clock == the oracle's instant
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }
  }

  /** Spread a small single-split input across all cores before a
    * CPU-heavy narrow stage. The fixture tables are single-row-group
    * parquet files, so everything upstream of the first shuffle would
    * otherwise run on ONE core regardless of `local[32]`. No-op when the
    * scan already has enough splits (any real corpus); when it fires, the
    * cost is one shuffle of the small input — strictly cheaper than
    * serializing the kernel work behind it.
    *
    * The split estimate comes from the scan's file list + sizes, NOT
    * from `df.rdd.getNumPartitions`: touching `.rdd` compiles the whole
    * physical plan (non-AQE) just to count splits — wasted planning
    * work on every call. Non-file sources (memory relations in tests)
    * are left untouched.
    */
  def parallelize(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val target = spark.sparkContext.defaultParallelism
    val files = df.inputFiles
    if (files.isEmpty || files.length >= target) return df
    val estimatedSplits =
      try {
        val maxPartBytes = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
          spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
        val hadoopConf = spark.sparkContext.hadoopConfiguration
        files.map { f =>
          val p = new org.apache.hadoop.fs.Path(f)
          val len = p.getFileSystem(hadoopConf).getFileStatus(p).getLen
          math.max(1L, (len + maxPartBytes - 1) / maxPartBytes)
        }.sum
      } catch { case _: Exception => target.toLong } // unknown -> assume enough
    if (estimatedSplits < target) df.repartition(target) else df
  }

  /** Per-process warehouse for managed tables (bucketed-join layouts):
    * tmp-dir so `saveAsTable` never litters the repo working directory,
    * per-PID so concurrent JVMs (Verify + Bench overlap in the harness)
    * cannot clobber each other's table files; removed on JVM exit.
    */
  lazy val warehouseDir: String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_warehouse_" +
      ProcessHandle.current().pid()
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(new java.io.File(dir))
    }
    dir
  }

  /** Session config every graft entry point should apply.
    *
    * The two r21 performance settings are scale-adaptive, not tuned to a
    * core count (opt guide §2.2/§3.1/§9):
    *
    *  - `coalescePartitions.minPartitionSize=64k` (default 1m): AQE's
    *    coalescing floor. With the default, any exchange under ~32 MB
    *    collapses below the session's parallelism — for byte-small but
    *    CPU-dense frames (vector kernels, window fills, gram verifies)
    *    that serializes whole stages onto 1-2 cores (measured: q84's
    *    window stage ran 1 task for 1.0 s; q82's pass-2 ranking 2 tasks
    *    for 1.5 s). 64k keeps `parallelismFirst` honest at small bytes
    *    and is invisible at scale, where partition sizes are decided by
    *    total/parallelism, far above either floor.
    *    over sort-merge when its size conditions hold (guide §9's
    *    recommended baseline) — skips both sort passes on joins whose
    *    build side provably fits; falls back to SMJ otherwise, at any
    *    scale, by the planner's own guard.
    */
  def configure(builder: SparkSession.Builder): SparkSession.Builder =
    builder
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ", "false")
      .config("spark.sql.warehouse.dir", warehouseDir)
}
