package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Defaults are tuned for the driver's local[32] harness but are the same
  * knobs a 1000-executor cluster deployment would set: AQE on (runtime
  * shuffle coalescing + skew-join splitting), shuffle partitions sized to
  * the parallelism at hand (never the 200 default), UTC session time zone
  * (oracle parity), and a broadcast threshold that lets every dimension
  * table of the star schema broadcast.
  *
  * Reference parity: the reference pins its FS/Hadoop config via
  * `setFSConfig` (reference RowOrcBucketingSink.java:238-244); here the
  * same surface is `SparkSession.conf` / `hadoopConfiguration`.
  */
object GraftSession {
  def builder(
      master: String = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]",
      appName: String = "graft",
      shufflePartitions: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
  ): SparkSession.Builder =
    SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Coalescing floor: the default 1 MB minPartitionSize folds
      // byte-small but compute-AMPLIFYING shuffles (LSH band rows: ~3 MB
      // that fan out into millions of candidate-pair probes on the
      // reduce side) into one task. 64 KB keeps such stages at
      // ~min(parallelism, bytes/64K) tasks while genuinely tiny shuffles
      // still coalesce; plain data-proportional stages are governed by
      // advisoryPartitionSizeInBytes as before.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", (64L * 1024).toString)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(): SparkSession = {
    val spark = builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
