package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Forensic probe for the two-cluster-size evidence (BENCH.md): isolates
  * the crawl loop's NON-kernel path — block-store cache materialization +
  * parquet encode of a docs-like corpus — from its CPU kernel. On one
  * shared-memory machine these phases are bound by DRAM bandwidth and
  * allocator/GC throughput, which do NOT quadruple from 8 to 32 threads
  * of the same socket(s); on a real N→4N-EXECUTOR cluster every added
  * node brings its own memory channels and disks, so this path scales
  * with nodes. The probe quantifies that: a pure-CPU baseline (the same
  * sketch arithmetic the parse kernel runs) against cache+write over
  * identical data.
  *
  *   SPARK_GRAFT_CPUS=8  sbt "runMain graft.BandwidthProbe"
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.BandwidthProbe"
  */
object BandwidthProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val rows = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROWS", "400000").toLong
    val base = Option("/dev/shm").filter(p =>
      java.nio.file.Files.isWritable(java.nio.file.Paths.get(p)))
      .getOrElse(System.getProperty("java.io.tmpdir"))
    val dir = BenchDirs.deleteOnExit(java.nio.file.Files
      .createTempDirectory(java.nio.file.Paths.get(base), s"bwprobe-$cpus")
      .toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", dir)
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory",
        sys.env.getOrElse("SPARK_DRIVER_MEM", "16g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // docs-like corpus: ~2.5 KB of text per row (the synthetic page weight),
    // materialized to tmpfs OUTSIDE all timers so each timed phase starts
    // from the same bytes instead of re-running the 40-md5/row generation
    // (parallel CPU work) inside its own measurement
    spark.range(rows).repartition(cpus)
      .select($"id", concat_ws(" ", (0 until 40).map(i =>
        md5(concat($"id", lit(i)))): _*).as("text"))
      .write.mode("overwrite").parquet(s"$dir/corpus")
    val corpus = spark.read.parquet(s"$dir/corpus")

    def time[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // CPU kernel baseline: same md5-sketch arithmetic as the parse stage,
    // no materialization of the corpus anywhere
    val cpuSecs = time {
      corpus.as[(Long, String)].mapPartitions(_.map { case (_, t) =>
        graft.crawl.PageParser.sketch(t)._2
      }).agg(sum(col("value").cast("decimal(38,0)"))).collect()
    }
    // block-store cache materialization (the loop's persist path); the
    // tmpfs scan feeding it is memory-speed, so the timing is dominated by
    // decode + block-store write, not by corpus generation
    val cached = corpus.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cacheSecs = time { cached.count() }
    // parquet encode+write from the cache (the loop's commit path)
    val writeSecs = time { cached.write.mode("overwrite").parquet(s"$dir/out") }
    println(s"""{"probe":"bandwidth","cpus":$cpus,"rows":$rows,""" +
      s""""cpu_kernel_sec":$cpuSecs,"cache_sec":$cacheSecs,""" +
      s""""parquet_write_sec":$writeSecs}""")
    spark.stop()
  }
}
