package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time a named subset of `SparkEntry.queries` without the
  * full Bench sweep — `runMain graft.BenchOne q1,q2 [warmupName]`.
  * Same session config and noop-sink materialization as [[Bench]];
  * prints one `ABLINE name cold warm_med3` line per query (cold =
  * first run in-process, warm = median of 3 reps). For iterating on
  * a single operator's plan; the round-official numbers remain
  * Bench's. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val warmup = if (args.length > 1) args(1) else "a08_keyed_agg"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(n: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    t(warmup)
    names.foreach { q =>
      val cold = t(q)
      val warm = Seq.fill(3)(t(q)).sorted.apply(1)
      println(f"ABLINE $q cold=$cold%.2f warm_med3=$warm%.2f")
    }
    spark.stop()
  }
}
