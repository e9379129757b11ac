package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: time and/or explain individual SparkEntry queries.
  *
  * Usage: runMain graft.Explain [--explain] <sfDir> <queryName>...
  * With no query names, runs every query. Prints per-query wall seconds;
  * with --explain also prints the formatted physical plan (pushdown /
  * broadcast / codegen review, SURVEY §7 step 7).
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val (flags, rest) = args.partition(_.startsWith("--"))
    val doExplain = flags.contains("--explain")
    val sfDir = rest.head
    val names = if (rest.length > 1) rest.tail.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val tPlan = System.nanoTime()
      if (doExplain) { println(s"== $name =="); df.explain("formatted") }
      // noop materialization, same as Bench (count() would let Catalyst
      // prune every unreferenced column out of the timing)
      df.write.mode("overwrite").format("noop").save()
      val tRun = System.nanoTime()
      val n = df.count()
      println(f"$name%-24s build=${(tPlan - t0) / 1e9}%8.3fs run=${(tRun - tPlan) / 1e9}%8.3fs rows=$n")
    }
    spark.stop()
  }
}
