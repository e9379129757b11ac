package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off floor measurement: what does a minimal Spark action cost on
  * this host at local[32]? Times (a) a noop write of a 1-row
  * LocalRelation, (b) a noop write of a 500-row LocalRelation, (c) a
  * collect of a small parquet scan, (d) a pure driver-side DataFrame
  * construction with no action. These are the irreducible per-query
  * costs the interactive bench rows (lookup/khop/ssp) sit on; the
  * numbers guide where warm-path work can and cannot help. */
object FloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time(name: String, reps: Int)(f: => Unit): Unit = {
      f // warm
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"$name%-40s min ${times.min}%8.2f ms  med ${times.sorted.apply(reps / 2)}%8.2f ms")
    }

    val one = Seq((42L, "x")).toDF("id", "name")
    val many = (0 until 500).map(i => (i.toLong, i)).toDF("node", "dist")
    val cust = spark.read.parquet("/root/testdata/sf0.1/customer.parquet")

    time("noop write 1-row LocalRelation", 20) {
      one.write.mode("overwrite").format("noop").save()
    }
    time("noop write 500-row LocalRelation", 20) {
      many.write.mode("overwrite").format("noop").save()
    }
    time("collect() 1-row LocalRelation", 20) { one.collect() }
    time("build LocalRelation df (no action)", 20) {
      Seq((42L, "x")).toDF("id", "name")
    }
    time("parquet filter collect (customer)", 10) {
      cust.filter($"c_custkey" === 42).collect()
    }
    time("parquet full collect (customer)", 10) { cust.collect() }

    // Fresh-construction + collect variants: the warm interactive path
    // must rebuild the RESULT DataFrame every pass (caching the answer
    // would memoize the query away), so the construction cost is part of
    // the floor. Compare toDF (implicit encoder) vs createDataFrame with
    // a prepared schema.
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", LongType), StructField("name", StringType)))
    val schema500 = StructType(Seq(StructField("node", LongType), StructField("dist", IntegerType)))
    val rows500: java.util.List[Row] =
      java.util.Arrays.asList((0 until 500).map(i => Row(i.toLong, i)): _*)
    time("fresh toDF(1) + collect", 20) {
      Seq((42L, "x")).toDF("id", "name").collect()
    }
    time("fresh createDataFrame(1) + collect", 20) {
      spark.createDataFrame(java.util.Arrays.asList(Row(42L, "x")), schema).collect()
    }
    time("fresh createDataFrame(500) + collect", 20) {
      spark.createDataFrame(rows500, schema500).collect()
    }
    time("fresh createDataFrame(500) + noop", 20) {
      spark.createDataFrame(rows500, schema500).write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
