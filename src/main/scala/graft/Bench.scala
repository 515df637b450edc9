package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every bench-flagged gate query against
  * SPARK_GRAFT_SF_DIR and prints one JSON line. Results are forced
  * through the noop sink so every output column is actually computed —
  * `.count()` would let the optimizer prune the expensive projections
  * and flatter the numbers.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JIT/codegen/scan setup so the first timed query
    // isn't charged for JVM startup. Exercises each hot codegen family
    // once (hash-agg, decimal sum, string split/md5, vector fold) on
    // tiny limits — the timed queries then measure the operators, not
    // the JIT.
    locally {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.DecimalType
      spark.read.parquet(s"$sfDir/lineitem.parquet").limit(2000)
        .groupBy("l_returnflag")
        .agg(sum(col("l_extendedprice").cast(DecimalType(12, 2))).cast("double").as("s"),
          count(lit(1)).as("n"))
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/documents.parquet").limit(64)
        .select(md5(col("text").cast("binary")).as("h"),
          size(split(col("text"), " ")).as("n"))
        .groupBy("h").agg(sum("n"))
        .write.format("noop").mode("overwrite").save()
      spark.read.parquet(s"$sfDir/embeddings.parquet").limit(64)
        .select(graft.functions.VectorFunctions.l2Norm(
          graft.functions.VectorFunctions.toDouble(col("embedding"))).as("nrm"))
        .write.format("noop").mode("overwrite").save()
    }
    val results = SparkEntry.gateQueries.filter(_.bench).map { q =>
      val t0 = System.nanoTime()
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      q.name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
