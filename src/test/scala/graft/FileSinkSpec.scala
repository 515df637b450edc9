package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming file sink: checkpoint + output manifest give exactly-once
  * delivery ACROSS query restarts — the operational contract a
  * production stream job relies on (no duplicates after a crash, no
  * loss for new data).
  */
class FileSinkSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("parquet sink is exactly-once across a query restart") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("fsink")
    val src = root.resolve("src").toString
    val out = root.resolve("out").toString
    val ckp = root.resolve("ckp").toString

    (1 to 100).map(i => (i.toLong, s"a$i")).toDF("id", "tag")
      .coalesce(1).write.mode("append").parquet(src)
    val schema = spark.read.parquet(src).schema

    def runOnce(): Unit = {
      val q = spark.readStream.schema(schema).parquet(src)
        .withColumn("doubled", col("id") * 2)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckp)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    runOnce()
    assert(spark.read.parquet(out).count() === 100)

    // new data lands, the query restarts from the checkpoint: old
    // batches must NOT be reprocessed, new ones must all arrive
    (101 to 150).map(i => (i.toLong, s"b$i")).toDF("id", "tag")
      .coalesce(1).write.mode("append").parquet(src)
    runOnce()

    val res = spark.read.parquet(out)
    assert(res.count() === 150, "no loss, no duplicates")
    assert(res.select(countDistinct(col("id"))).collect()(0).getLong(0) === 150)
    assert(res.filter(col("doubled") =!= col("id") * 2).count() === 0)
  }
}
