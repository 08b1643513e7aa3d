package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.engine.{Encoder, TokenRow}

/** Dev tool: run ONLY the encode+write job N times in one fresh JVM to
  * isolate progressive in-JVM degradation. args: cpus inputPath runs
  */
object ProfileW {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val inputPath = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-profilew-$cpus")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.columnarReaderBatchSize", "512")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        if (m.executorRunTime > 3000) {
          val wall = (for { s <- i.submissionTime; c <- i.completionTime } yield (c - s) / 1e3).getOrElse(-1.0)
          println(f"[stage ${i.stageId}%3d] tasks=${i.numTasks}%3d wall=$wall%7.1fs cpu=${m.executorCpuTime / 1e9}%7.1fs run=${m.executorRunTime / 1e3}%7.1fs gc=${m.jvmGCTime / 1e3}%6.1fs shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.0fMB shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.0fMB")
        }
      }
    })

    val tokensPerChunk = sys.env.getOrElse("PW_TOKENS_PER_CHUNK", "2097152").toLong
    val partitioned = sys.env.getOrElse("PW_PARTITIONED", "false").toBoolean
    val outDir = sys.env.getOrElse("PW_OUT", "/tmp/graft-profilew-out")
    println(s"[profilew] tokensPerChunk=$tokensPerChunk partitioned=$partitioned out=$outDir")
    val ds = spark.read.parquet(inputPath).as[TokenRow]
    var i = 0
    while (i < runs) {
      val t0 = System.nanoTime()
      val w = Encoder.encodeTable(ds, tokensPerChunk)
        .write.mode("overwrite").option("compression", "zstd")
      (if (partitioned) w.partitionBy("part_source") else w).parquet(outDir)
      println(f"[profilew] run$i: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      i += 1
    }
    spark.stop()
  }
}
