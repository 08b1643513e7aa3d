package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import graft.engine.{Chunker, Encoder, TokenRow}

/** Stage-level profiling harness for the encode path (dev tool).
  * args: cpus inputPath [tokensPerChunk]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val inputPath = args(1)
    val tokensPerChunk = if (args.length > 2) args(2).toLong else 2L * 1024 * 1024
    val batchSize = sys.env.getOrElse("PROFILE_BATCH", "512")

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-profile-$cpus")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.parquet.columnarReaderBatchSize", batchSize)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        val wall = (for { s <- i.submissionTime; c <- i.completionTime } yield (c - s) / 1e3).getOrElse(-1.0)
        println(f"[stage ${i.stageId}%3d] tasks=${i.numTasks}%3d wall=$wall%7.1fs cpu=${m.executorCpuTime / 1e9}%7.1fs run=${m.executorRunTime / 1e3}%7.1fs gc=${m.jvmGCTime / 1e3}%6.1fs shW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.0fMB shR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.0fMB spillD=${m.diskBytesSpilled / 1e6}%6.0fMB spillM=${m.memoryBytesSpilled / 1e6}%8.0fMB  ${i.name.take(60)}")
      }
    })

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val ds = spark.read.parquet(inputPath).as[TokenRow]
    println(s"[profile] scan partitions: ${ds.rdd.getNumPartitions} batchSize=$batchSize")

    time("scan: count")(ds.count())
    time("scan+materialize rows (tokens)")(
      ds.mapPartitions(it => Iterator.single(it.map(_.tokens.length.toLong).sum)).reduce(_ + _))

    val chunked = Chunker.chunked(ds, tokensPerChunk)
    time("chunker: plan+count")(chunked.count())

    time("shuffle only: repartition+drain")(
      chunked.repartition(col("chunk_id"))
        .mapPartitions(it => Iterator.single(it.size)).reduce(_ + _))

    val enc = Encoder.encodeTable(ds, tokensPerChunk)
    val n1 = time("encode: full, to noop")(enc.mapPartitions(it => it.map(_.chunk_id)).count())
    println(s"[profile] chunks: $n1")

    time("encode: full + zstd parquet write") {
      Encoder.encodeTable(ds, tokensPerChunk)
        .write.mode("overwrite").option("compression", "zstd")
        .parquet(s"/tmp/graft-profile-out-$cpus")
    }
    spark.stop()
  }
}
