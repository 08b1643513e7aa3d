package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{Chunker, Encoder, TokenRow}

/** Stage-level profiling harness for the encode path (dev tool).
  * args: cpus inputPath [tokensPerChunk]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val inputPath = args(1)
    val tokensPerChunk = if (args.length > 2) args(2).toLong else 2L * 1024 * 1024

    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-profile-$cpus")
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }

    val ds = spark.read.parquet(inputPath).as[TokenRow]

    // parallelism diagnostics
    val scanParts = ds.rdd.getNumPartitions
    println(s"[profile] scan partitions: $scanParts  (maxPartitionBytes=${spark.conf.get("spark.sql.files.maxPartitionBytes")})")

    time("scan: count")(ds.count())
    time("scan: sum(n_tok)")(ds.agg(sum("n_tok")).first())
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

    // post-encode partitions (AQE-decided)
    val encPlan = Encoder.encodeTable(ds, tokensPerChunk)
    time("encode: full + zstd parquet write") {
      encPlan.write.mode("overwrite").option("compression", "zstd")
        .parquet(s"/tmp/graft-profile-out-$cpus")
    }
    val written = spark.read.parquet(s"/tmp/graft-profile-out-$cpus")
    println(s"[profile] written files partitions: ${written.rdd.getNumPartitions}")
    spark.stop()
  }
}
