package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Scale-checkpoint data generator: replicates the driver's sf0.1 tables
 * `factor`× into an output dir so the bench can be run at sf1 (or beyond)
 * without touching the read-only testdata. Keys are offset per copy so
 * join fan-outs and group cardinalities scale linearly, the way a real
 * larger SF would:
 *
 *  - lineitem/orders: `l_orderkey`/`o_orderkey` offset by copy ×
 *    (maxKey+1) — the li⋈ord join stays 1:n per order, order count grows
 *    `factor`×. `o_custkey` is left alone (customer is a dimension).
 *  - documents: `doc_id` offset; `text` gets a per-copy prefix so the
 *    dedup workload keeps its near-dup RATE instead of manufacturing
 *    `factor`-sized exact-dup cliques that would explode pair output
 *    quadratically and measure a different problem.
 *  - embeddings: `vec_id` offset; vectors unchanged (ANN probe cost is
 *    per-row dot products — content reuse doesn't change the work).
 *  - events: `event_id` offset, `user_id` offset (user count grows with
 *    event count in real streams; keeping users fixed would skew
 *    per-user windows `factor`×).
 *  - dimensions (region nation customer supplier part): copied as-is.
 *
 * Usage: ScaleData <srcSfDir> <outDir> [factor=10]
 */
object ScaleData {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = args.lift(1).getOrElse("/tmp/graft_sf1")
    val factor = args.lift(2).map(_.toInt).getOrElse(10)
    val spark = graft.GraftSession.tune(SparkSession.builder()
        .master(s"local[${math.min(32, Runtime.getRuntime.availableProcessors())}]"),
      math.min(32, Runtime.getRuntime.availableProcessors()))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(name: String): DataFrame =
      spark.read.parquet(s"$src/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")

    def replicate(df: DataFrame, offsetCols: Seq[String],
                  prefixCol: Option[String] = None): DataFrame = {
      val span = df.agg(max(col(offsetCols.head))).head.getLong(0) + 1L
      (0 until factor).map { i =>
        val shifted = offsetCols.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(i * span)))
        prefixCol.fold(shifted)(tc =>
          shifted.withColumn(tc,
            concat(lit(if (i == 0) "" else s"c$i "), col(tc))))
      }.reduce(_ unionAll _)
    }

    write(replicate(read("lineitem"), Seq("l_orderkey")), "lineitem")
    write(replicate(read("orders"), Seq("o_orderkey")), "orders")
    write(replicate(read("documents"), Seq("doc_id"),
      prefixCol = Some("text")), "documents")
    write(replicate(read("embeddings"), Seq("vec_id")), "embeddings")
    write(replicate(read("events"), Seq("event_id", "user_id")), "events")
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(n => write(read(n), n))
    println(s"wrote ${factor}x of $src to $out")
    spark.stop()
  }
}
