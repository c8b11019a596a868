package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.Fixtures
import graft.operators.SpatialJoins

/**
 * Benchmark driver. Two parts:
 *  1. per-query wall time for the operator inventory on SPARK_GRAFT_SF_DIR;
 *  2. the north-rule scaling run: the flagship spatial-join + tile-assignment
 *     job over the synthetic image table at two parallelism levels
 *     (local[8] vs local[32] — the sandbox stand-in for N vs 4N executors),
 *     reporting rows/sec at both and the scaling efficiency
 *     thr(32) / (4 * thr(8)).
 *
 * Prints ONE JSON line; also appends the measured numbers to BENCH.md.
 */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  private def materialize(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  /** The north-star job: point-in-polygon join + tile assignment over the
    * image table; returns total output rows (forces full evaluation). */
  private def flagship(spark: SparkSession, n: Long, parts: Int): Long = {
    val images = Fixtures.imagesMeta(spark, n, parts)
    val polys = Fixtures.polygons(spark)
    val pip = SpatialJoins.pointInPolygonJoin(images, polys)
      .select(col("image_id"), col("poly_id"))
    val tiles = SpatialJoins.tileAssignment(Fixtures.imagesMeta(spark, n, parts), 14)
      .groupBy("tile_xx", "tile_yy").agg(count(lit(1)).as("n"))
    pip.count() + tiles.count()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // large enough that the flagship runs >=10s at local[8]; fixed per-job
    // overheads (scheduling, the tiny level-collect job) must not dominate
    // the scaling measurement
    val scaleRows = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROWS", "30000000").toLong

    // part 1: operator inventory timings
    val spark0 = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val sec = try time(materialize(fn(spark0, sfDir))) catch { case _: Throwable => -1.0 }
      name -> sec
    }
    spark0.stop()

    // part 2: scaling (same job, same input, 8 vs 32 cores)
    def runAt(c: Int): (Double, Long) = {
      val s = session(c)
      // warm JIT/codegen once at small n, then measure best-of-2
      flagship(s, 100000L, c)
      var rows = 0L
      val sec = (1 to 2).map(_ => time { rows = flagship(s, scaleRows, c * 4) }).min
      s.stop()
      (sec, rows)
    }
    val (sec8, _) = runAt(8)
    val (sec32, outRows) = runAt(32)
    val thr8 = scaleRows / sec8
    val thr32 = scaleRows / sec32
    val eff = thr32 / (4.0 * thr8)

    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val scaling = f"""{"rows":$scaleRows,"out_rows":$outRows,"sec_8":$sec8%.3f,"sec_32":$sec32%.3f,"""+
      f""""rows_per_sec_8":${thr8.toLong},"rows_per_sec_32":${thr32.toLong},"efficiency":$eff%.3f}"""
    println(s"""{"metric":"spatial-join+tile-assignment rows/sec; scaling eff local[8]->local[32]","value":${thr32.toLong},"unit":"rows/sec","total_query_sec":$total,"queries":$qs,"scaling":$scaling,"sf":"$sfDir"}""")

    val md =
      f"""
         |## Bench ${java.time.Instant.now()}  (sf=$sfDir)
         || parallelism | rows | seconds | rows/sec |
         || --- | --- | --- | --- |
         || local[8]  | $scaleRows | $sec8%.2f | ${thr8.toLong} |
         || local[32] | $scaleRows | $sec32%.2f | ${thr32.toLong} |
         |
         |Scaling efficiency 8->32 cores (N->4N): **$eff%.3f** (target >= 0.8)
         |Total operator-inventory time: $total%.1f s over ${results.size} queries.
         |""".stripMargin
    val benchMd = java.nio.file.Paths.get("BENCH.md")
    java.nio.file.Files.writeString(benchMd, md,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }
}
