package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.checkpoint.Snapshots
import graft.model.Fixtures
import graft.operators.SpatialJoins

/**
 * The flagship job as a RESUMABLE staged pipeline — the north rule's
 * "every stage resumable from snapshot checkpoints with per-partition
 * lineage and row-count/byte metrics", concretely:
 *
 *   stage `images`  — image-table scan + cell index (the ingest surface)
 *   stage `pip`     — point-in-polygon covering join against the feature side
 *   stage `tiles`   — zoom-14 tile assignment + per-(tile, polygon) counts
 *
 * Each stage commits through [[Snapshots]]: data lands in an immutable
 * directory, the manifest records rows / bytes / per-partition file sizes /
 * upstream lineage, and the atomic manifest rename is the commit point. A
 * killed run re-entered with the same root SKIPS every committed stage and
 * reads its output back — `Snapshots.stage` is the resume path, so the work
 * lost is bounded by one stage, never the pipeline.
 *
 * args: root [nRows]. Prints one line per stage: reused or computed + metrics.
 */
object Pipeline {

  case class StageReport(table: String, reused: Boolean, rows: Long,
                         bytes: Long, files: Int, lineage: Seq[String])

  /** Run (or resume) the staged flagship; returns per-stage reports. */
  def run(spark: SparkSession, root: String, nRows: Long,
          partitions: Int = 32): Seq[StageReport] = {
    val reports = Seq.newBuilder[StageReport]
    def staged(table: String, lineage: Seq[String])(body: => DataFrame): DataFrame = {
      val before = Snapshots.latestFor(root, table)
      val out = Snapshots.stage(spark, root, table, lineage)(body)
      val snap = Snapshots.latestFor(root, table).get
      reports += StageReport(table, before.isDefined, snap.rows, snap.bytes,
        snap.files, snap.lineage)
      out
    }

    // decode stage: the north rule's per-row invariant (each image decoded
    // ONCE; PSNR >= 40 dB for lossy, caption byte-equality) recorded as a
    // committed table — the payload-bearing slice of the run (decode cost
    // scales with bytes, so it samples; the metadata stages run at nRows)
    staged("decode", Seq("fixtures:images")) {
      graft.operators.ImageOps.decodeFeatures(
        Fixtures.images(spark, math.min(nRows, 5000L))).toDF()
        .select(col("image_id"), col("w"), col("h"), col("fmt"),
          (col("psnr_db") >= 40.0).as("psnr_ok"), col("caption"), col("decoded_ok"))
    }
    val images = staged("images", Seq("fixtures:imagesMeta")) {
      Fixtures.imagesMeta(spark, nRows, partitions)
    }
    val polygons = Fixtures.polygons(spark) // feature side: index-build artifact
    val pip = staged("pip", Seq("images")) {
      SpatialJoins.pointInPolygonJoin(images, polygons)
        .select(col("image_id"), col("poly_id"), col("lat"), col("lng"), col("cell16"))
    }
    staged("tiles", Seq("pip")) {
      SpatialJoins.tileAssignment(pip, 14)
        .groupBy(col("tile_xx"), col("tile_yy"), col("poly_id"))
        .agg(count(lit(1)).as("n"))
    }
    reports.result()
  }

  def main(args: Array[String]): Unit = {
    val root = args.headOption.getOrElse("/tmp/graft-pipeline")
    val n = args.lift(1).map(_.toLong).getOrElse(1000000L)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    run(spark, root, n).foreach { r =>
      println(s"[pipeline] ${r.table}: ${if (r.reused) "RESUMED" else "computed"} " +
        s"rows=${r.rows} bytes=${r.bytes} files=${r.files} lineage=${r.lineage.mkString(",")}")
    }
    spark.stop()
  }
}
