package graft

import graft.checkpoint.Snapshots
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** Snapshot layer: manifest column stats drive file skipping, and expiry
  * vacuums history while keeping the retained window readable — the two
  * Iceberg-shape behaviors the "Iceberg-like" claim implies. */
class SnapshotsSpec extends SparkSuite {

  test("scanPruned skips files by manifest min/max stats and keeps results exact") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-snap-stats").toString
    // range-partitioned write -> files with disjoint k ranges
    val df = (0 until 1000).map(i => (i.toLong, s"v$i")).toDF("k", "v")
      .repartitionByRange(4, col("k"))
    val snap = Snapshots.commit(df, root, "t")
    assert(snap.rows == 1000L && snap.files == 4)
    val stats = Snapshots.fileStats(root, snap.id)
    assert(stats.size == 4 && stats.forall(_._3.contains("k")))
    assert(stats.map(_._2).sum == 1000L)

    val pruned = Snapshots.scanPruned(spark, root, "t", "k", 0.0, 10.0)
    assert(pruned.inputFiles.length < 4, s"expected file skipping, read ${pruned.inputFiles.length}")
    val got = pruned.where(col("k") <= 10).select("k").collect().map(_.getLong(0)).toSet
    assert(got == (0L to 10L).toSet)
    // a full-range scan keeps every file
    assert(Snapshots.scanPruned(spark, root, "t", "k", 0.0, 999.0).inputFiles.length == 4)
    // an out-of-range scan reads nothing
    assert(Snapshots.scanPruned(spark, root, "t", "k", 5000.0, 6000.0).count() == 0L)
  }

  test("expire(keepLast) drops old snapshots + orphan dirs, keeps retained history readable") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-snap-expire").toString
    val s0 = Snapshots.commit(Seq((1L, "a")).toDF("k", "v"), root, "t")
    val s1 = Snapshots.commit(Seq((2L, "b")).toDF("k", "v"), root, "t")
    val s2 = Snapshots.commit(Seq((3L, "c")).toDF("k", "v"), root, "t")
    // a crashed commit's orphan data dir (data written, manifest never renamed)
    val orphan = Paths.get(root, "data", "99")
    Files.createDirectories(orphan)
    Files.writeString(orphan.resolve("part-orphan.parquet"), "junk")

    val expired = Snapshots.expire(root, keepLast = 2)
    assert(expired == Seq(s0.id))
    assert(!Files.exists(Paths.get(s0.dataPath)), "expired data dir must be gone")
    assert(!Files.exists(orphan), "orphan data dir must be vacuumed")
    // retained window: latest readable, previous readable via time travel
    assert(Snapshots.history(root, "t").map(_.id) == Seq(s1.id, s2.id))
    assert(spark.read.parquet(Snapshots.latestFor(root, "t").get.dataPath)
      .select("v").head.getString(0) == "c")
    assert(Snapshots.asOf(spark, root, "t", s1.id).get
      .select("v").head.getString(0) == "b")
    // a fresh commit after expiry allocates a NEW id (no reuse of expired ids)
    val s3 = Snapshots.commit(Seq((4L, "d")).toDF("k", "v"), root, "t")
    assert(s3.id > s2.id)
  }
}
