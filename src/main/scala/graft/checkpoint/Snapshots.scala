package graft.checkpoint

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/**
 * Snapshot-checkpointed table commits — the resumability layer of the north
 * rule ("every stage resumable from snapshot checkpoints with per-partition
 * lineage and row-count/byte metrics").
 *
 * No Iceberg runtime jar ships in this environment, so this is an honest
 * Iceberg-LIKE layer over Parquet: each commit writes data to an immutable
 * `data/<snapshotId>/` directory, collects row counts via `observe()` and
 * per-partition file metrics, writes a manifest JSON, and atomically renames
 * `_snapshots/<n>.json.tmp` -> `.json` (the commit point, mirroring the
 * reference's canary-overlay transactional apply,
 * src/diagonal.works/b6/ingest/change.go:158-184).
 *
 * Resume: `latest()` returns the last committed snapshot; a stage whose
 * snapshot exists is skipped and its output read back — so a killed pipeline
 * restarts from the last commit, not from zero.
 */
object Snapshots {

  case class Snapshot(id: Long, table: String, dataPath: String, rows: Long,
                      bytes: Long, files: Int, lineage: Seq[String])

  private def snapsDir(root: String): Path = Paths.get(root, "_snapshots")

  /** Committed snapshot ids, oldest first (stream closed eagerly — repeated
    * commits must not leak file descriptors). */
  private def committedIds(root: String): Seq[Long] = {
    val dir = snapsDir(root)
    if (!Files.exists(dir)) return Nil
    val stream = Files.list(dir)
    try {
      stream.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".json")).map(_.stripSuffix(".json").toLong).toSeq.sorted
    } finally stream.close()
  }

  def latest(root: String): Option[Snapshot] =
    committedIds(root).lastOption.map(id => read(root, id))

  /** Newest committed snapshot for a given table — the resume lookup: in a
    * multi-stage pipeline an earlier stage's snapshot is found even when later
    * stages have committed on top of it. */
  def latestFor(root: String, table: String): Option[Snapshot] =
    committedIds(root).reverseIterator.map(id => read(root, id))
      .find(_.table == table)

  /** Time travel: the table's newest snapshot with id <= `asOfId` (Iceberg's
    * snapshot-id read). Data directories are immutable, so any historical
    * snapshot stays readable until explicitly expired. */
  def asOf(spark: SparkSession, root: String, table: String,
           asOfId: Long): Option[DataFrame] =
    committedIds(root).reverseIterator.map(id => read(root, id))
      .find(s => s.table == table && s.id <= asOfId)
      .map(s => spark.read.parquet(s.dataPath))

  /** All committed snapshots of a table, oldest first — the history listing
    * behind time travel and expiry decisions. */
  def history(root: String, table: String): Seq[Snapshot] =
    committedIds(root).map(id => read(root, id)).filter(_.table == table)

  def read(root: String, id: Long): Snapshot = {
    val json = Files.readString(snapsDir(root).resolve(s"$id.json"))
    def field(k: String): String = {
      val m = ("\"" + k + "\"\\s*:\\s*(\"[^\"]*\"|[0-9]+)").r.findFirstMatchIn(json)
      m.map(_.group(1).stripPrefix("\"").stripSuffix("\"")).getOrElse("")
    }
    val lineage = "\"lineage\"\\s*:\\s*\\[([^\\]]*)\\]".r.findFirstMatchIn(json)
      .map(_.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    Snapshot(field("id").toLong, field("table"), field("dataPath"),
      field("rows").toLong, field("bytes").toLong, field("files").toInt, lineage)
  }

  /**
   * Commit `df` as the next snapshot of `root`. Returns the snapshot. The data
   * write and metric collection happen BEFORE the manifest rename; a crash at
   * any earlier point leaves the previous snapshot intact and the orphan data
   * directory ignorable.
   */
  def commit(df: DataFrame, root: String, table: String,
             lineage: Seq[String] = Nil): Snapshot = {
    val id = latest(root).map(_.id + 1).getOrElse(0L)
    val dataPath = Paths.get(root, "data", id.toString).toString
    df.write.mode("overwrite").parquet(dataPath)
    commitExisting(df.sparkSession, root, table, dataPath, lineage)
  }

  /** Commit a manifest over data ALREADY written to `dataPath` (used by
    * partitioned writes like materialise-map, where the layout is chosen by
    * the writer). Same atomic-rename commit point as `commit`. */
  def commitExisting(spark: SparkSession, root: String, table: String,
                     dataPath: String, lineage: Seq[String] = Nil): Snapshot = {
    val id = latest(root).map(_.id + 1).getOrElse(0L)
    val dataDir = Paths.get(dataPath)
    val files = {
      val stream = Files.walk(dataDir)
      try stream.iterator().asScala.filter(_.toString.endsWith(".parquet")).toSeq
      finally stream.close()
    }
    val bytes = files.map(Files.size).sum
    // ONE pass collects per-file row counts AND min/max column stats for the
    // atomic columns (the Iceberg-manifest pruning metadata): grouped by
    // input_file_name, so the total row count falls out of the same job
    val pf = spark.read.parquet(dataPath)
    val statable = pf.schema.fields.filter(f => f.dataType match {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.StringType => true
      case org.apache.spark.sql.types.DateType => true
      case _ => false
    }).map(_.name)
    val aggs = count(lit(1)).as("__rows") +: statable.flatMap(n =>
      Seq(min(col(n)).cast("string").as(s"__min_$n"), max(col(n)).cast("string").as(s"__max_$n")))
    val perFile = pf.groupBy(input_file_name().as("__file")).agg(aggs.head, aggs.tail: _*)
      .collect().map { r =>
        val f = r.getAs[String]("__file")
        val stats = statable.flatMap { n =>
          (Option(r.getAs[String](s"__min_$n")), Option(r.getAs[String](s"__max_$n"))) match {
            case (Some(mn), Some(mx)) => Some(n -> (mn, mx))
            case _ => None
          }
        }.toMap
        (f, r.getAs[Long]("__rows"), stats)
      }
    val rows = perFile.map(_._2).sum
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val fileLines = perFile.map { case (uri, nRows, stats) =>
      // store the path RELATIVE to dataPath so partitioned layouts
      // (key=.../part-*.parquet) stay addressable for pruned reads
      val abs = Paths.get(new java.net.URI(uri).getPath)
      val rel = dataDir.toAbsolutePath.relativize(abs.toAbsolutePath).toString
      val statJson = stats.toSeq.sortBy(_._1).map { case (n, (mn, mx)) =>
        s""""${esc(n)}":{"min":"${esc(mn)}","max":"${esc(mx)}"}"""
      }.mkString(",")
      s"""{"file":"${esc(rel)}","rows":$nRows,"bytes":${Files.size(abs)},"stats":{$statJson}}"""
    }
    val snap = Snapshot(id, table, dataPath, rows, bytes, files.size, lineage)
    Files.createDirectories(snapsDir(root))
    val manifest =
      s"""{"id":$id,"table":"$table","dataPath":"$dataPath","rows":$rows,
         |"bytes":$bytes,"files":${files.size},
         |"lineage":[${lineage.map(l => "\"" + l + "\"").mkString(",")}],
         |"partitions":[${fileLines.mkString(",")}]}""".stripMargin
    val tmp = snapsDir(root).resolve(s"$id.json.tmp")
    Files.writeString(tmp, manifest)
    Files.move(tmp, snapsDir(root).resolve(s"$id.json"), StandardCopyOption.ATOMIC_MOVE)
    snap
  }

  /** Per-file pruning metadata of a committed snapshot:
    * (relative file path, rows, column -> (min, max) as strings). */
  def fileStats(root: String, id: Long): Seq[(String, Long, Map[String, (String, String)])] = {
    val json = Files.readString(snapsDir(root).resolve(s"$id.json"))
    val entry = """\{"file":"((?:[^"\\]|\\.)*)","rows":(\d+),"bytes":\d+,"stats":\{(.*?)\}\}""".r
    val stat = """"((?:[^"\\]|\\.)*)":\{"min":"((?:[^"\\]|\\.)*)","max":"((?:[^"\\]|\\.)*)"\}""".r
    def unesc(s: String) = s.replace("\\\"", "\"").replace("\\\\", "\\")
    entry.findAllMatchIn(json).map { m =>
      val stats = stat.findAllMatchIn(m.group(3))
        .map(s => unesc(s.group(1)) -> (unesc(s.group(2)), unesc(s.group(3)))).toMap
      (unesc(m.group(1)), m.group(2).toLong, stats)
    }.toSeq
  }

  /**
   * Stats-pruned scan: read only the files of `table`'s latest snapshot whose
   * [min, max] range for `column` can overlap [lo, hi] (numeric compare) —
   * manifest-level file skipping, the Iceberg pruning shape. Files without
   * stats for the column are conservatively kept. The caller still applies
   * the exact predicate; this bounds which files are opened at all.
   */
  def scanPruned(spark: SparkSession, root: String, table: String,
                 column: String, lo: Double, hi: Double): DataFrame = {
    val snap = latestFor(root, table).getOrElse(
      throw new IllegalStateException(s"no snapshot for table $table"))
    val stats = fileStats(root, snap.id)
    val keep = stats.filter { case (_, _, st) =>
      st.get(column).forall { case (mn, mx) =>
        val (a, b) = (mn.toDouble, mx.toDouble)
        a <= hi && b >= lo
      }
    }.map { case (rel, _, _) => Paths.get(snap.dataPath).resolve(rel).toString }
    if (keep.isEmpty) spark.read.parquet(snap.dataPath).limit(0)
    else spark.read.parquet(keep: _*)
  }

  /**
   * Expire old history: keep the newest `keepLast` snapshots PER TABLE,
   * delete older manifests and their data directories, and vacuum orphan
   * `data/<id>` directories that no kept manifest references (crashed
   * commits). Kept snapshots — including time travel over them — stay
   * readable. Returns the expired snapshot ids.
   */
  def expire(root: String, keepLast: Int): Seq[Long] = {
    require(keepLast >= 1, "keepLast must be >= 1")
    val all = committedIds(root).map(id => read(root, id))
    val keepIds = all.groupBy(_.table).values.flatMap(_.takeRight(keepLast)).map(_.id).toSet
    val dropped = all.filterNot(s => keepIds.contains(s.id))
    dropped.foreach { s =>
      deleteRecursively(Paths.get(s.dataPath))
      Files.deleteIfExists(snapsDir(root).resolve(s"${s.id}.json"))
    }
    // orphans: data dirs no kept manifest points at (e.g. a crash between
    // data write and manifest rename)
    val referenced = all.filter(s => keepIds.contains(s.id))
      .map(s => Paths.get(s.dataPath).toAbsolutePath.normalize.toString).toSet
    val dataRoot = Paths.get(root, "data")
    if (Files.exists(dataRoot)) {
      val stream = Files.list(dataRoot)
      val children = try stream.iterator().asScala.toSeq finally stream.close()
      children.filterNot(c => referenced.contains(c.toAbsolutePath.normalize.toString))
        .foreach(deleteRecursively)
    }
    dropped.map(_.id)
  }

  private def deleteRecursively(p: Path): Unit = {
    if (!Files.exists(p)) return
    val stream = Files.walk(p)
    val all = try stream.iterator().asScala.toSeq finally stream.close()
    all.sortBy(-_.getNameCount).foreach(Files.deleteIfExists(_))
  }

  /** Run `stage` unless its output snapshot already exists (resume path):
    * ANY committed snapshot of `table` is reused, so resuming a multi-stage
    * pipeline skips every stage that already committed instead of re-running
    * and re-appending the earlier ones. */
  def stage(spark: SparkSession, root: String, table: String,
            lineage: Seq[String])(body: => DataFrame): DataFrame = {
    latestFor(root, table) match {
      case Some(s) =>
        spark.read.parquet(s.dataPath)
      case None =>
        val snap = commit(body, root, table, lineage)
        spark.read.parquet(snap.dataPath)
    }
  }

  private implicit class IterScala[A](it: java.util.Iterator[A]) {
    def asScala: Iterator[A] = new Iterator[A] {
      def hasNext: Boolean = it.hasNext
      def next(): A = it.next()
    }
  }
}
