package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.checkpoint.Snapshots

/**
 * materialise / materialise-map / list-feature / evaluate-feature — storing a
 * computed collection as a named feature plus its defining expression
 * (src/diagonal.works/b6/api/functions/materialise.go:37-176,
 * api/functions/features.go:522-537).
 *
 * Spark mapping (SURVEY §1.6): a CollectionFeature is a committed snapshot
 * table; the "expression feature" is a feature row whose reserved
 * `expression` tag names a plan in the registry (Scala plans stand in for the
 * VM language). materialise-map's per-feature fan-out becomes a
 * `partitionBy(key)` write — each key's rows land in their own directory, so
 * `listFeature(key)` reads one partition with partition pruning, not a scan.
 */
object Materialise {

  /** Named-plan registry — the engine's stand-in for stored VM expressions. */
  type Plan = SparkSession => DataFrame
  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Plan]()

  def register(name: String, plan: Plan): Unit = registry.put(name, plan)

  /**
   * materialise (materialise.go:37-80): evaluate the named plan, commit the
   * result as a snapshot table, and return the expression feature row that
   * records the lineage (union it into a world to make the result findable).
   */
  def materialise(spark: SparkSession, root: String, name: String): (DataFrame, Changes.ChangeSet) = {
    val plan = registry.get(name)
    require(plan != null, s"no registered plan named $name")
    val out = Snapshots.stage(spark, root, name, Seq(s"expression:$name"))(plan(spark))
    (out, Changes.addExpression("graft/materialised", math.abs(name.hashCode).toLong,
      Map("@materialised" -> name), name))
  }

  /**
   * materialise-map (materialise.go:83-152): evaluate a keyed plan and
   * persist PER KEY — one partition directory per key value.
   */
  def materialiseMap(spark: SparkSession, root: String, name: String,
                     keyCol: String)(body: => DataFrame): DataFrame = {
    val existing = Snapshots.latestFor(root, name)
    if (existing.isDefined) return spark.read.parquet(existing.get.dataPath)
    val df = body
    val id = Snapshots.latest(root).map(_.id + 1).getOrElse(0L)
    val dataPath = java.nio.file.Paths.get(root, "data", id.toString).toString
    df.write.mode("overwrite").partitionBy(keyCol).parquet(dataPath)
    // commit through the snapshot manifest (atomic rename = the commit point)
    Snapshots.commitExisting(spark, root, name, dataPath, Seq(s"map:$keyCol"))
    spark.read.parquet(dataPath)
  }

  /** materialise-map over a REGISTERED named plan (the shell's entry). */
  def materialiseMapNamed(spark: SparkSession, root: String, name: String,
                          keyCol: String): DataFrame = {
    val plan = registry.get(name)
    require(plan != null, s"no registered plan named $name")
    materialiseMap(spark, root, name, keyCol)(plan(spark))
  }

  /** list-feature (features.go:522-528): read one materialised key back —
    * partition pruning makes this a single-directory read. */
  def listFeature(spark: SparkSession, root: String, name: String,
                  keyCol: String, key: String): DataFrame =
    spark.read.parquet(Snapshots.latestFor(root, name).get.dataPath)
      .where(col(keyCol) === key)

  /** evaluate-feature (features.go:530-537): run the plan named by a
    * feature's reserved `expression` tag. */
  def evaluateFeature(spark: SparkSession, world: DataFrame, ns: String, id: Long): DataFrame = {
    val name = world
      .where(col("id.ns") === ns && col("id.value") === id)
      .select(col("tags").getItem("expression"))
      .head.getString(0)
    val plan = registry.get(name)
    require(plan != null, s"feature $ns/$id names unregistered expression $name")
    plan(spark)
  }
}
