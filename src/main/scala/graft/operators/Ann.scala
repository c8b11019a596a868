package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * Brute-force cosine top-k is the exactness baseline; the LSH variant
 * (signed-random-projection buckets) is the 10^12-scale path: bucket join
 * instead of cross join, with the same scoring on the reduced candidate set.
 * Dot products use zip_with/aggregate (codegen'd) in double precision.
 */
object Ann {

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  private def norm(a: org.apache.spark.sql.Column) =
    sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double")))

  /**
   * Exact top-k cosine neighbors for each query vector.
   * data: (id, vec), queries: (qid, qvec). Broadcast the (small) query side;
   * the scan over `data` is a single no-shuffle map, then a per-query top-k.
   */
  def cosineTopK(data: DataFrame, queries: DataFrame, k: Int,
                 idCol: String = "vec_id", vecCol: String = "embedding",
                 qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val scored = data.join(broadcast(queries))
      .where(col(idCol) =!= col(qidCol))
      .withColumn("cosine",
        dot(col(vecCol), col(qvecCol)) / (norm(col(vecCol)) * norm(col(qvecCol))))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("cosine").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol).as("neighbor_id"), col("cosine"))
  }

  /** Deterministic pseudo-random hyperplane component h_{p,d} in {-1, +1}. */
  private def hyperplaneSign(p: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =
    when(xxhash64(p, d).bitwiseAND(lit(1L)) === 1L, lit(1.0)).otherwise(lit(-1.0))

  /** Signed-random-projection bucket id over `bits` hyperplanes. */
  def srpBucket(vecCol: org.apache.spark.sql.Column, bits: Int): org.apache.spark.sql.Column = {
    val planeDots = transform(sequence(lit(0), lit(bits - 1)), p =>
      aggregate(zip_with(vecCol, sequence(lit(0), size(vecCol) - 1),
        (v, d) => v.cast("double") * hyperplaneSign(p, d)),
        lit(0.0), (acc, v) => acc + v))
    aggregate(
      zip_with(planeDots, sequence(lit(0), lit(bits - 1)),
        (pd, p) => when(pd > 0, call_function("shiftleft", lit(1L), p.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }

  /**
   * LSH-bucketed approximate NN: join on SRP bucket (optionally multi-probe
   * with `tables` independent hash tables), then exact cosine within buckets.
   * Recall < 1 by construction; tested against the brute-force baseline.
   */
  def cosineLsh(data: DataFrame, queries: DataFrame, k: Int, bits: Int = 12,
                tables: Int = 4,
                idCol: String = "vec_id", vecCol: String = "embedding",
                qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val t = explode(sequence(lit(0), lit(tables - 1)))
    def withBuckets(df: DataFrame, vc: String) = df
      .withColumn("__t", t)
      // per-table hyperplanes: offset the plane index by table * bits
      .withColumn("__bucket", srpBucketOffset(col(vc), bits, col("__t")))
    val d = withBuckets(data, vecCol)
    val q = withBuckets(queries, qvecCol)
    val cand = d.join(broadcast(q), Seq("__t", "__bucket"))
      .where(col(idCol) =!= col(qidCol))
      .dropDuplicates(idCol, qidCol)
      .withColumn("cosine",
        dot(col(vecCol), col(qvecCol)) / (norm(col(vecCol)) * norm(col(qvecCol))))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("cosine").desc, col(idCol))
    cand.withColumn("rank", row_number().over(w)).where(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol).as("neighbor_id"), col("cosine"))
  }

  private def srpBucketOffset(vecCol: org.apache.spark.sql.Column, bits: Int,
                              table: org.apache.spark.sql.Column) = {
    val planeDots = transform(sequence(lit(0), lit(bits - 1)), p =>
      aggregate(zip_with(vecCol, sequence(lit(0), size(vecCol) - 1),
        (v, d) => v.cast("double") * hyperplaneSign(p + table * bits, d)),
        lit(0.0), (acc, v) => acc + v))
    aggregate(
      zip_with(planeDots, sequence(lit(0), lit(bits - 1)),
        (pd, p) => when(pd > 0, call_function("shiftleft", lit(1L), p.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, x) => acc.bitwiseOR(x))
  }
}
