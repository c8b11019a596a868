package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A session built with spark.sql.extensions=graft.functions.GraftExtensions
  * can use the cell/tile expressions straight from SQL. */
class ExtensionsSpec extends AnyFunSuite {
  test("GraftExtensions injects the expression registry at session build") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // note: shares the JVM-wide SparkContext with other suites; the
      // extension applies to this session's function registry
      val row = spark.sql(
        "SELECT cell_of(51.5353d, -0.1258d, 16) AS c, " +
          "tile_x(-0.1258d, 14) AS tx, haversine_m(51.5d, -0.1d, 51.6d, -0.1d) AS d").head()
      assert(row.getAs[Long]("c") == graft.core.Cells.cellOf(51.5353, -0.1258, 16))
      assert(row.getAs[Long]("tx") == graft.core.GeoOps.tileX(-0.1258, 14))
      assert(math.abs(row.getAs[Double]("d") - graft.core.GeoOps.haversineMeters(51.5, -0.1, 51.6, -0.1)) < 1e-9)
    } finally {
      // leave the shared context running for other suites
    }
  }
}
