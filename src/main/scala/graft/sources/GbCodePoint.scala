package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * GB Code-Point Open ingest — postcode centroids as point features
 * (src/diagonal.works/b6/cmd/b6-ingest-gb-codepoint/b6-ingest-gb-codepoint.go):
 * CSV rows (Postcode, Eastings, Northings) on the British National Grid
 * (EPSG:27700) become `#place=postal_code` point features under the
 * ordnancesurvey.co.uk/code-point namespace (b6/world.go:363), ids packed
 * from the postcode text (b6/ids.go:16-39, 6 bits/char + 2 length bits).
 *
 * The reference shells out to GDAL for EPSG:27700 -> WGS84; this engine does
 * the standard Ordnance Survey algorithm in pure Scala (public constants
 * from "A guide to coordinate systems in Great Britain"): inverse Transverse
 * Mercator on Airy 1830 -> geodetic->cartesian -> 7-parameter Helmert
 * (OSGB36->WGS84) -> cartesian->geodetic on GRS80. Accuracy ~5 m, same class
 * as the single-Helmert GDAL path the reference uses.
 *
 * Spark shape: a CSV scan + one codegen-friendly deterministic UDF per row —
 * embarrassingly parallel, no shuffle.
 */
object GbCodePoint {

  // ---- postcode id packing (b6/ids.go:9-60) ---------------------------------

  val Namespace = "ordnancesurvey.co.uk/code-point"
  private val MinLen = 5
  private val MaxLen = 7

  /** 6 bits per [0-9A-Z] char, then 2 bits of (length - 5); -1 on invalid. */
  def postcodeId(postcode: String): Long = {
    val p = postcode.replace(" ", "").toUpperCase
    if (p.length < MinLen || p.length > MaxLen) return -1L
    var id = 0L
    var i = 0
    while (i < p.length) {
      val r = p.charAt(i)
      val v =
        if (r >= '0' && r <= '9') (r - '0').toLong
        else if (r >= 'A' && r <= 'Z') (r - 'A').toLong + 10
        else return -1L
      if (i > 0) id <<= 6
      id |= v
      i += 1
    }
    (id << 2) | (p.length - MinLen).toLong
  }

  def postcodeFromId(id: Long): Option[String] = {
    val n = MinLen + (id & 3L).toInt
    var v = id >>> 2
    val sb = new StringBuilder
    var i = 0
    while (i < n) {
      val c = (v & 63L).toInt
      if (c < 10) sb.insert(0, ('0' + c).toChar)
      else if (c < 36) sb.insert(0, ('A' + (c - 10)).toChar)
      else return None
      v >>>= 6
      i += 1
    }
    Some(sb.toString)
  }

  // ---- EPSG:27700 -> WGS84 ---------------------------------------------------

  // Airy 1830 ellipsoid + National Grid Transverse Mercator parameters
  private val AiryA = 6377563.396
  private val AiryB = 6356256.909
  private val F0 = 0.9996012717
  private val Lat0 = math.toRadians(49.0)
  private val Lon0 = math.toRadians(-2.0)
  private val E0 = 400000.0
  private val N0 = -100000.0
  // GRS80/WGS84 ellipsoid
  private val WgsA = 6378137.0
  private val WgsB = 6356752.3141
  // Helmert OSGB36 -> WGS84 (negated OS WGS84->OSGB36 parameters)
  private val Tx = 446.448; private val Ty = -125.157; private val Tz = 542.060
  private val S = -20.4894e-6
  private val Rx = math.toRadians(0.1502 / 3600.0)
  private val Ry = math.toRadians(0.2470 / 3600.0)
  private val Rz = math.toRadians(0.8421 / 3600.0)

  /** Inverse Transverse Mercator: (easting, northing) -> OSGB36 lat/lon (radians). */
  def osgb36FromGrid(e: Double, n: Double): (Double, Double) = {
    val a = AiryA; val b = AiryB
    val e2 = (a * a - b * b) / (a * a)
    val nn = (a - b) / (a + b)
    var lat = Lat0
    var m = 0.0
    // iterate the meridional arc until it matches the northing
    var continue = true
    while (continue) {
      lat = (n - N0 - m) / (a * F0) + lat
      val dLat = lat - Lat0; val sLat = lat + Lat0
      m = b * F0 * (
        (1.0 + nn + 1.25 * nn * nn + 1.25 * nn * nn * nn) * dLat
          - (3.0 * nn + 3.0 * nn * nn + 2.625 * nn * nn * nn) * math.sin(dLat) * math.cos(sLat)
          + (1.875 * nn * nn + 1.875 * nn * nn * nn) * math.sin(2.0 * dLat) * math.cos(2.0 * sLat)
          - (35.0 / 24.0) * nn * nn * nn * math.sin(3.0 * dLat) * math.cos(3.0 * sLat))
      continue = math.abs(n - N0 - m) >= 0.00001
    }
    val sin = math.sin(lat); val cos = math.cos(lat)
    val tan = sin / cos
    val nu = a * F0 / math.sqrt(1.0 - e2 * sin * sin)
    val rho = a * F0 * (1.0 - e2) / math.pow(1.0 - e2 * sin * sin, 1.5)
    val eta2 = nu / rho - 1.0
    val vii = tan / (2.0 * rho * nu)
    val viii = tan / (24.0 * rho * nu * nu * nu) *
      (5.0 + 3.0 * tan * tan + eta2 - 9.0 * tan * tan * eta2)
    val ix = tan / (720.0 * rho * math.pow(nu, 5)) * (61.0 + 90.0 * tan * tan + 45.0 * math.pow(tan, 4))
    val x = 1.0 / cos / nu
    val xi = 1.0 / cos / (6.0 * nu * nu * nu) * (nu / rho + 2.0 * tan * tan)
    val xii = 1.0 / cos / (120.0 * math.pow(nu, 5)) * (5.0 + 28.0 * tan * tan + 24.0 * math.pow(tan, 4))
    val xiia = 1.0 / cos / (5040.0 * math.pow(nu, 7)) *
      (61.0 + 662.0 * tan * tan + 1320.0 * math.pow(tan, 4) + 720.0 * math.pow(tan, 6))
    val de = e - E0
    val latOut = lat - vii * de * de + viii * math.pow(de, 4) - ix * math.pow(de, 6)
    val lonOut = Lon0 + x * de - xi * de * de * de + xii * math.pow(de, 5) - xiia * math.pow(de, 7)
    (latOut, lonOut)
  }

  private def toCartesian(lat: Double, lon: Double, a: Double, b: Double): (Double, Double, Double) = {
    val e2 = (a * a - b * b) / (a * a)
    val nu = a / math.sqrt(1.0 - e2 * math.sin(lat) * math.sin(lat))
    (nu * math.cos(lat) * math.cos(lon),
      nu * math.cos(lat) * math.sin(lon),
      nu * (1.0 - e2) * math.sin(lat))
  }

  private def toGeodetic(x: Double, y: Double, z: Double, a: Double, b: Double): (Double, Double) = {
    val e2 = (a * a - b * b) / (a * a)
    val p = math.sqrt(x * x + y * y)
    var lat = math.atan2(z, p * (1.0 - e2))
    var i = 0
    while (i < 10) {
      val nu = a / math.sqrt(1.0 - e2 * math.sin(lat) * math.sin(lat))
      lat = math.atan2(z + e2 * nu * math.sin(lat), p)
      i += 1
    }
    (lat, math.atan2(y, x))
  }

  /** 7-parameter Helmert OSGB36 -> WGS84 on cartesian coordinates. */
  private def helmert(x: Double, y: Double, z: Double): (Double, Double, Double) = {
    (Tx + (1.0 + S) * x - Rz * y + Ry * z,
      Ty + Rz * x + (1.0 + S) * y - Rx * z,
      Tz - Ry * x + Rx * y + (1.0 + S) * z)
  }

  /** British National Grid easting/northing -> WGS84 (lat, lng) degrees. */
  def wgs84FromGrid(easting: Double, northing: Double): (Double, Double) = {
    val (la36, lo36) = osgb36FromGrid(easting, northing)
    val (x, y, z) = toCartesian(la36, lo36, AiryA, AiryB)
    val (xw, yw, zw) = helmert(x, y, z)
    val (la, lo) = toGeodetic(xw, yw, zw, WgsA, WgsB)
    (math.toDegrees(la), math.toDegrees(lo))
  }

  /**
   * Ingest a Code-Point Open CSV (postcode, eastings, northings; no header,
   * like the reference's Data/CSV members) into world-shaped point features.
   */
  def features(spark: SparkSession, csvPath: String): DataFrame = {
    graft.functions.CellExprs.install(spark)
    val toWgs = udf { (e: Double, n: Double) => wgs84FromGrid(e, n) }
    val pid = udf { (p: String) => postcodeId(p) }
    val wkbPoint = udf((lat: Double, lng: Double) =>
      graft.core.GeoOps.toWkb(graft.core.GeoOps.point(lat, lng)))
    spark.read.csv(csvPath)
      .select(col("_c0").as("postcode"),
        col("_c1").try_cast("double").as("easting"), col("_c2").try_cast("double").as("northing"))
      .where(col("easting").isNotNull && col("northing").isNotNull)
      .withColumn("__ll", toWgs(col("easting"), col("northing")))
      .select(
        struct(lit("point").as("ftype"), lit(Namespace).as("ns"),
          pid(col("postcode")).as("value")).as("id"),
        map(lit("#place"), lit("postal_code"), lit("postcode"), col("postcode")).as("tags"),
        col("__ll._1").as("lat"), col("__ll._2").as("lng"))
      .where(col("id.value") >= 0) // invalid postcodes drop, like the reference errors
      .withColumn("geom", wkbPoint(col("lat"), col("lng")))
      .withColumn("cell16", graft.functions.CellExprs.cell_of(col("lat"), col("lng"), lit(16)))
      .withColumn("covering", graft.functions.CellExprs.cell_covering(col("geom"), lit(16), lit(5)))
  }
}
