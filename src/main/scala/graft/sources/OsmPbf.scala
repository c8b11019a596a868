package graft.sources

import java.util.zip.Inflater

/**
 * Minimal OSM PBF reader, written from the public format specification
 * (wiki.openstreetmap.org/wiki/PBF_Format; protobuf wire format). Enough to
 * load the reference's golden test extracts (granary-square.osm.pbf,
 * camden.osm.pbf) so our engine can be asserted against the same golden
 * counts the reference tests use (b6/test/camden/camden.go:14-83,
 * python/diagonal_b6/b6_test.py:15-36).
 *
 * Hand-rolled protobuf decode (varint/zigzag/length-delimited) — no
 * protobuf-java dependency needed for this fixed, stable schema.
 */
object OsmPbf {

  case class Node(id: Long, lat: Double, lon: Double, tags: Map[String, String])
  case class Way(id: Long, refs: Array[Long], tags: Map[String, String])
  case class Member(ref: Long, mtype: Int /*0 node,1 way,2 rel*/ , role: String)
  case class Relation(id: Long, members: Array[Member], tags: Map[String, String])
  case class Osm(nodes: Vector[Node], ways: Vector[Way], relations: Vector[Relation])

  // ---- protobuf wire primitives ---------------------------------------------

  final class Reader(val buf: Array[Byte], var pos: Int, val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0; var out = 0L
      while (true) {
        val b = buf(pos); pos += 1
        out |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return out
        shift += 7
      }
      out
    }
    def zigzag(): Long = { val v = varint(); (v >>> 1) ^ -(v & 1) }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 => pos += 8
      case 2 => val len = varint().toInt; pos += len
      case 5 => pos += 4
    }
    def bytes(): (Int, Int) = { // (offset, length) view
      val len = varint().toInt
      val off = pos
      pos += len
      (off, len)
    }
    def sub(): Reader = { val (off, len) = bytes(); new Reader(buf, off, off + len) }
    def packedVarints(): Array[Long] = {
      val r = sub()
      val out = Array.newBuilder[Long]
      while (r.hasMore) out += r.varint()
      out.result()
    }
    def packedZigzags(): Array[Long] = {
      val r = sub()
      val out = Array.newBuilder[Long]
      while (r.hasMore) out += r.zigzag()
      out.result()
    }
  }

  // ---- blob framing ----------------------------------------------------------

  /** One length-prefixed blob in the file: [4-byte BE header length][header]
    * [data]. Framing is sequential but cheap (header bytes only, data skipped
    * by seek) — the driver scans it, the BLOCKS decode in parallel
    * (≙ the reference's block-parallel decode, osm/pbf.go:123-160). */
  case class BlobRange(dataOffset: Long, dataSize: Int, blobType: String)

  def blobRanges(path: String): Seq[BlobRange] = {
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      val out = Seq.newBuilder[BlobRange]
      var pos = 0L
      val len = raf.length()
      while (pos + 4 <= len) {
        raf.seek(pos)
        val headerLen = raf.readInt()
        val header = new Array[Byte](headerLen)
        raf.readFully(header)
        val hr = new Reader(header, 0, headerLen)
        var blobType = ""
        var dataSize = 0
        while (hr.hasMore) {
          val key = hr.varint()
          (key >>> 3).toInt match {
            case 1 => val (off, l) = hr.bytes(); blobType = new String(header, off, l, "UTF-8")
            case 3 => dataSize = hr.varint().toInt
            case _ => hr.skip((key & 7).toInt)
          }
        }
        out += BlobRange(pos + 4 + headerLen, dataSize, blobType)
        pos += 4 + headerLen + dataSize
      }
      out.result()
    } finally raf.close()
  }

  /** Decode one blob's primitives given its raw [data] bytes. */
  def decodeBlob(data: Array[Byte]): Osm = {
    val br = new Reader(data, 0, data.length)
    var raw: Array[Byte] = null
    var rawSize = 0
    var zlib: (Int, Int) = null
    while (br.hasMore) {
      val key = br.varint()
      (key >>> 3).toInt match {
        case 1 => val (off, len) = br.bytes(); raw = java.util.Arrays.copyOfRange(data, off, off + len)
        case 2 => rawSize = br.varint().toInt
        case 3 => zlib = br.bytes()
        case _ => br.skip((key & 7).toInt)
      }
    }
    val payload: Array[Byte] =
      if (raw != null) raw
      else {
        val inf = new Inflater()
        inf.setInput(data, zlib._1, zlib._2)
        val out = new Array[Byte](rawSize)
        var n = 0
        while (n < rawSize && !inf.finished()) n += inf.inflate(out, n, rawSize - n)
        inf.end()
        out
      }
    val nodes = Vector.newBuilder[Node]
    val ways = Vector.newBuilder[Way]
    val rels = Vector.newBuilder[Relation]
    parsePrimitiveBlock(payload, nodes, ways, rels)
    Osm(nodes.result(), ways.result(), rels.result())
  }

  /** Flat row for the Spark-side reader: kind 0=node, 1=way, 2=relation. */
  case class MemberRow(ref: Long, mtype: Int, role: String)
  case class RawRow(kind: Int, id: Long, lat: Double, lon: Double,
                    tags: Map[String, String], refs: Array[Long],
                    members: Array[MemberRow])

  /**
   * Distributed decode: the driver scans only the blob framing (header bytes);
   * each task seeks into the file and decodes its own blocks — the ingest
   * plan the reference uses with goroutines (osm/pbf.go:123-160), here as
   * partitions. Returns one DataFrame of RawRow.
   */
  def readSpark(spark: org.apache.spark.sql.SparkSession, path: String)
      : org.apache.spark.sql.Dataset[RawRow] = {
    import spark.implicits._
    val ranges = blobRanges(path).filter(_.blobType == "OSMData")
    val slices = math.max(1, math.min(ranges.size, spark.sparkContext.defaultParallelism))
    spark.sparkContext.parallelize(ranges, slices).mapPartitions { it =>
      val rows = Vector.newBuilder[RawRow]
      val raf = new java.io.RandomAccessFile(path, "r")
      try {
        it.foreach { r =>
          val data = new Array[Byte](r.dataSize)
          raf.seek(r.dataOffset)
          raf.readFully(data)
          val osm = decodeBlob(data)
          osm.nodes.foreach(n => rows += RawRow(0, n.id, n.lat, n.lon, n.tags, Array.empty, Array.empty))
          osm.ways.foreach(w => rows += RawRow(1, w.id, 0.0, 0.0, w.tags, w.refs, Array.empty))
          osm.relations.foreach(rel => rows += RawRow(2, rel.id, 0.0, 0.0, rel.tags, Array.empty,
            rel.members.map(m => MemberRow(m.ref, m.mtype, m.role))))
        }
      } finally raf.close()
      rows.result().iterator
    }.toDS()
  }

  def read(path: String): Osm = {
    val data = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path))
    var pos = 0
    val nodes = Vector.newBuilder[Node]
    val ways = Vector.newBuilder[Way]
    val rels = Vector.newBuilder[Relation]
    while (pos + 4 <= data.length) {
      val headerLen = ((data(pos) & 0xff) << 24) | ((data(pos + 1) & 0xff) << 16) |
        ((data(pos + 2) & 0xff) << 8) | (data(pos + 3) & 0xff)
      pos += 4
      val hr = new Reader(data, pos, pos + headerLen)
      var blobType = ""
      var dataSize = 0
      while (hr.hasMore) {
        val key = hr.varint()
        (key >>> 3).toInt match {
          case 1 => val (off, len) = hr.bytes(); blobType = new String(data, off, len, "UTF-8")
          case 3 => dataSize = hr.varint().toInt
          case _ => hr.skip((key & 7).toInt)
        }
      }
      pos += headerLen
      val br = new Reader(data, pos, pos + dataSize)
      pos += dataSize
      var raw: Array[Byte] = null
      var rawSize = 0
      var zlib: (Int, Int) = null
      while (br.hasMore) {
        val key = br.varint()
        (key >>> 3).toInt match {
          case 1 => val (off, len) = br.bytes(); raw = java.util.Arrays.copyOfRange(data, off, off + len)
          case 2 => rawSize = br.varint().toInt
          case 3 => zlib = br.bytes()
          case _ => br.skip((key & 7).toInt)
        }
      }
      val payload: Array[Byte] =
        if (raw != null) raw
        else {
          val inf = new Inflater()
          inf.setInput(data, zlib._1, zlib._2)
          val out = new Array[Byte](rawSize)
          var n = 0
          while (n < rawSize && !inf.finished()) n += inf.inflate(out, n, rawSize - n)
          inf.end()
          out
        }
      if (blobType == "OSMData") parsePrimitiveBlock(payload, nodes, ways, rels)
    }
    Osm(nodes.result(), ways.result(), rels.result())
  }

  // ---- primitive block -------------------------------------------------------

  private def parsePrimitiveBlock(block: Array[Byte],
                                  nodes: scala.collection.mutable.Builder[Node, Vector[Node]],
                                  ways: scala.collection.mutable.Builder[Way, Vector[Way]],
                                  rels: scala.collection.mutable.Builder[Relation, Vector[Relation]]): Unit = {
    val r = new Reader(block, 0, block.length)
    var strings: Array[String] = Array.empty
    val groups = Vector.newBuilder[(Int, Int)]
    var granularity = 100L
    var latOffset = 0L
    var lonOffset = 0L
    while (r.hasMore) {
      val key = r.varint()
      (key >>> 3).toInt match {
        case 1 => // string table
          val st = r.sub()
          val ss = Array.newBuilder[String]
          while (st.hasMore) {
            val k2 = st.varint()
            if ((k2 >>> 3).toInt == 1) {
              val (off, len) = st.bytes(); ss += new String(block, off, len, "UTF-8")
            } else st.skip((k2 & 7).toInt)
          }
          strings = ss.result()
        case 2 => val (off, len) = r.bytes(); groups += ((off, len))
        case 17 => granularity = r.varint()
        case 19 => latOffset = r.varint()
        case 20 => lonOffset = r.varint()
        case _ => r.skip((key & 7).toInt)
      }
    }
    def coordLat(raw: Long): Double = 1e-9 * (latOffset + granularity * raw)
    def coordLon(raw: Long): Double = 1e-9 * (lonOffset + granularity * raw)

    groups.result().foreach { case (off, len) =>
      val g = new Reader(block, off, off + len)
      while (g.hasMore) {
        val key = g.varint()
        (key >>> 3).toInt match {
          case 1 => // plain Node
            val n = g.sub()
            var id = 0L; var lat = 0L; var lon = 0L
            var keys: Array[Long] = Array.empty; var vals: Array[Long] = Array.empty
            while (n.hasMore) {
              val k2 = n.varint()
              (k2 >>> 3).toInt match {
                case 1 => id = n.zigzag()
                case 2 => keys = n.packedVarints()
                case 3 => vals = n.packedVarints()
                case 8 => lat = n.zigzag()
                case 9 => lon = n.zigzag()
                case _ => n.skip((k2 & 7).toInt)
              }
            }
            nodes += Node(id, coordLat(lat), coordLon(lon),
              keys.zip(vals).map { case (k, v) => strings(k.toInt) -> strings(v.toInt) }.toMap)
          case 2 => // DenseNodes
            val d = g.sub()
            var ids: Array[Long] = Array.empty
            var lats: Array[Long] = Array.empty
            var lons: Array[Long] = Array.empty
            var kvs: Array[Long] = Array.empty
            while (d.hasMore) {
              val k2 = d.varint()
              (k2 >>> 3).toInt match {
                case 1 => ids = d.packedZigzags()
                case 8 => lats = d.packedZigzags()
                case 9 => lons = d.packedZigzags()
                case 10 => kvs = d.packedVarints()
                case _ => d.skip((k2 & 7).toInt)
              }
            }
            var id = 0L; var la = 0L; var lo = 0L
            var ki = 0
            var i = 0
            while (i < ids.length) {
              id += ids(i); la += lats(i); lo += lons(i)
              var tags = Map.empty[String, String]
              while (ki < kvs.length && kvs(ki) != 0) {
                tags += strings(kvs(ki).toInt) -> strings(kvs(ki + 1).toInt)
                ki += 2
              }
              ki += 1 // the 0 delimiter
              nodes += Node(id, coordLat(la), coordLon(lo), tags)
              i += 1
            }
          case 3 => // Way
            val w = g.sub()
            var id = 0L
            var keys: Array[Long] = Array.empty; var vals: Array[Long] = Array.empty
            var refs: Array[Long] = Array.empty
            while (w.hasMore) {
              val k2 = w.varint()
              (k2 >>> 3).toInt match {
                case 1 => id = w.varint()
                case 2 => keys = w.packedVarints()
                case 3 => vals = w.packedVarints()
                case 8 =>
                  val deltas = w.packedZigzags()
                  var acc = 0L
                  refs = deltas.map { d2 => acc += d2; acc }
                case _ => w.skip((k2 & 7).toInt)
              }
            }
            ways += Way(id, refs,
              keys.zip(vals).map { case (k, v) => strings(k.toInt) -> strings(v.toInt) }.toMap)
          case 4 => // Relation
            val rel = g.sub()
            var id = 0L
            var keys: Array[Long] = Array.empty; var vals: Array[Long] = Array.empty
            var roles: Array[Long] = Array.empty
            var memids: Array[Long] = Array.empty
            var types: Array[Long] = Array.empty
            while (rel.hasMore) {
              val k2 = rel.varint()
              (k2 >>> 3).toInt match {
                case 1 => id = rel.varint()
                case 2 => keys = rel.packedVarints()
                case 3 => vals = rel.packedVarints()
                case 8 => roles = rel.packedVarints()
                case 9 =>
                  val deltas = rel.packedZigzags()
                  var acc = 0L
                  memids = deltas.map { d2 => acc += d2; acc }
                case 10 => types = rel.packedVarints()
                case _ => rel.skip((k2 & 7).toInt)
              }
            }
            val members = memids.indices.map { i =>
              Member(memids(i), types(i).toInt, strings(roles(i).toInt))
            }.toArray
            rels += Relation(id, members,
              keys.zip(vals).map { case (k, v) => strings(k.toInt) -> strings(v.toInt) }.toMap)
          case other => g.skip((key & 7).toInt)
        }
      }
    }
  }
}
