package graft.server

import org.apache.spark.sql.DataFrame
import graft.render.Renderers.{DefaultWorldId, WorldId, WorldRegistry}
import graft.shell.Shell

/**
 * The remote-evaluation boundary — entry point A of the reference
 * (grpc/service.go:26-90, python/diagonal_b6/expression.py:7-60): a client
 * submits a shell expression plus a world id; the server evaluates it against
 * that world and returns the result. Three front doors share one evaluation
 * path: JSON/HTTP (below), raw NodeProto frames (/evaluate-proto), and the
 * reference's own B6 service RPCs (api.proto:265-269 Evaluate / DeleteWorld /
 * ListWorlds) spoken over gRPC-Web unary framing — the published grpc-web
 * protocol, which carries gRPC's protobuf messages and status trailers over
 * plain HTTP/1.1, so no HTTP/2 stack is needed on either side.
 *
 * POST /evaluate  {"expression": "...", "world": "/collection/ns/id",
 *                  "version": "1"}
 * -> {"type": "collection"|"long"|"double"|"string"|"query"|"tag",
 *     "result": ... }   (collections return up to `maxRows` rows as JSON
 *     arrays of the projected columns)
 */
object EvaluateService {

  /** Major API version — requests must match (grpc/service.go:37-41). */
  val ApiVersion = "1"

  case class EvaluateResult(kind: String, json: String)

  def evaluate(reg: WorldRegistry, expression: String,
               world: Option[String], version: String,
               maxRows: Int = 1000): EvaluateResult =
    evaluateWith(reg, world, version,
      w => Shell.run(w, expression), maxRows)

  /** The protobuf frame path: a NodeProto expression tree
    * (graft.proto.ExprProto — the reference gRPC payload,
    * grpc/service.go:26-90) instead of shell text. */
  def evaluateProto(reg: WorldRegistry, nodeProto: Array[Byte],
                    world: Option[String], version: String,
                    maxRows: Int = 1000): EvaluateResult =
    evaluateWith(reg, world, version,
      w => Shell.runParsed(Shell.Env(w, None), graft.proto.ExprProto.decode(nodeProto)),
      maxRows)

  /** What an evaluation produced, before response encoding — shared by the
    * JSON and the gRPC-Web/proto front doors so change application happens
    * exactly once in exactly one place. */
  private sealed trait Outcome
  private case class ChangeApplied(ids: Seq[(String, String, Long)]) extends Outcome
  private case class WorldCreated(t: String, ns: String, v: Long) extends Outcome
  private case class Value(v: Any) extends Outcome

  private def worldId(world: Option[String]): WorldId =
    world.flatMap(Shell.parseFeatureIdToken)
      .map { case (t, ns, v) => WorldId(t, ns, v) }.getOrElse(DefaultWorldId)

  private def evaluateOutcome(reg: WorldRegistry, id: WorldId,
                              version: String, runIn: DataFrame => Any): Outcome = {
    if (version.takeWhile(_ != '.') != ApiVersion)
      throw Shell.ShellException(
        s"client version $version is not compatible with b6 version $ApiVersion")
    val w = reg.findOrCreate(id)
    runIn(w.features) match {
      case change: graft.operators.Changes.ChangeSet =>
        // a Change result applies TRANSACTIONALLY to the requested world and
        // the changed ids come back (grpc/service.go:60-67)
        reg.applyChange(id, change)
        ChangeApplied(change.adds.map(a => (a.ftype, a.ns, a.value)) ++
          change.tagEdits.map(e => (e.ftype, e.ns, e.value)))
      case Shell.WorldChange(t, ns, v, change) =>
        // add-world-with-change: the change lands under ITS OWN world id
        // (change.go:213-218), which comes back to the client
        reg.applyChange(WorldId(t, ns, v), change)
        WorldCreated(t, ns, v)
      case other => Value(other)
    }
  }

  private def evaluateWith(reg: WorldRegistry, world: Option[String],
                           version: String, runIn: DataFrame => Any,
                           maxRows: Int): EvaluateResult =
    evaluateOutcome(reg, worldId(world), version, runIn) match {
      case ChangeApplied(ids) =>
        EvaluateResult("change-applied",
          ids.map { case (t, ns, v) => s""""/$t/$ns/$v"""" }.mkString("[", ",", "]"))
      case WorldCreated(t, ns, v) =>
        EvaluateResult("world-created", s""""/$t/$ns/$v"""")
      case Value(v) => v match {
        case ds: org.apache.spark.sql.Dataset[_] =>
          val rows = ds.toDF().limit(maxRows).toJSON.collect()
          EvaluateResult("collection", rows.mkString("[", ",", "]"))
        case l: Long => EvaluateResult("long", l.toString)
        case d: Double => EvaluateResult("double", d.toString)
        case s: String => EvaluateResult("string", "\"" + escape(s) + "\"")
        case Shell.TagE(k, tv) =>
          EvaluateResult("tag", s"""{"key":"${escape(k)}","value":"${escape(tv)}"}""")
        case q: graft.query.Query =>
          EvaluateResult("query", "\"" + escape(Shell.unparseQuery(q)) + "\"")
        case other => EvaluateResult("value", "\"" + escape(other.toString) + "\"")
      }
    }

  /** Encode an [[Outcome]] as the LiteralNodeProto-bearing NodeProto the
    * reference's Evaluate RPC returns (grpc/service.go:42-58: results map to
    * api.NodeProto literals — ints, floats, strings, tags, queries,
    * collections, applied changes). Collections follow b6's key/value shape:
    * a two-column frame maps columns to keys/values; anything wider keys by
    * row index with the row JSON as the value. */
  private def resultNode(outcome: Outcome, maxRows: Int): Array[Byte] = {
    def lit(x: Any): Shell.Expr = x match {
      case l: Long => Shell.IntE(l)
      case i: Int => Shell.IntE(i.toLong)
      case d: Double => Shell.FloatE(d)
      case s: String => Shell.StringE(s)
      case other => Shell.StringE(String.valueOf(other))
    }
    outcome match {
      case ChangeApplied(ids) => graft.proto.ExprProto.appliedChangeNode(ids)
      case WorldCreated(t, ns, v) =>
        graft.proto.ExprProto.encode(Shell.FeatureIdE(t, ns, v))
      case Value(v) => v match {
        case ds: org.apache.spark.sql.Dataset[_] =>
          val df = ds.toDF().limit(maxRows)
          if (df.columns.length == 2) {
            val rows = df.collect()
            graft.proto.ExprProto.collectionNode(
              rows.toSeq.map(r => lit(r.get(0))), rows.toSeq.map(r => lit(r.get(1))))
          } else {
            val rows = df.toJSON.collect()
            graft.proto.ExprProto.collectionNode(
              rows.indices.map(i => Shell.IntE(i.toLong)),
              rows.toSeq.map(Shell.StringE))
          }
        case l: Long => graft.proto.ExprProto.encode(Shell.IntE(l))
        case i: Int => graft.proto.ExprProto.encode(Shell.IntE(i.toLong))
        case d: Double => graft.proto.ExprProto.encode(Shell.FloatE(d))
        case s: String => graft.proto.ExprProto.encode(Shell.StringE(s))
        case b: Boolean => graft.proto.ExprProto.boolNode(b)
        case t: Shell.TagE => graft.proto.ExprProto.encode(t)
        case q: graft.query.Query =>
          // queries outside the proto subset fall back to their shell text
          try graft.proto.ExprProto.encode(Shell.QueryE(q))
          catch { case _: IllegalArgumentException =>
            graft.proto.ExprProto.encode(Shell.StringE(Shell.unparseQuery(q))) }
        case null => graft.proto.ExprProto.nilNode
        case other => graft.proto.ExprProto.encode(Shell.StringE(other.toString))
      }
    }
  }

  private def escape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** Serve POST /evaluate. Returns the bound server (port via getAddress). */
  def serve(reg: WorldRegistry, port: Int = 0): com.sun.net.httpserver.HttpServer = {
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/evaluate", { exchange =>
      try {
        val body = new String(exchange.getRequestBody.readAllBytes(), "UTF-8")
        val expression = jsonField(body, "expression").getOrElse(
          throw Shell.ShellException("missing field: expression"))
        val result = evaluate(reg, expression, jsonField(body, "world"),
          jsonField(body, "version").getOrElse(ApiVersion))
        val resp = s"""{"type":"${result.kind}","result":${result.json}}"""
          .getBytes("UTF-8")
        exchange.getResponseHeaders.add("Content-Type", "application/json")
        exchange.sendResponseHeaders(200, resp.length.toLong)
        exchange.getResponseBody.write(resp)
        exchange.close()
      } catch {
        case e: Exception =>
          val msg = s"""{"error":"${escape(Option(e.getMessage).getOrElse(e.toString))}"}"""
            .getBytes("UTF-8")
          exchange.sendResponseHeaders(400, msg.length.toLong)
          exchange.getResponseBody.write(msg)
          exchange.close()
      }
    })
    // POST /evaluate-proto: raw NodeProto bytes in the body (the gRPC
    // payload, re-framed over HTTP); world + version ride the query string
    server.createContext("/evaluate-proto", { exchange =>
      try {
        val nodeBytes = exchange.getRequestBody.readAllBytes()
        val q = Option(exchange.getRequestURI.getRawQuery).getOrElse("")
        val params = q.split("&").filter(_.contains("=")).map { kv =>
          val Array(k, v) = kv.split("=", 2)
          k -> java.net.URLDecoder.decode(v, "UTF-8")
        }.toMap
        val result = evaluateProto(reg, nodeBytes, params.get("world"),
          params.getOrElse("version", ApiVersion))
        val resp = s"""{"type":"${result.kind}","result":${result.json}}"""
          .getBytes("UTF-8")
        exchange.getResponseHeaders.add("Content-Type", "application/json")
        exchange.sendResponseHeaders(200, resp.length.toLong)
        exchange.getResponseBody.write(resp)
        exchange.close()
      } catch {
        case e: Exception =>
          val msg = s"""{"error":"${escape(Option(e.getMessage).getOrElse(e.toString))}"}"""
            .getBytes("UTF-8")
          exchange.sendResponseHeaders(400, msg.length.toLong)
          exchange.getResponseBody.write(msg)
          exchange.close()
      }
    })
    // The reference's gRPC service surface (api.proto:265-269), spoken over
    // gRPC-Web unary framing — the PUBLISHED grpc-web protocol (1 flag byte,
    // bit 7 = trailer, then 4-byte big-endian length, then the message;
    // responses end with a trailer frame carrying grpc-status) — so a client
    // that frames protobuf the gRPC way talks to the engine without any
    // HTTP/2 stack on either side. The same dispatch table is also served
    // over TRUE gRPC (HTTP/2 h2c) by [[GrpcServer]].
    grpcMethods(reg).foreach { case (path, handle) =>
      grpcWebContext(server, path)(handle)
    }
    // GET /functions: the machine-readable registry manifest — the
    // `b6-api --functions` analogue (reference Makefile:79-80) that the
    // python client generates its stubs from
    server.createContext("/functions", { exchange =>
      val fns = Shell.functionManifest
        .map { case (n, a) => s"""{"name":"${escape(n)}","arity":$a}""" }
        .mkString("[", ",", "]")
      val resp = s"""{"version":"$ApiVersion","functions":$fns}""".getBytes("UTF-8")
      exchange.getResponseHeaders.add("Content-Type", "application/json")
      exchange.sendResponseHeaders(200, resp.length.toLong)
      exchange.getResponseBody.write(resp)
      exchange.close()
    })
    server.start()
    server
  }

  /** The three unary B6 service methods (api.proto:265-269 Evaluate /
    * ListWorlds / DeleteWorld) as a path → (request-message bytes →
    * response-message bytes) table — the ONE dispatch surface behind both
    * wire framings: gRPC-Web over HTTP/1.1 (here) and true gRPC over HTTP/2
    * ([[GrpcServer]]). */
  def grpcMethods(reg: WorldRegistry): Map[String, Array[Byte] => Array[Byte]] = Map(
    "/b6.grpc.B6/Evaluate" -> { msg =>
      val (node, version, root) = graft.proto.ExprProto.decodeEvaluateRequest(msg)
      val id = root.map { case (t, ns, v) => WorldId(t, ns, v) }
        .getOrElse(DefaultWorldId)
      val outcome = evaluateOutcome(reg, id,
        if (version.isEmpty) ApiVersion else version,
        w => Shell.runParsed(Shell.Env(w, None), node))
      graft.proto.ExprProto.encodeEvaluateResponse(resultNode(outcome, 1000))
    },
    "/b6.grpc.B6/ListWorlds" -> { _ =>
      graft.proto.ExprProto.encodeListWorldsResponse(
        reg.listWorlds.map(id => (id.ftype, id.ns, id.value)))
    },
    "/b6.grpc.B6/DeleteWorld" -> { msg =>
      val (t, ns, v) = graft.proto.ExprProto.decodeDeleteWorldRequest(msg)
      reg.deleteWorld(WorldId(t, ns, v))
      Array.emptyByteArray // DeleteWorldResponseProto {}
    })

  // ---- gRPC-Web unary framing ------------------------------------------------

  /** One grpc-web frame: flag byte (0x80 = trailer) + 4-byte BE length + payload. */
  def grpcFrame(flag: Int, payload: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(payload.length + 5)
    out.write(flag)
    val n = payload.length
    out.write((n >>> 24) & 0xff); out.write((n >>> 16) & 0xff)
    out.write((n >>> 8) & 0xff); out.write(n & 0xff)
    out.write(payload, 0, n)
    out.toByteArray
  }

  /** Split a grpc-web body into (flag, payload) frames. */
  def grpcFrames(body: Array[Byte]): Seq[(Int, Array[Byte])] = {
    val out = Seq.newBuilder[(Int, Array[Byte])]
    var pos = 0
    while (pos + 5 <= body.length) {
      val flag = body(pos) & 0xff
      val n = ((body(pos + 1) & 0xff) << 24) | ((body(pos + 2) & 0xff) << 16) |
        ((body(pos + 3) & 0xff) << 8) | (body(pos + 4) & 0xff)
      out += ((flag, java.util.Arrays.copyOfRange(body, pos + 5, pos + 5 + n)))
      pos += 5 + n
    }
    out.result()
  }

  /** Register a unary gRPC-Web method: decode the request data frame, run
    * `handle`, answer message + grpc-status:0 trailer — or a trailers-only
    * grpc-status:2 response on error (HTTP stays 200, the gRPC way). */
  private def grpcWebContext(server: com.sun.net.httpserver.HttpServer,
                             path: String)(handle: Array[Byte] => Array[Byte]): Unit =
    server.createContext(path, { exchange =>
      val body = exchange.getRequestBody.readAllBytes()
      val resp = try {
        val msg = grpcFrames(body).collectFirst { case (f, p) if (f & 0x80) == 0 => p }
          .getOrElse(throw Shell.ShellException("missing grpc-web data frame"))
        grpcFrame(0, handle(msg)) ++
          grpcFrame(0x80, "grpc-status: 0\r\n".getBytes("UTF-8"))
      } catch {
        case e: Exception =>
          val m = Option(e.getMessage).getOrElse(e.toString)
            .replaceAll("[\r\n%]", " ")
          grpcFrame(0x80,
            s"grpc-status: 2\r\ngrpc-message: $m\r\n".getBytes("UTF-8"))
      }
      exchange.getResponseHeaders.add("Content-Type", "application/grpc-web+proto")
      exchange.sendResponseHeaders(200, resp.length.toLong)
      exchange.getResponseBody.write(resp)
      exchange.close()
    })

  /** Minimal JSON string-field extractor (flat request objects only). */
  private[server] def jsonField(json: String, name: String): Option[String] = {
    val m = java.util.regex.Pattern
      .compile("\"" + java.util.regex.Pattern.quote(name) + "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"")
      .matcher(json)
    if (m.find())
      Some(m.group(1).replace("\\\"", "\"").replace("\\\\", "\\").replace("\\n", "\n"))
    else None
  }
}
