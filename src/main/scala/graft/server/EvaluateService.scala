package graft.server

import org.apache.spark.sql.DataFrame
import graft.render.Renderers.{DefaultWorldId, WorldId, WorldRegistry}
import graft.shell.Shell

/**
 * The remote-evaluation boundary — entry point A of the reference
 * (grpc/service.go:26-90, python/diagonal_b6/expression.py:7-60): a client
 * submits a shell expression plus a world id; the server evaluates it against
 * that world and returns the result. The reference speaks protobuf over
 * gRPC; this engine speaks JSON over the JDK HTTP server (no third-party
 * dependency is available here, and the observable contract — expression in,
 * world-scoped evaluation, typed result out, version gate — is what matters).
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

  private def evaluateWith(reg: WorldRegistry, world: Option[String],
                           version: String, runIn: DataFrame => Any,
                           maxRows: Int): EvaluateResult = {
    if (version.takeWhile(_ != '.') != ApiVersion)
      throw Shell.ShellException(
        s"client version $version is not compatible with b6 version $ApiVersion")
    val id = world.flatMap(Shell.parseFeatureIdToken)
      .map { case (t, ns, v) => WorldId(t, ns, v) }.getOrElse(DefaultWorldId)
    val w = reg.findOrCreate(id)
    runIn(w.features) match {
      case change: graft.operators.Changes.ChangeSet =>
        // a Change result applies TRANSACTIONALLY to the requested world and
        // the changed ids come back (grpc/service.go:60-67)
        reg.applyChange(id, change)
        val ids = (change.adds.map(a => s""""/${a.ftype}/${a.ns}/${a.value}"""") ++
          change.tagEdits.map(e => s""""/${e.ftype}/${e.ns}/${e.value}""""))
        EvaluateResult("change-applied", ids.mkString("[", ",", "]"))
      case Shell.WorldChange(t, ns, v, change) =>
        // add-world-with-change: the change lands under ITS OWN world id
        // (change.go:213-218), which comes back to the client
        reg.applyChange(WorldId(t, ns, v), change)
        EvaluateResult("world-created", s""""/$t/$ns/$v"""")
      case ds: org.apache.spark.sql.Dataset[_] =>
        val rows = ds.toDF().limit(maxRows).toJSON.collect()
        EvaluateResult("collection", rows.mkString("[", ",", "]"))
      case l: Long => EvaluateResult("long", l.toString)
      case d: Double => EvaluateResult("double", d.toString)
      case s: String => EvaluateResult("string", "\"" + escape(s) + "\"")
      case Shell.TagE(k, v) =>
        EvaluateResult("tag", s"""{"key":"${escape(k)}","value":"${escape(v)}"}""")
      case q: graft.query.Query =>
        EvaluateResult("query", "\"" + escape(Shell.unparseQuery(q)) + "\"")
      case other => EvaluateResult("value", "\"" + escape(other.toString) + "\"")
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
