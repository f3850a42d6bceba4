package graft.graphql

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.concurrent.Executors

import com.sun.net.httpserver.{HttpExchange, HttpServer}

import GVal._

/** HTTP transport for [[GraphQLService]] — the counterpart of the
  * reference's deployed ASGI GraphQL app (reference middleware.py:41-65,
  * service.py:19-35). Zero dependencies: the JDK's built-in
  * `com.sun.net.httpserver` (a production-supported `jdk.httpserver`
  * module API) carries the endpoint; request/response JSON uses the
  * in-repo [[Json]] codec.
  *
  * Surface (GraphQL-over-HTTP):
  *   - `POST /graphql` with `{"query", "variables"?, "operationName"?}`
  *     → `{"data": ..., "extensions": {"timing_ms": ...}}`, or
  *     `{"errors":[{"message": ...}]}` (HTTP 200 — request-level errors
  *     such as unreadable JSON or a missing query return 400, matching
  *     the graphql-over-http spec's distinction).
  *   - `GET /graphql?query=...&variables=...` — same execution for
  *     URL-encoded reads.
  *   - `GET /graphql` without a query → a browser IDE page (reference
  *     parity: strawberry.asgi serves GraphiQL on bare GET,
  *     middleware.py:41-65). Self-contained HTML — zero egress: a query
  *     editor with the live SDL inlined, posting to this endpoint.
  *   - `GET /graphql?sdl` → the schema SDL as plain text (machine-readable
  *     variant of the same reflection).
  *
  * Scale: the handler pool bounds concurrent queries (`threads`); each
  * request builds one lazy Catalyst plan and only leaf scalars
  * materialize, so concurrent requests contend on Spark's scheduler, not
  * on this layer. Driver-side state is the memoized root cache inside
  * [[GraphQLService]] (thread-safe TrieMap).
  */
final class GraphQLHttpServer(service: GraphQLService,
                              port: Int = 0, threads: Int = 8,
                              maxBodyBytes: Int = 10 << 20,
                              chunkBytes: Int = 1 << 20) {
  private val server = HttpServer.create(new InetSocketAddress(port), 0)
  private val pool = Executors.newFixedThreadPool(threads)
  server.setExecutor(pool)
  server.createContext("/graphql", (ex: HttpExchange) => handle(ex))

  /** The bound port (useful with `port = 0` — ephemeral). */
  def boundPort: Int = server.getAddress.getPort

  def start(): GraphQLHttpServer = { server.start(); this }

  def stop(): Unit = { server.stop(0); pool.shutdown() }

  private def handle(ex: HttpExchange): Unit = {
    try {
      ex.getRequestMethod match {
        case "POST" =>
          // bounded read: an untrusted client must not be able to buffer an
          // arbitrary body on the driver (Json.parse caps DEPTH; this caps
          // SIZE). readNBytes(max+1) reads at most that much — the +1
          // detects oversize without draining the rest.
          val bytes = ex.getRequestBody.readNBytes(maxBodyBytes + 1)
          if (bytes.length > maxBodyBytes)
            respond(ex, 413, "application/json",
              errors(s"request body exceeds $maxBodyBytes bytes"))
          else runQuery(ex, new String(bytes, UTF_8))
        case "GET" =>
          val params = queryParams(Option(ex.getRequestURI.getRawQuery))
          params.get("query") match {
            case Some(q) =>
              val vars = params.get("variables").map(v => s""","variables":$v""").getOrElse("")
              val op = params.get("operationName")
                .map(n => s""","operationName":${Json.quote(n)}""").getOrElse("")
              runQuery(ex, s"""{"query":${Json.quote(q)}$vars$op}""")
            case None if params.contains("sdl") =>
              respond(ex, 200, "text/plain; charset=utf-8", service.sdl)
            case None =>
              respond(ex, 200, "text/html; charset=utf-8", idePage)
          }
        case other =>
          respond(ex, 405, "application/json",
            errors(s"method $other not allowed; use POST"))
      }
    } catch {
      // last-resort guard: a handler that throws would otherwise close the
      // socket with no response at all
      case e: Exception =>
        try respond(ex, 500, "application/json", errors(msg(e))) catch { case _: Exception => () }
    } finally ex.close()
  }

  private def runQuery(ex: HttpExchange, body: String): Unit = {
    val parsed =
      try Right(Json.parse(body))
      catch { case e: IllegalArgumentException => Left(msg(e)) }
    parsed match {
      case Left(err) =>
        respond(ex, 400, "application/json", errors(s"malformed request body: $err"))
      case Right(GObj(fields)) =>
        val get = fields.toMap
        get.get("query") match {
          case Some(GStr(q)) =>
            val vars = get.get("variables") match {
              case Some(GObj(vs)) => vs.toMap
              case Some(GNull) | None => Map.empty[String, GVal]
              case Some(other) =>
                respond(ex, 400, "application/json",
                  errors(s"variables must be an object, got $other"))
                return
            }
            val opName = get.get("operationName").collect { case GStr(n) => n }
            // execution-level failures are part of the 200 response
            // envelope, per the GraphQL-over-HTTP spec. All Spark work runs
            // inside executeStream (so errors land here, before headers);
            // only the leaf stringification is deferred into the fragment
            // pump — respondStream streams it with O(chunk) memory.
            try respondStream(ex, 200, "application/json",
              service.executeStream(q, vars, opName).fragments)
            catch { case e: Exception => respond(ex, 200, "application/json", errors(msg(e))) }
          case _ =>
            respond(ex, 400, "application/json", errors("request needs a string 'query'"))
        }
      case Right(_) =>
        respond(ex, 400, "application/json", errors("request body must be a JSON object"))
    }
  }

  /** Browser IDE served on bare GET (reference middleware.py:41-65 serves
    * GraphiQL from strawberry.asgi's default). Self-contained — no CDN
    * scripts (the deployment may have zero egress): a two-pane editor that
    * POSTs to this endpoint and shows the schema SDL inline. */
  private lazy val idePage: String = {
    val sdlJs = Json.quote(service.sdl)
    s"""<!doctype html>
<html><head><meta charset="utf-8"><title>graft GraphQL</title>
<style>
body{margin:0;font:14px/1.4 system-ui,sans-serif;display:flex;flex-direction:column;height:100vh}
header{padding:8px 12px;background:#1b2b34;color:#fff;display:flex;gap:12px;align-items:center}
header h1{font-size:15px;margin:0;font-weight:600}
header button{padding:4px 14px;border:0;border-radius:4px;background:#4fb3bf;color:#042;cursor:pointer;font-weight:600}
main{flex:1;display:flex;min-height:0}
main>section{flex:1;display:flex;flex-direction:column;min-width:0;border-right:1px solid #ddd}
main textarea,main pre{flex:1;margin:0;padding:10px;border:0;font:12px/1.5 ui-monospace,monospace;overflow:auto;white-space:pre}
main textarea{resize:none;outline:0}
label{padding:4px 10px;background:#eee;font-size:11px;text-transform:uppercase;letter-spacing:.06em}
#vars{flex:0 0 5em;border-top:1px solid #ddd}
</style></head><body>
<header><h1>graft GraphQL</h1><button id="run">Run &#9654;</button>
<span style="font-size:12px;opacity:.7">POSTs to this endpoint; schema pane shows the live SDL</span></header>
<main>
<section><label>query</label><textarea id="q">{ }</textarea>
<label>variables (JSON)</label><textarea id="vars">{}</textarea></section>
<section><label>result</label><pre id="out"></pre></section>
<section style="border-right:0"><label>schema (SDL)</label><pre id="sdl"></pre></section>
</main>
<script>
document.getElementById('sdl').textContent = $sdlJs;
async function run(){
  let vars = {};
  try { vars = JSON.parse(document.getElementById('vars').value || '{}'); }
  catch(e){ document.getElementById('out').textContent = 'variables: ' + e; return; }
  const r = await fetch(location.pathname, {method:'POST',
    headers:{'content-type':'application/json'},
    body: JSON.stringify({query: document.getElementById('q').value, variables: vars})});
  const t = await r.text();
  try { document.getElementById('out').textContent = JSON.stringify(JSON.parse(t), null, 2); }
  catch(e){ document.getElementById('out').textContent = t; }
}
document.getElementById('run').onclick = run;
document.getElementById('q').addEventListener('keydown', e => {
  if ((e.ctrlKey || e.metaKey) && e.key === 'Enter') run();
});
</script></body></html>"""
  }

  private def msg(e: Exception): String =
    Option(e.getMessage).getOrElse(e.getClass.getSimpleName)

  private def errors(message: String): String =
    Json.obj(Seq("errors" ->
      s"[${Json.obj(Seq("message" -> Json.quote(message)))}]"))

  private def queryParams(raw: Option[String]): Map[String, String] =
    raw.toSeq.flatMap(_.split('&')).flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) => Some(URLDecoder.decode(k, UTF_8) -> URLDecoder.decode(v, UTF_8))
        case Array(k) if k.nonEmpty => Some(URLDecoder.decode(k, UTF_8) -> "")
        case _ => None
      }
    }.toMap

  /** Responses past `chunkBytes` stream with chunked transfer-encoding
    * instead of one Content-Length'd buffer: the JDK server then flushes
    * 64 KiB frames as they are written rather than double-buffering the
    * whole body, so a large (cap-admitted) leaf array reaches the client
    * incrementally and the socket path stays O(chunk). */
  private val ChunkSize = 64 << 10

  private def respond(ex: HttpExchange, status: Int, contentType: String,
                      body: String): Unit =
    respondStream(ex, status, contentType, Iterator.single(body))

  /** Incremental response pump: pulls JSON fragments and writes them out
    * as they arrive. Small responses (≤ chunkBytes total) buffer and go
    * Content-Length'd exactly as before; the moment the buffered size
    * crosses `chunkBytes` the response switches to chunked
    * transfer-encoding and every subsequent ~64 KiB of fragments is
    * flushed as its own frame — so the FIRST bytes reach the client while
    * later rows are still being stringified, and serializer-side memory is
    * O(chunk) end-to-end (the executor defers leaf stringification;
    * nothing ever holds the full body). Byte stream is identical to the
    * old materialize-then-chunk path: same fragments, same order. */
  private def respondStream(ex: HttpExchange, status: Int,
                            contentType: String,
                            frags: Iterator[String]): Unit = {
    ex.getResponseHeaders.set("Content-Type", contentType)
    val buf = new java.io.ByteArrayOutputStream(math.min(chunkBytes, 1 << 20))
    var os: java.io.OutputStream = null // non-null once streaming started
    try {
      while (frags.hasNext) {
        buf.write(frags.next().getBytes(UTF_8))
        if (os == null && buf.size > chunkBytes) {
          // length 0 → chunked transfer-encoding (HttpServer contract)
          ex.sendResponseHeaders(status, 0L)
          os = ex.getResponseBody
        }
        if (os != null && buf.size >= ChunkSize) {
          buf.writeTo(os)
          os.flush()
          buf.reset()
        }
      }
      if (os == null) {
        val bytes = buf.toByteArray
        ex.sendResponseHeaders(status, if (bytes.isEmpty) -1L else bytes.length.toLong)
        os = ex.getResponseBody
        os.write(bytes)
      } else if (buf.size > 0) {
        buf.writeTo(os)
        os.flush()
      }
    } finally if (os != null) os.close()
  }
}
