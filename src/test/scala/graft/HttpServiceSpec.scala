package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8

import graft.graphql.{GraphQLHttpServer, GraphQLService, Json}
import graft.graphql.GVal._

/** HTTP transport: the reference is a deployed ASGI GraphQL app
  * (middleware.py:41-65); this spec drives the JDK-HttpServer counterpart
  * end-to-end over real sockets — POST + GET execution, variables,
  * request- vs execution-level errors, SDL, concurrency, and the
  * ServiceMain env helpers. */
class HttpServiceSpec extends SparkSpec {

  private lazy val server =
    new GraphQLHttpServer(new GraphQLService(spark, sf), port = 0).start()
  private lazy val base = s"http://localhost:${server.boundPort}/graphql"
  private lazy val client = HttpClient.newHttpClient()

  private def post(body: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(base))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def get(pathAndQuery: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(pathAndQuery)).GET().build(),
      HttpResponse.BodyHandlers.ofString())

  test("POST /graphql executes a query") {
    val r = post("""{"query": "{ nation { count } }"}""")
    assert(r.statusCode() == 200)
    assert(r.headers().firstValue("Content-Type").get.startsWith("application/json"))
    assert(r.body().contains(""""count":25"""))
    assert(r.body().contains(""""timing_ms""""))
  }

  test("oversized POST body is rejected with 413, small server cap honored") {
    val tiny = new GraphQLHttpServer(new GraphQLService(spark, sf),
      port = 0, maxBodyBytes = 256).start()
    try {
      val url = s"http://localhost:${tiny.boundPort}/graphql"
      val big = """{"query": "{ nation { count } }", "pad": """" +
        ("x" * 1024) + "\"}"
      val r = client.send(
        HttpRequest.newBuilder(URI.create(url))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(big, UTF_8)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 413, s"got ${r.statusCode()}: ${r.body()}")
      // an in-bounds request on the same server still works
      val ok = client.send(
        HttpRequest.newBuilder(URI.create(url))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"query": "{ nation { count } }"}""", UTF_8)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(ok.statusCode() == 200 && ok.body().contains(""""count":25"""))
    } finally tiny.stop()
  }

  test("POST with variables") {
    val r = post(
      """{"query": "query($k: Int) { nation { filter(n_regionkey: {eq: $k}) { count } } }",
         "variables": {"k": 0}}""")
    assert(r.statusCode() == 200)
    assert(r.body().contains(""""count":5"""))
  }

  test("GET with url-encoded query executes; bare GET serves the IDE; ?sdl serves SDL") {
    val r = get(base + "?query=%7B%20nation%20%7B%20count%20%7D%20%7D")
    assert(r.statusCode() == 200 && r.body().contains(""""count":25"""))
    // bare GET = browser IDE shell (reference serves GraphiQL here,
    // middleware.py:41-65) — self-contained HTML that POSTs back to the
    // endpoint and inlines the live SDL
    val ide = get(base)
    assert(ide.statusCode() == 200)
    assert(ide.headers().firstValue("Content-Type").orElse("").startsWith("text/html"))
    assert(ide.body().contains("<!doctype html") && ide.body().contains("fetch(location.pathname"))
    assert(ide.body().contains("nation: Nation")) // inlined SDL
    // machine-readable SDL stays reachable under ?sdl
    val sdl = get(base + "?sdl")
    assert(sdl.statusCode() == 200)
    assert(sdl.headers().firstValue("Content-Type").orElse("").startsWith("text/plain"))
    assert(sdl.body().contains("type Query") && sdl.body().contains("nation: Nation"))
  }

  test("request-level errors are 400; execution errors are 200 envelopes") {
    assert(post("""not json""").statusCode() == 400)
    assert(post("""{"variables": {}}""").statusCode() == 400)
    assert(post("""{"query": "{ nation { count } }", "variables": 3}""").statusCode() == 400)
    val exec = post("""{"query": "{ no_such_table { count } }"}""")
    assert(exec.statusCode() == 200)
    assert(exec.body().contains(""""errors"""") &&
      exec.body().contains("unknown table"))
    val r405 = client.send(
      HttpRequest.newBuilder(URI.create(base)).DELETE().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r405.statusCode() == 405)
  }

  test("responses past chunkBytes stream with chunked transfer-encoding; small ones keep Content-Length") {
    // a server with a tiny chunk threshold: any multi-KB leaf array must
    // arrive chunked (no Content-Length), small results stay buffered
    val tiny = new GraphQLHttpServer(new GraphQLService(spark, sf),
      port = 0, chunkBytes = 2048).start()
    try {
      val url = s"http://localhost:${tiny.boundPort}/graphql"
      def postTo(body: String) = client.send(
        HttpRequest.newBuilder(URI.create(url))
          .header("Content-Type", "application/json")
          .POST(HttpRequest.BodyPublishers.ofString(body, UTF_8)).build(),
        HttpResponse.BodyHandlers.ofString())
      val big = postTo("""{"query": "{ documents { columns { text { values } } } }"}""")
      assert(big.statusCode() == 200)
      assert(big.body().length > 2048, s"response too small: ${big.body().length}")
      assert(big.headers().firstValue("Transfer-encoding").orElse("").contains("chunked"),
        s"expected chunked transfer, headers: ${big.headers().map()}")
      assert(big.headers().firstValue("Content-length").isEmpty)
      assert(big.body().endsWith("}}"), "chunked body must arrive complete")
      val small = postTo("""{"query": "{ nation { count } }"}""")
      assert(small.headers().firstValue("Content-length").isPresent,
        "small responses keep the buffered Content-Length path")
    } finally tiny.stop()
  }

  test("streamed response bytes are identical to the embedded render (cap-admitted large leaf)") {
    // same query through the incremental socket pump and through the
    // embedded execute().render path — bytes must match exactly, modulo
    // the per-run timing extension. Cap set high enough to ADMIT the
    // leaf: this is the streamed-after-admission path the serve cap's
    // OOM promise depends on.
    spark.conf.set("spark.graft.serve.maxValues", "100000")
    try {
      val tiny = new GraphQLHttpServer(new GraphQLService(spark, sf),
        port = 0, chunkBytes = 2048).start()
      try {
        val q = "{ documents { columns { text { values } doc_id { values } } } }"
        val viaHttp = client.send(
          HttpRequest.newBuilder(URI.create(s"http://localhost:${tiny.boundPort}/graphql"))
            .header("Content-Type", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString(
              s"""{"query": ${Json.quote(q)}}""", UTF_8)).build(),
          HttpResponse.BodyHandlers.ofString())
        assert(viaHttp.statusCode() == 200)
        assert(viaHttp.headers().firstValue("Transfer-encoding").orElse("")
          .contains("chunked"), "large leaf must stream chunked")
        val direct = new graphql.GraphQLService(spark, sf).execute(q)
        def scrub(s: String) = s.replaceAll("\"timing_ms\":\\{[^}]*\\}", "")
        assert(scrub(viaHttp.body()) == scrub(direct),
          s"streamed bytes diverge from the rendered body " +
            s"(${viaHttp.body().length} vs ${direct.length} chars)")
      } finally tiny.stop()
    } finally spark.conf.unset("spark.graft.serve.maxValues")
  }

  test("ServiceMain defaults the serve cap ON (1M); explicit configuration wins") {
    spark.conf.unset("spark.graft.serve.maxValues")
    try {
      ServiceMain.applyServeCapDefault(spark)
      assert(spark.conf.get("spark.graft.serve.maxValues") == "1000000",
        "deployment entry must default the cap on")
      // a deployed service under the default cap still serves normal leaves
      val capped = new GraphQLHttpServer(
        new GraphQLService(spark, sf), port = 0).start()
      try {
        val r = client.send(
          HttpRequest.newBuilder(URI.create(s"http://localhost:${capped.boundPort}/graphql"))
            .header("Content-Type", "application/json")
            .POST(HttpRequest.BodyPublishers.ofString(
              """{"query": "{ nation { columns { n_name { values } } } }"}""",
              UTF_8)).build(),
          HttpResponse.BodyHandlers.ofString())
        assert(r.statusCode() == 200 && !r.body().contains("\"errors\""), r.body().take(300))
      } finally capped.stop()
      // explicit setting (operator override) survives the default pass
      spark.conf.set("spark.graft.serve.maxValues", "42")
      ServiceMain.applyServeCapDefault(spark)
      assert(spark.conf.get("spark.graft.serve.maxValues") == "42")
    } finally spark.conf.unset("spark.graft.serve.maxValues")
  }

  test("leaf stringification is lazy: one element per fragment pull, nothing up front") {
    var touched = 0
    val vals: Seq[Any] = (1 to 1000).map(i => new AnyRef {
      override def toString: String = { touched += 1; s"v$i" }
    })
    val it = graphql.JsonStream.lazyArr(vals).fragments
    assert(touched == 0, "no element may stringify before the first pull")
    assert(it.next() == "[")
    it.next()
    assert(touched == 1,
      s"first fragment pulled, $touched elements stringified — the last " +
        "row must NOT be serialized before the first chunk can ship")
    val rest = it.mkString
    assert(touched == 1000 && rest.endsWith("]"))
    assert(graphql.JsonStream.lazyArr(Seq(1, 2, 3)).render == "[1,2,3]")
    assert(graphql.JsonStream.lazyArr(Nil).render == "[]")
  }

  test("serve cap over HTTP: an over-cap values leaf is a 200 error envelope, not a buffered dump") {
    spark.conf.set("spark.graft.serve.maxValues", "10")
    try {
      val r = post("""{"query": "{ lineitem { columns { l_orderkey { values } } } }"}""")
      assert(r.statusCode() == 200, "execution errors stay 200 envelopes")
      assert(r.body().contains(""""errors"""") && r.body().contains("slice"),
        s"expected the cap error envelope, got: ${r.body().take(200)}")
      // a sliced request under the cap serves data as usual
      val ok = post("""{"query": "{ lineitem { slice(offset: 0, limit: 3) { columns { l_orderkey { values } } } } }"}""")
      assert(ok.statusCode() == 200 && ok.body().contains(""""values":["""
        ) && !ok.body().contains(""""errors""""))
    } finally spark.conf.unset("spark.graft.serve.maxValues")
  }

  test("concurrent requests serve correct independent results") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val keys = 0 until 4
    val results = Await.result(Future.sequence(keys.map(k => Future {
      post(s"""{"query": "{ region { filter(r_regionkey: {eq: $k}) {
                 columns { r_regionkey { values } } } } }"}""".replace("\n", " "))
    })), 60.seconds)
    keys.zip(results).foreach { case (k, r) =>
      assert(r.statusCode() == 200 && r.body().contains(s""""values":[$k]"""), s"key $k")
    }
  }

  test("nearest serves ANN over HTTP: brute and prebuilt-IVF agree") {
    def hits(method: String): String = {
      val q = s"""{ t: embeddings {
        n: nearest(on: \\"embedding\\", id: \\"vec_id\\", ids: [0, 1],
                   k: 3, method: \\"$method\\") {
          o: order(by: [\\"query_id\\", \\"rank\\"]) {
            c: columns { query_id { values } neighbor_id { values }
                         rank { values } } } } } }"""
      val r = post(s"""{"query": "${q.replace("\n", " ")}"}""")
      assert(r.statusCode() == 200, r.body())
      assert(!r.body().contains("\"errors\""), r.body())
      // strip timings so the two methods' envelopes compare structurally
      r.body().replaceAll(""""timing_ms":\{[^}]*\}""", "")
    }
    val brute = hits("BRUTE")
    assert(brute.contains("\"neighbor_id\""))
    // the prebuilt-index path must serve the same ranking as the exact
    // scorer on this small fixture when every list is probed
    val q2 = """{ t: embeddings {
      n: nearest(on: \"embedding\", id: \"vec_id\", ids: [0, 1],
                 k: 3, method: \"IVF\", nlist: 4, nprobe: 4) {
        o: order(by: [\"query_id\", \"rank\"]) {
          c: columns { query_id { values } neighbor_id { values }
                       rank { values } } } } } }"""
    val r2 = post(s"""{"query": "${q2.replace("\n", " ")}"}""")
    assert(r2.statusCode() == 200, r2.body())
    val ivf = r2.body().replaceAll(""""timing_ms":\{[^}]*\}""", "")
    assert(ivf == brute, s"IVF with full probing must match BRUTE:\n$ivf\nvs\n$brute")
    // build-once/probe-many through the service: a repeat request hits the
    // cached prebuilt index — no second build job
    val b0 = graft.operators.Similarity.ivfBuildCount.get()
    val r3 = post(s"""{"query": "${q2.replace("\n", " ")}"}""")
    assert(r3.statusCode() == 200, r3.body())
    assert(graft.operators.Similarity.ivfBuildCount.get() == b0,
      "a repeat nearest(method: IVF) request must reuse the prebuilt index")
  }

  test("nearest by external vector: a corpus row's own embedding finds it at rank 1") {
    // fetch row 7's embedding through the service, then query by VALUE —
    // external vectors serve under a NULL query_id (no sentinel value a
    // corpus id could collide with), so the row itself is not excluded
    // and must come back as its own nearest neighbor at cosine 1
    val rv = post("""{"query": "{ t: embeddings { f: filter(vec_id: {eq: 7}) { c: columns { embedding { values } } } } }"}""")
    assert(rv.statusCode() == 200, rv.body())
    val emb = """\[\[(.*?)\]\]""".r.findFirstMatchIn(rv.body())
      .getOrElse(fail(s"no embedding in ${rv.body().take(200)}")).group(1)
    val q = s"""{ t: embeddings {
      n: nearest(on: \\"embedding\\", id: \\"vec_id\\", vector: [$emb],
                 k: 3, method: \\"BRUTE\\") {
        o: order(by: [\\"rank\\"]) {
          c: columns { query_id { values } neighbor_id { values }
                       score { values } rank { values } } } } } }"""
    val r = post(s"""{"query": "${q.replace("\n", " ")}"}""")
    assert(r.statusCode() == 200 && !r.body().contains("\"errors\""), r.body())
    assert(r.body().contains(""""query_id":{"values":[null,null,null]}"""), r.body().take(300))
    val firstNeighbor = """"neighbor_id":\{"values":\[(\d+)""".r
      .findFirstMatchIn(r.body()).map(_.group(1))
    assert(firstNeighbor.contains("7"),
      s"row 7's own vector must rank itself first, got ${r.body().take(300)}")
  }

  test("Json.parse round-trips the value grammar") {
    assert(Json.parse("""{"a": [1, 2.5, "x\nя", true, null], "b": {"c": -7}}""") ==
      GObj(Seq(
        "a" -> GList(Seq(GInt(1), GFloat(2.5), GStr("x\nя"), GBool(true), GNull)),
        "b" -> GObj(Seq("c" -> GInt(-7))))))
    assert(Json.parse("9223372036854775807") == GInt(Long.MaxValue))
    assert(Json.parse("1e3") == GFloat(1000.0))
    intercept[IllegalArgumentException](Json.parse("""{"a": }"""))
    intercept[IllegalArgumentException](Json.parse("""[1,]"""))
    intercept[IllegalArgumentException](Json.parse("""{} trailing"""))
    // hostile nesting fails cleanly instead of overflowing the stack
    val deep = "[" * 5000 + "]" * 5000
    val e = intercept[IllegalArgumentException](Json.parse(deep))
    assert(e.getMessage.contains("nesting too deep"))
  }

  test("__typename answers at root and table scope (Apollo clients inject it)") {
    val r = post("""{"query": "{ __typename nation { __typename count } }"}""")
    assert(r.statusCode() == 200)
    assert(r.body().contains(""""__typename":"Query""""))
    assert(r.body().contains(""""__typename":"Table""""))
    assert(r.body().contains(""""count":25"""))
    // GET carries operationName too
    val doc = java.net.URLEncoder.encode(
      "query A { nation { count } } query B { region { count } }", "UTF-8")
    val g = get(base + s"?query=$doc&operationName=B")
    assert(g.body().contains(""""count":5"""), g.body())
  }

  test("operationName selects among multiple named operations") {
    val doc = """query CountNation { nation { count } }
                 query CountRegion { region { count } }"""
    val body = (n: String) =>
      s"""{"query": ${Json.quote(doc)}, "operationName": "$n"}"""
    assert(post(body("CountNation")).body().contains(""""count":25"""))
    assert(post(body("CountRegion")).body().contains(""""count":5"""))
    // ambiguous without a name; unknown name is an error
    val ambiguous = post(s"""{"query": ${Json.quote(doc)}}""")
    assert(ambiguous.body().contains("operationName required"))
    val unknown = post(body("Nope"))
    assert(unknown.body().contains("unknown operation"))
  }

  test("ServiceMain env helpers: COLUMNS forms and root naming") {
    assert(ServiceMain.parseColumns("""["a", "b"]""") == Seq("a" -> "a", "b" -> "b"))
    assert(ServiceMain.parseColumns("""{"alias": "src"}""") == Seq("alias" -> "src"))
    intercept[IllegalArgumentException](ServiceMain.parseColumns(""""nope""""))
    assert(ServiceMain.rootName("/data/lineitem.parquet") == "lineitem")
    assert(ServiceMain.rootName("/data/my-set.parquet") == "my_set")
    assert(ServiceMain.rootName("/data/2024") == "_2024")
    assert(ServiceMain.parseSparkConf(
      """{"spark.sql.files.maxPartitionBytes": "256m",
         "spark.sql.adaptive.enabled": "true"}""") ==
      Seq("spark.sql.files.maxPartitionBytes" -> "256m",
        "spark.sql.adaptive.enabled" -> "true"))
    intercept[IllegalArgumentException](
      ServiceMain.parseSparkConf("""["not", "an", "object"]"""))
    intercept[IllegalArgumentException](
      ServiceMain.parseSparkConf("""{"k": 42}"""))
  }

  test("extra root with boot-time projection: served schema and data use aliases") {
    val svc = new GraphQLService(spark, sf, names = Nil,
      extraRoots = Map("zips" -> s"$sf/nation.parquet"),
      rootProjections = Map("zips" -> Seq("key" -> "n_nationkey", "name" -> "n_name")))
    val srv = new GraphQLHttpServer(svc, port = 0).start()
    try {
      val c = HttpClient.newHttpClient()
      val r = c.send(
        HttpRequest.newBuilder(URI.create(s"http://localhost:${srv.boundPort}/graphql"))
          .POST(HttpRequest.BodyPublishers.ofString(
            """{"query": "{ zips { count schema { names }
                 order(by: [\"key\"], limit: 1) { columns { name { values } } } } }"""
              .replace("\n", " ") + "\"}", UTF_8)).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200)
      assert(r.body().contains(""""count":25"""))
      assert(r.body().contains(""""names":["key","name"]"""))
      // SDL reflects the projected schema under the extra root
      assert(svc.sdl.contains("zips: Zips"))
      assert(svc.sdl.contains("key: Int") || svc.sdl.contains("key: BigInt"))
      assert(!svc.sdl.contains("n_nationkey"))
    } finally srv.stop()
  }
}
