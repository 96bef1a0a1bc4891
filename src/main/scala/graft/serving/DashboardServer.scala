package graft.serving

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import graft.analytics.ListingQueries
import graft.analytics.ListingQueries.Filters
import org.apache.spark.sql.{DataFrame, Row}

/** EP3's HTTP serving layer (dashboard/webapp/urls.py, views.py:117-278)
  * over the engine's DataFrame computations — the eight `/api/…`
  * endpoints with the reference's JSON shapes, on the JDK's built-in
  * HttpServer (zero dependencies; Django is transport, not semantics).
  *
  * Serving model: the clean listings DataFrame is CACHED once and every
  * request plans a fresh filtered query against it — the same
  * request-level semantics as the reference (which re-reads the CSV per
  * request, views.py:17-37) without the per-request IO. Handlers run on
  * the server's executor threads; Spark sessions are thread-safe for
  * concurrent read-only actions, and each endpoint's result is
  * endpoint-bounded (≤ 300 filter values, ≤ 12 bars, ≤ 1500 points,
  * ≤ 50 rows), so a request can never pull corpus-sized data onto the
  * serving path — the 100 TB posture is that the engine aggregates and
  * the server only SHAPES bounded results.
  *
  * JSON is emitted by a hand-rolled writer (strings escaped per RFC
  * 8259, doubles via Java's shortest round-trip form, nulls explicit)
  * so the wire format is deterministic and dependency-stable. */
object DashboardServer {

  final case class Started(
      server: HttpServer,
      port: Int,
      private[serving] val pool: java.util.concurrent.ExecutorService,
      private[serving] val cached: DataFrame) {
    /** Full lifecycle teardown: the HTTP listener, the 4-thread handler
      * pool (non-daemon — without shutdown it pins the JVM), and the
      * cached listings table are all released, so repeated start/stop
      * cycles leak neither threads nor storage memory. */
    def stop(): Unit = {
      server.stop(0)
      pool.shutdown()
      cached.unpersist()
    }
  }

  /** Start serving `clean` on `port` (0 = ephemeral). */
  def start(clean: DataFrame, port: Int = 0): Started = {
    val df = clean.cache()
    val server = HttpServer.create(new InetSocketAddress(port), 0)

    def endpoint(path: String)(f: Map[String, String] => String): Unit =
      server.createContext(path, new HttpHandler {
        override def handle(ex: HttpExchange): Unit = {
          val body =
            try f(queryParams(ex))
            catch {
              case e: Exception =>
                val msg = jsonObj(Seq("error" -> jsonStr(
                  Option(e.getMessage).getOrElse(e.getClass.getName))))
                respond(ex, 500, msg); return
            }
          respond(ex, 200, body)
        }
      })

    def filtered(p: Map[String, String]): DataFrame =
      ListingQueries.applyFilters(df, Filters(p.get("state"), p.get("keyword")))

    endpoint("/api/filters/") { _ =>
      val states = ListingQueries.filterValues(df, "state")
        .collect().map(_.getString(0))
      val keywords = ListingQueries.filterValues(df, "search_keyword")
        .collect().map(_.getString(0))
      jsonObj(Seq(
        "states" -> jsonArr(states.map(jsonStr)),
        "keywords" -> jsonArr(keywords.map(jsonStr))))
    }

    endpoint("/api/summary/") { p =>
      val r = ListingQueries.summaryKpis(filtered(p)).collect()(0)
      jsonObj(Seq(
        "total_rows" -> r.getLong(0).toString,
        "unique_suppliers" -> r.getLong(1).toString,
        "unique_cities" -> r.getLong(2).toString,
        "unique_states" -> r.getLong(3).toString,
        "median_price" -> jsonNum(r.getDouble(4)),
        "avg_price" -> jsonNum(r.getDouble(5))))
    }

    def labelsValues(rows: Array[Row]): String = jsonObj(Seq(
      "labels" -> jsonArr(rows.map(r => jsonStr(r.getString(0)))),
      "values" -> jsonArr(rows.map(r => r.getLong(1).toString))))

    endpoint("/api/top-cities/") { p =>
      labelsValues(ListingQueries.valueCountsTopN(filtered(p), "city", 12).collect())
    }
    endpoint("/api/top-states/") { p =>
      labelsValues(ListingQueries.valueCountsTopN(filtered(p), "state", 12).collect())
    }
    endpoint("/api/price-buckets/") { p =>
      labelsValues(ListingQueries.priceBuckets(filtered(p)).collect())
    }

    endpoint("/api/price-hist/") { p =>
      val rows = ListingQueries.priceHist(filtered(p)).collect()
      jsonObj(Seq(
        "bins" -> jsonArr(rows.map(r => jsonStr(r.getAs[String]("bin")))),
        "counts" -> jsonArr(rows.map(r => r.getAs[Long]("count").toString))))
    }

    endpoint("/api/scatter-rating-price/") { p =>
      val rows = ListingQueries.scatterRatingPrice(filtered(p)).collect()
      jsonObj(Seq("points" -> jsonArr(rows.map(r => jsonObj(Seq(
        "x" -> jsonNum(r.getDouble(0)), "y" -> jsonNum(r.getDouble(1))))))))
    }

    endpoint("/api/mini-rows/") { p =>
      val n = p.get("n").flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(8)
      val rows = ListingQueries.miniRows(filtered(p), n).collect()
      jsonObj(Seq("rows" -> jsonArr(rows.map { r =>
        def s(c: String) = jsonStr(Option(r.getAs[String](c)).getOrElse(""))
        val price = r.getAs[Any]("price_numeric") match {
          case null      => "null"
          case d: Double => jsonNum(d)
          case other     => jsonNum(other.toString.toDouble)
        }
        jsonObj(Seq(
          "product_name" -> s("product_name"),
          "supplier_name" -> s("supplier_name"),
          "city" -> s("city"),
          "price_numeric" -> price))
      })))
    }

    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    server.setExecutor(pool)
    server.start()
    Started(server, server.getAddress.getPort, pool, df)
  }

  private def respond(ex: HttpExchange, status: Int, body: String): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json; charset=utf-8")
    ex.sendResponseHeaders(status, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getRawQuery).fold(Map.empty[String, String]) { q =>
      q.split("&").iterator.filter(_.nonEmpty).map { kv =>
        val i = kv.indexOf('=')
        if (i < 0) (urlDecode(kv), "")
        else (urlDecode(kv.take(i)), urlDecode(kv.drop(i + 1)))
      }.toMap
    }

  private def urlDecode(s: String): String =
    java.net.URLDecoder.decode(s, StandardCharsets.UTF_8)

  // ---- deterministic JSON writer ----------------------------------------

  private[serving] def jsonStr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"'           => b.append("\\\"")
      case '\\'          => b.append("\\\\")
      case '\b'          => b.append("\\b")
      case '\f'          => b.append("\\f")
      case '\n'          => b.append("\\n")
      case '\r'          => b.append("\\r")
      case '\t'          => b.append("\\t")
      case c if c < 0x20 => b.append(f"\\u${c.toInt}%04x")
      case c             => b.append(c)
    }
    b.append('"').toString
  }

  /** Shortest round-trip double; integral values print without ".0"
    * only where JSON consumers expect a number either way — keep Java's
    * canonical form (matches JsonResponse's float serialization shape
    * closely enough for numeric consumers; spec compares VALUES). */
  private[serving] def jsonNum(d: Double): String = {
    require(!d.isNaN && !d.isInfinite, s"non-finite number in JSON: $d")
    d.toString
  }

  private[serving] def jsonArr(items: Seq[String]): String =
    items.mkString("[", ",", "]")

  private[serving] def jsonObj(fields: Seq[(String, String)]): String =
    fields.map { case (k, v) => s"${jsonStr(k)}:$v" }.mkString("{", ",", "}")
}
