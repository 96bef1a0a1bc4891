package graft.render

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.udf

/** EP2's chart RENDERING layer (analysis.py:95-162,194-522) as
  * deterministic, font-free PNG geometry on the JDK's headless
  * BufferedImage — the last piece of the reference surface previously
  * scoped out. The DATA behind every chart is the already-golden
  * DataFrame layer ([[graft.analytics.ListingQueries]]); this module
  * only turns bounded result sets (≤ 12 bars, ≤ 1500 points) into
  * pixels. Text labels are deliberately ABSENT: font rasterization is
  * platform-dependent, and the determinism contract here is byte-level
  * (same data → same PNG on any JVM) — labels belong to the JSON
  * endpoints ([[graft.serving.DashboardServer]]) that front-ends pair
  * with these images.
  *
  * Scale posture: whole-figure rendering is DRIVER-side over collected
  * endpoint-bounded rows (like the reference's matplotlib step);
  * [[sparklinePng]] is the distributed path — a per-GROUP binary
  * column rendered executor-side, the inverse of the multimodal decode
  * family (engine emits media instead of reading it). Rendering is
  * imperative pixel work with no relational semantics, so a UDF is the
  * honest tool here (cold path — bounded rows or bounded per-group
  * arrays, never a corpus-sized hot loop). */
object Charts {

  /** The reference's chart blue (#0B5FAE, analysis.py KPI cards). */
  val SeriesColor = 0xFF0B5FAE
  val Background = 0xFFFFFFFF
  val AxisColor = 0xFF444444

  private def blank(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_ARGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, Background); x += 1 }
      y += 1
    }
    img
  }

  private def fillRect(img: BufferedImage, x0: Int, y0: Int, x1: Int, y1: Int,
      argb: Int): Unit = {
    val xa = math.max(0, math.min(x0, x1)); val xb = math.min(img.getWidth - 1, math.max(x0, x1))
    val ya = math.max(0, math.min(y0, y1)); val yb = math.min(img.getHeight - 1, math.max(y0, y1))
    var y = ya
    while (y <= yb) {
      var x = xa
      while (x <= xb) { img.setRGB(x, y, argb); x += 1 }
      y += 1
    }
  }

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Vertical bar chart over (value) pairs — charts 3/4/6 (top cities,
    * price buckets, histogram bars). Bars fill the plot area left to
    * right in row order, heights scaled to the max value; a 1-px axis
    * frame on the left and bottom. Deterministic integer geometry. */
  def barsPng(values: Seq[Double], width: Int = 640, height: Int = 360,
      margin: Int = 24): Array[Byte] = {
    require(values.nonEmpty, "barsPng: no values")
    require(values.forall(v => !v.isNaN && v >= 0), "barsPng: values must be >= 0")
    val img = blank(width, height)
    val plotW = width - 2 * margin
    val plotH = height - 2 * margin
    val mx = math.max(values.max, java.lang.Double.MIN_NORMAL)
    val n = values.length
    val slot = plotW / n
    val barW = math.max(1, slot * 4 / 5)
    values.zipWithIndex.foreach { case (v, i) =>
      val bh = math.round(plotH * (v / mx)).toInt
      val x0 = margin + i * slot + (slot - barW) / 2
      fillRect(img, x0, height - margin - bh, x0 + barW - 1, height - margin - 1,
        SeriesColor)
    }
    // axis frame
    fillRect(img, margin - 1, margin, margin - 1, height - margin, AxisColor)
    fillRect(img, margin - 1, height - margin, width - margin, height - margin, AxisColor)
    png(img)
  }

  /** Scatter plot over (x, y) points — chart 10 (rating vs price).
    * 3×3-px markers, both axes scaled to the data's min/max. */
  def scatterPng(points: Seq[(Double, Double)], width: Int = 640,
      height: Int = 360, margin: Int = 24): Array[Byte] = {
    require(points.nonEmpty, "scatterPng: no points")
    val img = blank(width, height)
    val (xs, ys) = (points.map(_._1), points.map(_._2))
    val (mnx, mxx) = (xs.min, xs.max)
    val (mny, mxy) = (ys.min, ys.max)
    def sx(x: Double) = margin +
      (if (mxx > mnx) ((x - mnx) / (mxx - mnx) * (width - 2 * margin)).toInt else 0)
    def sy(y: Double) = (height - margin) -
      (if (mxy > mny) ((y - mny) / (mxy - mny) * (height - 2 * margin)).toInt else 0)
    points.foreach { case (x, y) =>
      fillRect(img, sx(x) - 1, sy(y) - 1, sx(x) + 1, sy(y) + 1, SeriesColor)
    }
    fillRect(img, margin - 1, margin, margin - 1, height - margin, AxisColor)
    fillRect(img, margin - 1, height - margin, width - margin, height - margin, AxisColor)
    png(img)
  }

  /** Slice-and-dice treemap RECTANGLES (analysis.py:164-188's layout
    * semantics): alternate horizontal/vertical splits of the remaining
    * rectangle, each slice proportional to its share of the remaining
    * total. Pure geometry in [0,1]² — the render below scales it. */
  def treemapRects(sizes: Seq[Double]): Seq[(Double, Double, Double, Double)] = {
    require(sizes.forall(s => !s.isNaN && s >= 0), "treemapRects: sizes must be >= 0")
    var total = math.max(sizes.sum, java.lang.Double.MIN_NORMAL)
    var (x, y, w, h) = (0.0, 0.0, 1.0, 1.0)
    var horizontal = true
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Double, Double, Double)]
    // every size gets a rect; frac is clamped to [0,1] so FP drift that
    // pushes the running total slightly negative mid-run degrades to
    // zero-area rects for the tail instead of negative geometry
    sizes.foreach { s =>
      val frac = if (total > 0) math.min(1.0, s / total) else 0.0
      if (horizontal) {
        val rw = w * frac
        out += ((x, y, rw, h)); x += rw; w -= rw
      } else {
        val rh = h * frac
        out += ((x, y, w, rh)); y += rh; h -= rh
      }
      total -= s
      horizontal = !horizontal
    }
    out.toSeq
  }

  /** Treemap PNG — chart 8 (keyword share). Slices alternate two
    * shades so adjacent cells stay distinguishable without labels. */
  def treemapPng(sizes: Seq[Double], width: Int = 640, height: Int = 360): Array[Byte] = {
    require(sizes.nonEmpty, "treemapPng: no sizes")
    val img = blank(width, height)
    val shade2 = 0xFF3D87C8
    treemapRects(sizes).zipWithIndex.foreach { case ((x, y, w, h), i) =>
      val x0 = (x * width).toInt; val y0 = (y * height).toInt
      val x1 = math.min(width - 1, (x + w) * width - 1).toInt
      val y1 = math.min(height - 1, (y + h) * height - 1).toInt
      if (x1 >= x0 && y1 >= y0)
        fillRect(img, x0, y0, x1, y1, if (i % 2 == 0) SeriesColor else shade2)
    }
    png(img)
  }

  /** Distributed per-group sparkline: array<double> → PNG bytes,
    * executor-side. The inverse of the multimodal decode family — the
    * engine EMITS a binary media column. Bounded per group (callers
    * aggregate first), deterministic geometry (a 1-px-wide vertical
    * span per sample column, scaled to the group's min/max). */
  def sparklinePng(width: Int = 128, height: Int = 32): Column => Column = {
    val f = udf { (vs: Seq[Double]) =>
      if (vs == null || vs.isEmpty) null
      else {
        val img = blank(width, height)
        val (mn, mx) = (vs.min, vs.max)
        val n = vs.length
        vs.zipWithIndex.foreach { case (v, i) =>
          val x0 = (i.toLong * width / n).toInt
          val x1 = math.max(x0, ((i + 1).toLong * width / n).toInt - 1)
          val yv = (height - 1) -
            (if (mx > mn) ((v - mn) / (mx - mn) * (height - 1)).toInt else 0)
          fillRect(img, x0, yv, x1, height - 1, SeriesColor)
        }
        png(img)
      }
    }
    (c: Column) => f(c)
  }

  /** Render the three driver-side figures for a clean-listings frame
    * into `outDir` — the engine-side equivalent of analysis.py's
    * `charts/` output (geometry only; see the class doc for why). */
  def renderAll(clean: DataFrame, outDir: String): Seq[String] = {
    import graft.analytics.ListingQueries
    new java.io.File(outDir).mkdirs()
    def write(name: String, bytes: Array[Byte]): String = {
      val f = new java.io.File(outDir, name)
      java.nio.file.Files.write(f.toPath, bytes)
      f.getAbsolutePath
    }
    val cities = ListingQueries.valueCountsTopN(clean, "city", 10)
      .collect().map(_.getLong(1).toDouble).toSeq
    val hist = ListingQueries.priceHist(clean)
      .collect().map(_.getAs[Long]("count").toDouble).toSeq
    val scatter = ListingQueries.scatterRatingPrice(clean)
      .collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq
    val share = ListingQueries.keywordShareTopOthers(clean)
      .collect().map(_.getAs[Long]("count").toDouble).toSeq
    Seq(
      write("top_cities_bars.png", barsPng(cities)),
      write("price_hist.png", barsPng(hist)),
      write("rating_price_scatter.png", scatterPng(scatter)),
      write("keyword_share_treemap.png", treemapPng(share)))
  }
}
