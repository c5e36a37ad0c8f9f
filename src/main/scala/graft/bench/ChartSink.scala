package graft.bench

import java.awt.{BasicStroke, Color, Font, Graphics2D, RenderingHints}
import java.awt.image.BufferedImage
import java.io.File
import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame

/** S11: PNG chart sink — the reference publishes its experiment results
  * as matplotlib line/bar charts (chromadb_speed_experiment.py:550-591
  * `search_speed_by_pages.png` / `search_speed_by_collection.png`;
  * chromadb_acc_experiment.py:699-756 `recall_by_pages.png` /
  * `recall_by_collection.png`). This sink renders the same shapes —
  * marker line charts and labeled bar charts over an aggregated summary
  * frame — with the JDK's headless java.awt raster + ImageIO, so the
  * chart path adds zero dependencies.
  *
  * Scale note: the input is BY DEFINITION presentation-sized (the
  * per-collection summary the experiments aggregate down to — dozens of
  * rows, same data matplotlib would receive), so the collect() here is a
  * bounded driver action, never a corpus scan. `maxRows` enforces that
  * assumption loudly instead of letting a mis-wired corpus frame OOM the
  * driver.
  */
object ChartSink {

  System.setProperty("java.awt.headless", "true")

  private val seriesColors = Array(
    new Color(70, 130, 180), // steelblue, the reference's default
    new Color(255, 140, 0), // the reference's second-series orange
    new Color(60, 160, 60),
    new Color(200, 60, 60))

  private val axisFont = new Font(Font.SANS_SERIF, Font.PLAIN, 12)
  private val titleFont = new Font(Font.SANS_SERIF, Font.BOLD, 14)
  private val tickFont = new Font(Font.SANS_SERIF, Font.PLAIN, 10)

  /** Line chart with circular markers: one polyline per column of
    * `yCols`, x ascending. Mirrors axes[i].plot(..., marker='o',
    * grid=True) of the reference.
    */
  def lineChart(
      df: DataFrame,
      xCol: String,
      yCols: Seq[String],
      title: String,
      xLabel: String,
      yLabel: String,
      path: String,
      width: Int = 900,
      height: Int = 540,
      maxRows: Int = 10000): Unit = {
    val rows = collectNumeric(df, xCol +: yCols, maxRows).sortBy(_.head)
    render(path, width, height) { g =>
      val xs = rows.map(_.head)
      val ys = rows.flatMap(_.tail)
      val (px, py) = plotArea(g, width, height, title, xLabel, yLabel,
        xs, ys, xTickLabels = None)
      yCols.zipWithIndex.foreach { case (yc, si) =>
        g.setColor(seriesColors(si % seriesColors.length))
        g.setStroke(new BasicStroke(2f))
        val pts = rows.toSeq.map(r => (px(r.head), py(r(si + 1))))
        pts.sliding(2).foreach {
          case Seq((x1, y1), (x2, y2)) => g.drawLine(x1, y1, x2, y2)
          case _ => ()
        }
        pts.foreach { case (x, y) => g.fillOval(x - 4, y - 4, 8, 8) }
      }
      legend(g, width, yCols)
    }
  }

  /** Grouped bar chart with per-bar value labels, category x axis.
    * Mirrors ax.bar(...) + ax.text(value) of the reference.
    */
  def barChart(
      df: DataFrame,
      labelCol: String,
      valueCols: Seq[String],
      title: String,
      xLabel: String,
      yLabel: String,
      path: String,
      width: Int = 900,
      height: Int = 540,
      maxRows: Int = 1000): Unit = {
    val raw = df.select((labelCol +: valueCols).map(org.apache.spark.sql.functions.col): _*)
      .limit(maxRows + 1).collect()
    require(raw.length <= maxRows,
      s"barChart input exceeds $maxRows rows — charts take SUMMARY frames, not corpus data")
    val labels = raw.map(r => String.valueOf(r.get(0)))
    val values = raw.map(r => (1 to valueCols.length).map(i => num(r.get(i))).toIndexedSeq)
    render(path, width, height) { g =>
      val flat = values.flatten.toIndexedSeq
      val (px, py) = plotArea(g, width, height, title, xLabel, yLabel,
        xs = labels.indices.map(_.toDouble), ys = 0.0 +: flat,
        xTickLabels = Some(labels.toIndexedSeq))
      val y0 = py(0.0)
      val slot = if (labels.length > 1) px(1.0) - px(0.0) else 200
      val groupW = math.max((slot * 0.7).toInt, 2)
      val barW = math.max(groupW / math.max(valueCols.length, 1), 1)
      g.setFont(tickFont)
      for (i <- labels.indices; s <- valueCols.indices) {
        val v = values(i)(s)
        val x = px(i.toDouble) - groupW / 2 + s * barW
        val yTop = py(v)
        val c = seriesColors(s % seriesColors.length)
        g.setColor(new Color(c.getRed, c.getGreen, c.getBlue, 190))
        g.fillRect(x, math.min(yTop, y0), barW - 1, math.abs(y0 - yTop))
        g.setColor(Color.DARK_GRAY)
        val lbl = f"$v%.1f"
        val w = g.getFontMetrics.stringWidth(lbl)
        g.drawString(lbl, x + (barW - 1 - w) / 2, math.min(yTop, y0) - 3)
      }
      legend(g, width, valueCols)
    }
  }

  // ------------------------------------------------------------- internals

  private def collectNumeric(df: DataFrame, cols: Seq[String], maxRows: Int): Array[IndexedSeq[Double]] = {
    val raw = df.select(cols.map(org.apache.spark.sql.functions.col): _*)
      .limit(maxRows + 1).collect()
    require(raw.length <= maxRows,
      s"chart input exceeds $maxRows rows — charts take SUMMARY frames, not corpus data")
    raw.map(r => cols.indices.map(i => num(r.get(i))))
  }

  private def num(v: Any): Double = v match {
    case null => 0.0
    case n: java.lang.Number => n.doubleValue()
    case d: java.math.BigDecimal => d.doubleValue()
    case other => throw new IllegalArgumentException(
      s"chart value column must be numeric, got ${other.getClass.getSimpleName}")
  }

  private def render(path: String, width: Int, height: Int)(draw: Graphics2D => Unit): Unit = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_ANTIALIASING, RenderingHints.VALUE_ANTIALIAS_ON)
      g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING, RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, width, height)
      draw(g)
    } finally g.dispose()
    val f = new File(path)
    Option(f.getParentFile).foreach(_.mkdirs())
    ImageIO.write(img, "png", f)
  }

  /** Draws title, axes, grid, ticks; returns the data→pixel mappers. */
  private def plotArea(
      g: Graphics2D,
      width: Int,
      height: Int,
      title: String,
      xLabel: String,
      yLabel: String,
      xs: Seq[Double],
      ys: Seq[Double],
      xTickLabels: Option[IndexedSeq[String]]): (Double => Int, Double => Int) = {
    val (l, r, t, b) = (70, 25, 45, 60)
    val (x0, x1) = pad(xs.minOption.getOrElse(0.0), xs.maxOption.getOrElse(1.0))
    val (y0, y1) = pad(ys.minOption.getOrElse(0.0), ys.maxOption.getOrElse(1.0))
    def px(v: Double): Int = l + ((v - x0) / (x1 - x0) * (width - l - r)).toInt
    def py(v: Double): Int = height - b - ((v - y0) / (y1 - y0) * (height - t - b)).toInt

    g.setColor(Color.BLACK)
    g.setFont(titleFont)
    g.drawString(title, (width - g.getFontMetrics.stringWidth(title)) / 2, 25)
    g.setFont(axisFont)
    g.drawString(xLabel, (width - g.getFontMetrics.stringWidth(xLabel)) / 2, height - 15)
    val old = g.getTransform
    g.rotate(-math.Pi / 2, 18, height / 2)
    g.drawString(yLabel, 18 - g.getFontMetrics.stringWidth(yLabel) / 2, height / 2)
    g.setTransform(old)

    g.setFont(tickFont)
    ticks(y0, y1).foreach { v =>
      val y = py(v)
      g.setColor(new Color(0, 0, 0, 28)) // grid alpha≈0.3·light, per reference grid style
      g.drawLine(l, y, width - r, y)
      g.setColor(Color.DARK_GRAY)
      val s = tickLabel(v)
      g.drawString(s, l - 6 - g.getFontMetrics.stringWidth(s), y + 4)
    }
    xTickLabels match {
      case Some(labels) =>
        labels.zipWithIndex.foreach { case (s, i) =>
          val x = px(i.toDouble)
          g.setColor(Color.DARK_GRAY)
          val short = if (s.length > 18) s.take(17) + "…" else s
          g.drawString(short, x - g.getFontMetrics.stringWidth(short) / 2, height - b + 16)
        }
      case None =>
        ticks(x0, x1).foreach { v =>
          val x = px(v)
          g.setColor(new Color(0, 0, 0, 28))
          g.drawLine(x, t, x, height - b)
          g.setColor(Color.DARK_GRAY)
          val s = tickLabel(v)
          g.drawString(s, x - g.getFontMetrics.stringWidth(s) / 2, height - b + 16)
        }
    }
    g.setColor(Color.BLACK)
    g.drawLine(l, height - b, width - r, height - b)
    g.drawLine(l, t, l, height - b)
    (px, py)
  }

  private def legend(g: Graphics2D, width: Int, names: Seq[String]): Unit = {
    if (names.length <= 1) return
    g.setFont(tickFont)
    var x = width - 25 - names.map(n => g.getFontMetrics.stringWidth(n) + 26).sum
    names.zipWithIndex.foreach { case (n, i) =>
      g.setColor(seriesColors(i % seriesColors.length))
      g.fillRect(x, 32, 10, 10)
      g.setColor(Color.BLACK)
      g.drawString(n, x + 14, 41)
      x += g.getFontMetrics.stringWidth(n) + 26
    }
  }

  /** 5%-padded range, degenerate ranges widened so the mappers never
    * divide by zero.
    */
  private def pad(lo: Double, hi: Double): (Double, Double) = {
    val (l, h) = if (lo == hi) (lo - 1.0, hi + 1.0) else (lo, hi)
    val m = (h - l) * 0.05
    (l - m, h + m)
  }

  /** ~5 "nice" tick positions (1/2/5 × 10^k steps). */
  private def ticks(lo: Double, hi: Double): Seq[Double] = {
    val span = hi - lo
    val rawStep = span / 5
    val mag = math.pow(10, math.floor(math.log10(rawStep)))
    val step = Seq(1.0, 2.0, 5.0, 10.0).map(_ * mag).find(_ >= rawStep).getOrElse(10 * mag)
    val first = math.ceil(lo / step) * step
    Iterator.iterate(first)(_ + step).takeWhile(_ <= hi).toSeq
  }

  private def tickLabel(v: Double): String =
    if (v == math.rint(v) && math.abs(v) < 1e15) v.toLong.toString
    else if (math.abs(v) >= 100) f"$v%.0f"
    else f"$v%.2f"
}
