package graft.io

import java.awt.{BasicStroke, Color, Font, RenderingHints}
import java.awt.image.BufferedImage

import org.apache.spark.sql.DataFrame

/** Raster (PNG) calendar-heatmap renderer — closes the reference's
  * `.png` artifact path (`/root/reference/gdutils/plot/plotter.py:459-510`
  * writes seaborn heatmaps to PNG files) with zero added dependencies:
  * javax.imageio ships in the JDK. Draws the SAME `CalendarSvg.Grid`
  * model with the SAME colormap (`CalendarSvg.color`) as the SVG
  * backend — geometry, annotations, tick-label conventions, and the
  * documented colormap divergence are shared by construction, so the
  * two media cannot drift.
  *
  * Scale: like CalendarSvg, a driver-side formatter over an
  * already-aggregated report-sized pivot (row-capped); the distributed
  * work is the pivot in `operators/Calendars`.
  */
object CalendarPng {

  private def awt(hex: String): Color = Color.decode(hex)

  /** Render a calendar pivot (see `CalendarSvg.render`) to PNG bytes. */
  def render(calendar: DataFrame, center: Option[Double] = None,
             maxRows: Int = 200): Array[Byte] = {
    val grid = CalendarSvg.grid(calendar, maxRows)
    import grid._
    val Cell = CalendarSvg.Cell
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    try {
      g.setRenderingHint(RenderingHints.KEY_TEXT_ANTIALIASING,
        RenderingHints.VALUE_TEXT_ANTIALIAS_ON)
      g.setColor(Color.WHITE)
      g.fillRect(0, 0, w, h)
      // cells first: fill + white hairline grid (the SVG's 0.5-px stroke)
      val hairline = new BasicStroke(0.5f)
      values.zipWithIndex.foreach { case (rowVals, ri) =>
        val cy = top + ri * Cell
        rowVals.zipWithIndex.foreach { case (vOpt, ci) =>
          val cx = left + ci * Cell
          g.setColor(vOpt.map(v => awt(CalendarSvg.color(v, lo, hi, center)))
            .getOrElse(Color.WHITE))
          g.fillRect(cx, cy, Cell, Cell)
          g.setColor(Color.WHITE)
          g.setStroke(hairline)
          g.drawRect(cx, cy, Cell, Cell)
        }
      }
      // annotations: every non-null cell carries its %.0f value, centered
      val annFont = new Font(Font.SANS_SERIF, Font.PLAIN, 10)
      g.setFont(annFont)
      val fm = g.getFontMetrics
      values.zipWithIndex.foreach { case (rowVals, ri) =>
        val cy = top + ri * Cell
        rowVals.zipWithIndex.foreach { case (vOpt, ci) =>
          vOpt.foreach { v =>
            val cx = left + ci * Cell
            val s = f"$v%.0f"
            g.setColor(awt(grid.textColor(v, center)))
            g.drawString(s, cx + Cell / 2 - fm.stringWidth(s) / 2,
              cy + Cell / 2 + 4)
          }
        }
      }
      // tick labels: numeric day columns horizontal, month columns
      // rotated 90°, row labels right-aligned — CalendarSvg's rules
      g.setColor(awt("#000000"))
      val tickFont = new Font(Font.SANS_SERIF, Font.PLAIN,
        if (monthColumns) 11 else 10)
      g.setFont(tickFont)
      val tfm = g.getFontMetrics
      xLabels.zipWithIndex.foreach { case (lbl, i) =>
        val cx = left + i * Cell + Cell / 2
        if (monthColumns) {
          val t = g.getTransform
          g.rotate(-math.Pi / 2, cx.toDouble, (top - 6).toDouble)
          g.drawString(lbl, cx, top - 6)
          g.setTransform(t)
        } else
          g.drawString(lbl, cx - tfm.stringWidth(lbl) / 2, top - 6)
      }
      val rowFont = new Font(Font.SANS_SERIF, Font.PLAIN, 11)
      g.setFont(rowFont)
      val rfm = g.getFontMetrics
      yLabels.zipWithIndex.foreach { case (lbl, ri) =>
        g.drawString(lbl, left - 6 - rfm.stringWidth(lbl),
          top + ri * Cell + Cell / 2 + 4)
      }
    } finally g.dispose()
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Render and write to a local file (driver-side report artifact). */
  def write(calendar: DataFrame, path: String,
            center: Option[Double] = None, maxRows: Int = 200): Unit = {
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      render(calendar, center, maxRows))
    ()
  }
}
