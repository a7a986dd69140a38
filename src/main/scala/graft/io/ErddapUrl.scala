package graft.io

import java.net.URLEncoder

/** ERDDAP request-URL builder (reference F14 + the download-URL shape:
  * /root/reference/gdutils/__init__.py:770-805,945-951). Driver-side
  * utility — the engine consumes files/tables, but a reference user's
  * scripts build these URLs, so the surface is preserved.
  */
object ErddapUrl {

  /** Percent-encode an ERDDAP query segment, keeping the characters
    * ERDDAP's constraint grammar needs readable (the reference quotes
    * with safe='=&()&'-ish semantics). */
  def encode(s: String): String =
    URLEncoder.encode(s, "UTF-8")
      .replace("+", "%20")

  /** tabledap CSV download URL: variable projection + constraint pushdown
    * expressed in the URL, e.g.
    * tabledap("https://srv/erddap", "ru29-20210630T1343",
    *   Seq("time","depth"), Seq("time>=2021-06-30T00:00:00Z")). */
  def tabledap(server: String, datasetId: String, variables: Seq[String],
               constraints: Seq[String] = Nil, format: String = "csv"): String = {
    val varPart = encode(variables.mkString(","))
    val consPart = constraints.map(c => "&" + encodeConstraint(c)).mkString
    s"$server/tabledap/$datasetId.$format?$varPart$consPart"
  }

  /** Constraint strings keep their operator characters; only the value
    * side is encoded. */
  private[io] def encodeConstraint(c: String): String = {
    val opIdx = c.indexWhere(ch => "<>=!".contains(ch))
    if (opIdx < 0) encode(c)
    else {
      val opEnd = c.indexWhere(ch => !"<>=!".contains(ch), opIdx)
      val (head, value) = c.splitAt(if (opEnd < 0) c.length else opEnd)
      head + encode(value)
    }
  }

  // ---- graph-image URLs (S17 — reference gdutils/plot/plotter.py) --------

  /** Valid image response types (reference plotter.py:13-19). */
  val imageResponses: Seq[String] =
    Seq("pdf", "largePdf", "smallPng", "png", "largePng", "transparentPng")

  /** ERDDAP marker type indices (reference plotter.py:81-90; `.marker=`
    * takes the INDEX into this list, pipe-joined with the size). */
  val markerTypes: Seq[String] = Seq("None", "Plus", "X", "Dot", "Square",
    "Filled Square", "Circle", "Filled Circle", "Up Triangle",
    "Filled Up Triangle")

  /** Marker/background color name → RGB hex (reference plotter.py:92-128). */
  val colorCodes: Map[String, String] = Map(
    "white" -> "FFFFFF", "light grey" -> "CCCCCC", "grey" -> "999999",
    "dark grey" -> "666666", "black" -> "000000", "red" -> "FF0000",
    "orange" -> "FF9900", "yellow" -> "FFFF00", "light green" -> "99FF00",
    "green" -> "00FF00", "blue green" -> "00FF99", "cyan" -> "00FFFF",
    "blue" -> "0099FF", "dark blue" -> "0000FF", "purple" -> "9900FF",
    "pink" -> "FF00FF", "light pink" -> "FF99FF")

  /** The reference's default `.plotParam` set (plotter.py:21-28). Ordered
    * map — ERDDAP is order-insensitive but the emitted URL is kept
    * deterministic (keys ascend, which matches the reference dict's
    * declaration order). */
  val defaultPlotParams: Seq[(String, String)] = Seq(
    ".bgColor" -> "0xFFFFFF",
    ".color" -> "0x000000",
    ".colorBar" -> "Rainbow2|C|Linear|||",
    ".draw" -> "markers",
    ".legend" -> "Bottom",
    ".marker" -> "6|5",
    ".xRange" -> "||true|Linear",
    ".yRange" -> "||false|Linear")

  /** `.marker=` value: marker type by NAME, encoded as its index
    * (reference set_marker_style, plotter.py:338-344). */
  def markerParam(marker: String = "Circle", size: Int = 5): (String, String) = {
    val idx = markerTypes.indexOf(marker)
    require(idx >= 0, s"unknown marker type: $marker")
    ".marker" -> s"$idx|$size"
  }

  /** `.colorBar=` value: palette|continuous|scale|min|max|nSections
    * (reference set_colorbar, plotter.py:271-294). */
  def colorBarParam(palette: String = "Rainbow2", continuous: String = "C",
                    scale: String = "Linear", min: String = "",
                    max: String = "", nSections: String = ""): (String, String) =
    ".colorBar" -> s"$palette|$continuous|$scale|$min|$max|$nSections"

  /** `.xRange=`/`.yRange=` value: min|max|ascending|scale (reference
    * set_x_range/set_y_range, plotter.py:350-372). */
  def rangeParam(axis: String, min: String = "", max: String = "",
                 ascending: Boolean = true, scale: String = "Linear"): (String, String) = {
    require(axis == "x" || axis == "y", "axis must be x or y")
    s".${axis}Range" -> s"$min|$max|$ascending|$scale"
  }

  /** Graph-image URL — the `.png` half of S17 (reference
    * build_image_request, plotter.py:459-490):
    * `{server}/tabledap/{id}.{response}?x,y[,c]&constraints&.plotParams`.
    * Plot-param VALUES are percent-encoded (the reference quotes values
    * only); keys keep their literal `.name=` shape. */
  def graphUrl(server: String, datasetId: String, x: String, y: String,
               c: Option[String] = None, constraints: Seq[String] = Nil,
               plotParams: Seq[(String, String)] = defaultPlotParams,
               response: String = "png"): String = {
    require(imageResponses.contains(response),
      s"invalid image response type: $response")
    val variables = (Seq(x, y) ++ c.toSeq).map(encode).mkString(",")
    val consPart = constraints.map(c0 => "&" + encodeConstraint(c0)).mkString
    val merged = plotParams.foldLeft(Vector.empty[(String, String)]) {
      case (acc, (k, v)) =>
        val i = acc.indexWhere(_._1 == k)
        if (i >= 0) acc.updated(i, k -> v) else acc :+ (k -> v)
    }
    val plotPart = merged.map { case (k, v) => s"$k=${encode(v)}" }.mkString("&")
    s"$server/tabledap/$datasetId.$response?$variables$consPart&$plotPart"
  }

  /** Advanced-search URL (S2 shape): page size pins the reference's
    * items_per_page=1e6 limit-pushdown behavior
    * (/root/reference/gdutils/__init__.py:31-32). */
  def advancedSearch(server: String, params: Map[String, String],
                     itemsPerPage: Long = 1000000L): String = {
    val q = (params + ("itemsPerPage" -> itemsPerPage.toString))
      .toSeq.sortBy(_._1)
      .map { case (k, v) => s"${encode(k)}=${encode(v)}" }
      .mkString("&")
    s"$server/search/advanced.csv?$q"
  }
}
