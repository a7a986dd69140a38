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
