package graft.util

/** Human time-window strings → seconds (SURVEY.md §1.1.5; the reference
  * accepts `pytimeparse` formats like "72h", "3s", "1d2h" for its
  * time-to-comment window, `ihop/import_data.py:615-625`). */
object Timeparse {

  private val Token = "(\\d+(?:\\.\\d+)?)\\s*(w|d|h|m|s)".r
  private val Unit: Map[String, Double] = Map(
    "w" -> 604800, "d" -> 86400, "h" -> 3600, "m" -> 60, "s" -> 1)

  /** "72h" → 259200; "1d2h" → 93600; plain numbers are seconds.
    * Throws IllegalArgumentException on unparseable input. */
  def toSeconds(spec: String): Long = {
    val s = spec.trim.toLowerCase
    if (s.matches("\\d+")) return s.toLong
    val tokens = Token.findAllMatchIn(s).toSeq
    require(tokens.nonEmpty && tokens.map(_.matched).mkString == s.replaceAll("\\s+", ""),
      s"unparseable time window: '$spec'")
    math.round(tokens.map(m => m.group(1).toDouble * Unit(m.group(2))).sum)
  }
}
