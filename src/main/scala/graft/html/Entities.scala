package graft.html

/** HTML character-reference decoding (from scratch, no jsoup/bs4).
  *
  * Mirrors the decoding the reference gets implicitly from Python's
  * `html.parser` inside BeautifulSoup (`/root/reference/mvp/evaluation/eval.py:34`):
  * named references from a fixed subset plus decimal / hex numeric references.
  * The synth generator only emits entities from this subset, so the contract
  * is closed over the corpus.
  */
object Entities {

  /** Named entity subset (HTML 4 core + common typographic marks). */
  val named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "ndash" -> "–", "mdash" -> "—",
    "hellip" -> "…", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "copy" -> "©",
    "reg" -> "®", "trade" -> "™", "deg" -> "°",
    "plusmn" -> "±", "times" -> "×", "divide" -> "÷",
    "frac12" -> "½", "frac14" -> "¼", "frac34" -> "¾",
    "eacute" -> "é", "egrave" -> "è", "ecirc" -> "ê",
    "agrave" -> "à", "acirc" -> "â", "aacute" -> "á",
    "auml" -> "ä", "ouml" -> "ö", "uuml" -> "ü",
    "szlig" -> "ß", "ccedil" -> "ç", "ntilde" -> "ñ",
    "oacute" -> "ó", "iacute" -> "í", "uacute" -> "ú",
    "euro" -> "€", "pound" -> "£", "yen" -> "¥",
    "cent" -> "¢", "sect" -> "§", "para" -> "¶",
    "middot" -> "·", "laquo" -> "«", "raquo" -> "»",
    "bull" -> "•", "dagger" -> "†", "prime" -> "′",
    "minus" -> "−", "le" -> "≤", "ge" -> "≥",
    "ne" -> "≠", "asymp" -> "≈", "infin" -> "∞",
    "alpha" -> "α", "beta" -> "β", "gamma" -> "γ",
    "pi" -> "π", "mu" -> "μ", "sigma" -> "σ",
  )

  /** Decode all character references in `s`. Unknown / malformed references
    * pass through verbatim (lenient, like html.parser's convert_charrefs).
    */
  def decode(s: String): String = {
    if (s.indexOf('&') < 0) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c != '&') { sb.append(c); i += 1 }
      else {
        // find terminator ';' within a bounded window
        val semi = s.indexOf(';', i + 1)
        if (semi < 0 || semi - i > 32) { sb.append('&'); i += 1 }
        else {
          val body = s.substring(i + 1, semi)
          val repl: Option[String] =
            if (body.startsWith("#x") || body.startsWith("#X")) {
              try {
                val cp = Integer.parseInt(body.substring(2), 16)
                if (Character.isValidCodePoint(cp) && cp > 0) Some(new String(Character.toChars(cp))) else None
              } catch { case _: Exception => None }
            } else if (body.startsWith("#")) {
              try {
                val cp = Integer.parseInt(body.substring(1), 10)
                if (Character.isValidCodePoint(cp) && cp > 0) Some(new String(Character.toChars(cp))) else None
              } catch { case _: Exception => None }
            } else named.get(body)
          repl match {
            case Some(r) => sb.append(r); i = semi + 1
            case None    => sb.append('&'); i += 1
          }
        }
      }
    }
    sb.toString
  }
}
