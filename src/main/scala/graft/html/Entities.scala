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

  /** Full HTML4 named-entity table (+ `apos`), values matching CPython's
    * public `html.entities.entitydefs` — the table BeautifulSoup decodes
    * through in the reference (eval.py:34). */
  val named: Map[String, String] = Map(
    "AElig" -> "Æ", "Aacute" -> "Á", "Acirc" -> "Â", "Agrave" -> "À",
    "Alpha" -> "Α", "Aring" -> "Å", "Atilde" -> "Ã", "Auml" -> "Ä",
    "Beta" -> "Β", "Ccedil" -> "Ç", "Chi" -> "Χ", "Dagger" -> "‡",
    "Delta" -> "Δ", "ETH" -> "Ð", "Eacute" -> "É", "Ecirc" -> "Ê",
    "Egrave" -> "È", "Epsilon" -> "Ε", "Eta" -> "Η", "Euml" -> "Ë",
    "Gamma" -> "Γ", "Iacute" -> "Í", "Icirc" -> "Î", "Igrave" -> "Ì",
    "Iota" -> "Ι", "Iuml" -> "Ï", "Kappa" -> "Κ", "Lambda" -> "Λ",
    "Mu" -> "Μ", "Ntilde" -> "Ñ", "Nu" -> "Ν", "OElig" -> "Œ",
    "Oacute" -> "Ó", "Ocirc" -> "Ô", "Ograve" -> "Ò", "Omega" -> "Ω",
    "Omicron" -> "Ο", "Oslash" -> "Ø", "Otilde" -> "Õ", "Ouml" -> "Ö",
    "Phi" -> "Φ", "Pi" -> "Π", "Prime" -> "″", "Psi" -> "Ψ",
    "Rho" -> "Ρ", "Scaron" -> "Š", "Sigma" -> "Σ", "THORN" -> "Þ",
    "Tau" -> "Τ", "Theta" -> "Θ", "Uacute" -> "Ú", "Ucirc" -> "Û",
    "Ugrave" -> "Ù", "Upsilon" -> "Υ", "Uuml" -> "Ü", "Xi" -> "Ξ",
    "Yacute" -> "Ý", "Yuml" -> "Ÿ", "Zeta" -> "Ζ", "aacute" -> "á",
    "acirc" -> "â", "acute" -> "´", "aelig" -> "æ", "agrave" -> "à",
    "alefsym" -> "ℵ", "alpha" -> "α", "amp" -> "&", "and" -> "∧",
    "ang" -> "∠", "apos" -> "'", "aring" -> "å", "asymp" -> "≈",
    "atilde" -> "ã", "auml" -> "ä", "bdquo" -> "„", "beta" -> "β",
    "brvbar" -> "¦", "bull" -> "•", "cap" -> "∩", "ccedil" -> "ç",
    "cedil" -> "¸", "cent" -> "¢", "chi" -> "χ", "circ" -> "ˆ",
    "clubs" -> "♣", "cong" -> "≅", "copy" -> "©", "crarr" -> "↵",
    "cup" -> "∪", "curren" -> "¤", "dArr" -> "⇓", "dagger" -> "†",
    "darr" -> "↓", "deg" -> "°", "delta" -> "δ", "diams" -> "♦",
    "divide" -> "÷", "eacute" -> "é", "ecirc" -> "ê", "egrave" -> "è",
    "empty" -> "∅", "emsp" -> "\u2003", "ensp" -> "\u2002", "epsilon" -> "ε",
    "equiv" -> "≡", "eta" -> "η", "eth" -> "ð", "euml" -> "ë",
    "euro" -> "€", "exist" -> "∃", "fnof" -> "ƒ", "forall" -> "∀",
    "frac12" -> "½", "frac14" -> "¼", "frac34" -> "¾", "frasl" -> "⁄",
    "gamma" -> "γ", "ge" -> "≥", "gt" -> ">", "hArr" -> "⇔",
    "harr" -> "↔", "hearts" -> "♥", "hellip" -> "…", "iacute" -> "í",
    "icirc" -> "î", "iexcl" -> "¡", "igrave" -> "ì", "image" -> "ℑ",
    "infin" -> "∞", "int" -> "∫", "iota" -> "ι", "iquest" -> "¿",
    "isin" -> "∈", "iuml" -> "ï", "kappa" -> "κ", "lArr" -> "⇐",
    "lambda" -> "λ", "lang" -> "〈", "laquo" -> "«", "larr" -> "←",
    "lceil" -> "⌈", "ldquo" -> "“", "le" -> "≤", "lfloor" -> "⌊",
    "lowast" -> "∗", "loz" -> "◊", "lrm" -> "\u200E", "lsaquo" -> "‹",
    "lsquo" -> "‘", "lt" -> "<", "macr" -> "¯", "mdash" -> "—",
    "micro" -> "µ", "middot" -> "·", "minus" -> "−", "mu" -> "μ",
    "nabla" -> "∇", "nbsp" -> "\u00A0", "ndash" -> "–", "ne" -> "≠",
    "ni" -> "∋", "not" -> "¬", "notin" -> "∉", "nsub" -> "⊄",
    "ntilde" -> "ñ", "nu" -> "ν", "oacute" -> "ó", "ocirc" -> "ô",
    "oelig" -> "œ", "ograve" -> "ò", "oline" -> "‾", "omega" -> "ω",
    "omicron" -> "ο", "oplus" -> "⊕", "or" -> "∨", "ordf" -> "ª",
    "ordm" -> "º", "oslash" -> "ø", "otilde" -> "õ", "otimes" -> "⊗",
    "ouml" -> "ö", "para" -> "¶", "part" -> "∂", "permil" -> "‰",
    "perp" -> "⊥", "phi" -> "φ", "pi" -> "π", "piv" -> "ϖ",
    "plusmn" -> "±", "pound" -> "£", "prime" -> "′", "prod" -> "∏",
    "prop" -> "∝", "psi" -> "ψ", "quot" -> "\"", "rArr" -> "⇒",
    "radic" -> "√", "rang" -> "〉", "raquo" -> "»", "rarr" -> "→",
    "rceil" -> "⌉", "rdquo" -> "”", "real" -> "ℜ", "reg" -> "®",
    "rfloor" -> "⌋", "rho" -> "ρ", "rlm" -> "\u200F", "rsaquo" -> "›",
    "rsquo" -> "’", "sbquo" -> "‚", "scaron" -> "š", "sdot" -> "⋅",
    "sect" -> "§", "shy" -> "\u00AD", "sigma" -> "σ", "sigmaf" -> "ς",
    "sim" -> "∼", "spades" -> "♠", "sub" -> "⊂", "sube" -> "⊆",
    "sum" -> "∑", "sup" -> "⊃", "sup1" -> "¹", "sup2" -> "²",
    "sup3" -> "³", "supe" -> "⊇", "szlig" -> "ß", "tau" -> "τ",
    "there4" -> "∴", "theta" -> "θ", "thetasym" -> "ϑ", "thinsp" -> "\u2009",
    "thorn" -> "þ", "tilde" -> "˜", "times" -> "×", "trade" -> "™",
    "uArr" -> "⇑", "uacute" -> "ú", "uarr" -> "↑", "ucirc" -> "û",
    "ugrave" -> "ù", "uml" -> "¨", "upsih" -> "ϒ", "upsilon" -> "υ",
    "uuml" -> "ü", "weierp" -> "℘", "xi" -> "ξ", "yacute" -> "ý",
    "yen" -> "¥", "yuml" -> "ÿ", "zeta" -> "ζ", "zwj" -> "\u200D",
    "zwnj" -> "\u200C",
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
      if (c != '&') {
        // bulk-copy the run to the next '&' — entity-bearing text is
        // still mostly plain characters
        val amp = s.indexOf('&', i)
        val end = if (amp < 0) n else amp
        sb.underlying.append(s, i, end)
        i = end
      }
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
