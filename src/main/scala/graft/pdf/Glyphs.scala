package graft.pdf

/** Adobe Glyph List subset: glyph name ↔ char, for /Encoding /Differences
  * arrays (simple fonts remap byte codes to named glyphs; cf. PDF 1.7 §9.6.6
  * and the public Adobe Glyph List). Covers ASCII, the full Latin-1
  * supplement, the WinAnsi (CP1252) extras, and the synthetic uniXXXX /
  * uXXXX[XX] forms. Unknown names resolve to None (renderered as U+FFFD by
  * the parser so malformed PDFs still never throw).
  */
object Glyphs {

  private val ascii: Map[String, Char] = Map(
    "space" -> ' ', "exclam" -> '!', "quotedbl" -> '"', "numbersign" -> '#',
    "dollar" -> '$', "percent" -> '%', "ampersand" -> '&', "quotesingle" -> '\'',
    "parenleft" -> '(', "parenright" -> ')', "asterisk" -> '*', "plus" -> '+',
    "comma" -> ',', "hyphen" -> '-', "period" -> '.', "slash" -> '/',
    "zero" -> '0', "one" -> '1', "two" -> '2', "three" -> '3', "four" -> '4',
    "five" -> '5', "six" -> '6', "seven" -> '7', "eight" -> '8', "nine" -> '9',
    "colon" -> ':', "semicolon" -> ';', "less" -> '<', "equal" -> '=',
    "greater" -> '>', "question" -> '?', "at" -> '@',
    "bracketleft" -> '[', "backslash" -> '\\', "bracketright" -> ']',
    "asciicircum" -> '^', "underscore" -> '_', "grave" -> '`',
    "braceleft" -> '{', "bar" -> '|', "braceright" -> '}', "asciitilde" -> '~'
  ) ++ (('A' to 'Z') ++ ('a' to 'z')).map(c => c.toString -> c).toMap

  private val latin1: Map[String, Char] = Map(
    "exclamdown" -> '¡', "cent" -> '¢', "sterling" -> '£', "currency" -> '¤',
    "yen" -> '¥', "brokenbar" -> '¦', "section" -> '§', "dieresis" -> '¨',
    "copyright" -> '©', "ordfeminine" -> 'ª', "guillemotleft" -> '«',
    "logicalnot" -> '¬', "registered" -> '®', "macron" -> '¯',
    "degree" -> '°', "plusminus" -> '±', "twosuperior" -> '²',
    "threesuperior" -> '³', "acute" -> '´', "mu" -> 'µ', "paragraph" -> '¶',
    "periodcentered" -> '·', "cedilla" -> '¸', "onesuperior" -> '¹',
    "ordmasculine" -> 'º', "guillemotright" -> '»', "onequarter" -> '¼',
    "onehalf" -> '½', "threequarters" -> '¾', "questiondown" -> '¿',
    "Agrave" -> 'À', "Aacute" -> 'Á', "Acircumflex" -> 'Â', "Atilde" -> 'Ã',
    "Adieresis" -> 'Ä', "Aring" -> 'Å', "AE" -> 'Æ', "Ccedilla" -> 'Ç',
    "Egrave" -> 'È', "Eacute" -> 'É', "Ecircumflex" -> 'Ê', "Edieresis" -> 'Ë',
    "Igrave" -> 'Ì', "Iacute" -> 'Í', "Icircumflex" -> 'Î', "Idieresis" -> 'Ï',
    "Eth" -> 'Ð', "Ntilde" -> 'Ñ', "Ograve" -> 'Ò', "Oacute" -> 'Ó',
    "Ocircumflex" -> 'Ô', "Otilde" -> 'Õ', "Odieresis" -> 'Ö',
    "multiply" -> '×', "Oslash" -> 'Ø', "Ugrave" -> 'Ù', "Uacute" -> 'Ú',
    "Ucircumflex" -> 'Û', "Udieresis" -> 'Ü', "Yacute" -> 'Ý', "Thorn" -> 'Þ',
    "germandbls" -> 'ß', "agrave" -> 'à', "aacute" -> 'á',
    "acircumflex" -> 'â', "atilde" -> 'ã', "adieresis" -> 'ä', "aring" -> 'å',
    "ae" -> 'æ', "ccedilla" -> 'ç', "egrave" -> 'è', "eacute" -> 'é',
    "ecircumflex" -> 'ê', "edieresis" -> 'ë', "igrave" -> 'ì', "iacute" -> 'í',
    "icircumflex" -> 'î', "idieresis" -> 'ï', "eth" -> 'ð', "ntilde" -> 'ñ',
    "ograve" -> 'ò', "oacute" -> 'ó', "ocircumflex" -> 'ô', "otilde" -> 'õ',
    "odieresis" -> 'ö', "divide" -> '÷', "oslash" -> 'ø', "ugrave" -> 'ù',
    "uacute" -> 'ú', "ucircumflex" -> 'û', "udieresis" -> 'ü', "yacute" -> 'ý',
    "thorn" -> 'þ', "ydieresis" -> 'ÿ',
    // "nbspace"/"nonbreakingspace" and soft hyphen round out Latin-1
    "nbspace" -> ' ', "softhyphen" -> '­')

  private val winAnsiExtras: Map[String, Char] = Map(
    "Euro" -> '€', "quotesinglbase" -> '‚', "florin" -> 'ƒ',
    "quotedblbase" -> '„', "ellipsis" -> '…', "dagger" -> '†',
    "daggerdbl" -> '‡', "circumflex" -> 'ˆ', "perthousand" -> '‰',
    "Scaron" -> 'Š', "guilsinglleft" -> '‹', "OE" -> 'Œ', "Zcaron" -> 'Ž',
    "quoteleft" -> '‘', "quoteright" -> '’', "quotedblleft" -> '“',
    "quotedblright" -> '”', "bullet" -> '•', "endash" -> '–', "emdash" -> '—',
    "tilde" -> '˜', "trademark" -> '™', "scaron" -> 'š',
    "guilsinglright" -> '›', "oe" -> 'œ', "zcaron" -> 'ž', "Ydieresis" -> 'Ÿ')

  val byName: Map[String, Char] = ascii ++ latin1 ++ winAnsiExtras

  /** char → canonical glyph name, for the writer's /Differences emitter.
    * Latin-1/WinAnsi names win over synthetic uniXXXX. */
  val byChar: Map[Char, String] = byName.toSeq.map(_.swap).toMap

  /** Resolve a glyph name to a char: table first, then uniXXXX / uXXXX. */
  def char(name: String): Option[Char] = {
    byName.get(name).orElse {
      if (name.length == 7 && name.startsWith("uni"))
        parseHex(name.substring(3))
      else if ((name.length >= 5 && name.length <= 7) && name.startsWith("u"))
        parseHex(name.substring(1))
      else None
    }
  }

  /** Canonical name for a char, synthesizing uniXXXX when unnamed. */
  def name(c: Char): String =
    byChar.getOrElse(c, f"uni${c.toInt}%04X")

  private def parseHex(h: String): Option[Char] =
    try {
      val v = Integer.parseInt(h, 16)
      if (v >= 0 && v <= 0xffff) Some(v.toChar) else None
    } catch { case _: NumberFormatException => None }
}
