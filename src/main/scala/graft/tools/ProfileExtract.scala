package graft.tools

/** Single-thread extraction kernel profile: stage breakdown over synth pages. */
object ProfileExtract {
  def main(args: Array[String]): Unit = {
    val n = 20000
    val pages = (0L until n.toLong).map(i => graft.synth.Synth.page(42L, i)).toArray
    System.err.println(s"generated $n pages")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      System.err.println(f"$label%-22s ${dt}%7.2f s  ${n / dt}%9.0f docs/s")
      r
    }

    // warm JIT
    pages.take(3000).foreach(p => graft.extract.Extractor.extract(p.url, p.html))
    pages.take(3000).foreach(p => graft.extract.Extractor.extract(p.url, p.html))

    for (_ <- 1 to 3) {
      time("extract end-to-end") {
        var i = 0
        var acc = 0L
        while (i < n) { acc += graft.extract.Extractor.extract(pages(i).url, pages(i).html).markdown.length; i += 1 }
        acc
      }
    }

    // stage breakdown on the HTML slice
    val htmlDocs = pages.filter(p => !graft.pdf.PdfParser.isPdf(p.html))
      .map(p => new String(p.html, java.nio.charset.StandardCharsets.UTF_8))
    val hn = htmlDocs.length
    System.err.println(s"html slice: $hn docs")
    for (_ <- 1 to 3) {
      val t0 = System.nanoTime()
      val toks = htmlDocs.map(graft.html.Tokenizer.tokenize)
      val t1 = System.nanoTime()
      val doms = toks.map(graft.html.TreeBuilder.build)
      val t2 = System.nanoTime()
      val ex = htmlDocs.map(graft.extract.HtmlExtractor.extract)
      val t3 = System.nanoTime()
      System.err.println(f"tokenize ${(t1 - t0) / 1e9}%6.2f s (${hn / ((t1 - t0) / 1e9)}%9.0f/s)  " +
        f"dom ${(t2 - t1) / 1e9}%6.2f s (${hn / ((t2 - t1) / 1e9)}%9.0f/s)  " +
        f"full-extract ${(t3 - t2) / 1e9}%6.2f s (${hn / ((t3 - t2) / 1e9)}%9.0f/s)  " +
        f"tokens=${toks.map(_.size).sum}%d doms=${doms.length}%d ok=${ex.count(_.status == "ok")}%d")
    }
  }
}
