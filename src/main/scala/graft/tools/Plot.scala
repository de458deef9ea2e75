package graft.tools

/** SURVEY §2.1 #22 — plotting (reference: scripts/plot.py:12-59,
  * output figures/grouped_bar_charts.png over benchmark_results.csv).
  *
  * The reference renders two grouped bar charts — parquet file size and
  * compression ratio by format × (ndv / lines) — with matplotlib. This
  * is the same artifact surface, dependency-free: the bench's in-memory
  * storage grid renders to a static SVG plus the reference-shaped CSV
  * (format,ndv,num_of_lines,parquet_file_size,compressed_rate,original).
  *
  * Design deviates from the reference in one deliberate way: the
  * reference puts all 12 (ndv, lines) cells on ONE linear size axis, so
  * the 1024-line bars (~100× smaller than the 100k-line bars) render
  * invisibly. Here compression ratio — unit-free, comparable — gets the
  * single 12-group panel, and raw file size is faceted into small
  * multiples per line count, each with its own scale (never a dual
  * axis).
  *
  * Color is assigned per codec in a fixed order (identity, never rank):
  * the 4-slot categorical palette below passes CVD ΔE ≥ 8 and
  * normal-vision ΔE ≥ 15 on adjacent pairs over the light surface; the
  * two low-contrast slots (aqua/jsonc, yellow/shredded) carry the
  * required relief via the CSV table view written next to the figure.
  */
object Plot {

  /** Fixed codec → hue assignment. A codec absent from a run keeps the
    * others' colors stable; an unknown codec folds to the neutral slot.
    */
  private val seriesColor: Seq[(String, String)] = Seq(
    "plain_json" -> "#2a78d6", // blue
    "variant"    -> "#eb6834", // orange
    "jsonc"      -> "#1baf7a", // aqua
    "shredded"   -> "#eda100") // yellow
  private val otherColor = "#8d8c85"

  private val surface = "#fcfcfb"
  private val inkPrimary = "#0b0b0b"
  private val inkSecondary = "#52514e"
  private val gridStroke = "#e7e6e2"

  /** One storage-grid cell, parsed out of Bench's key format
    * `events_ndv<ndv>_<lines>`.
    */
  final case class Cell(ndv: Double, lines: Long, codec: String,
                        bytes: Double, ratio: Double, original: Long)

  private val KeyRe = """events_ndv([0-9.]+)_([0-9]+)""".r

  def cells(storage: Seq[(String, Long, Seq[(String, Map[String, Double])])]): Seq[Cell] =
    storage.flatMap {
      case (KeyRe(ndv, lines), original, perCodec) =>
        perCodec.map { case (codec, m) =>
          Cell(ndv.toDouble, lines.toLong, codec,
            m.getOrElse("bytes", 0.0), m.getOrElse("ratio", 0.0), original)
        }
      case (other, _, _) =>
        throw new IllegalArgumentException(s"unrecognized storage key: $other")
    }

  /** The reference's benchmark_results.csv surface (scripts/plot.py:6),
    * one row per format × grid cell — doubles as the figure's table
    * view.
    */
  def storageCsv(cs: Seq[Cell]): String = {
    val header = "format,ndv,num_of_lines,parquet_file_size,compressed_rate,original"
    val rows = cs.map(c =>
      s"${c.codec},${c.ndv},${c.lines},${c.bytes.toLong},${c.ratio},${c.original}")
    (header +: rows).mkString("", "\n", "\n")
  }

  // ---- SVG rendering ----------------------------------------------

  private val width = 960
  private val marginL = 68
  private val marginR = 16
  private val panelH = 170
  private val panelGap = 56
  private val topPad = 64 // chart title + legend row

  private def fmtBytes(v: Double): String =
    if (v >= 1e6) f"${v / 1e6}%.1f MB"
    else if (v >= 1e3) f"${v / 1e3}%.0f KB"
    else f"${v.toLong}%d B"

  private def fmtRatio(v: Double): String = f"$v%.2f"

  /** Round-up-to-nice axis max and its tick step: 1/2/5 × 10^k such
    * that 3-6 gridlines cover [0, max].
    */
  private[graft] def niceScale(maxV: Double): (Double, Double) = {
    require(maxV > 0, "axis max must be positive")
    val raw = maxV / 5.0
    val mag = math.pow(10, math.floor(math.log10(raw)))
    val step = (raw / mag) match {
      case r if r <= 1.0 => mag
      case r if r <= 2.0 => 2 * mag
      case r if r <= 5.0 => 5 * mag
      case _             => 10 * mag
    }
    (math.ceil(maxV / step) * step, step)
  }

  private def colorOf(codec: String): String =
    seriesColor.toMap.getOrElse(codec, otherColor)

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** One grouped-bar panel. `groups` is ordered (label, bars) with bars
    * ordered by the fixed series order. Bars get 4px-rounded top ends
    * anchored to the baseline, a 2px surface gap between neighbors, and
    * a native hover tooltip (`<title>`).
    */
  private def panel(sb: StringBuilder, y0: Int, title: String,
                    groups: Seq[(String, Seq[(String, Double)])],
                    fmt: Double => String): Unit = {
    val plotW = width - marginL - marginR
    val maxV = groups.flatMap(_._2.map(_._2)).foldLeft(0.0)(math.max)
    val (axisMax, step) = niceScale(if (maxV > 0) maxV else 1.0)
    def yPix(v: Double): Double = y0 + panelH - (v / axisMax) * panelH

    sb ++= s"""<text x="$marginL" y="${y0 - 10}" fill="$inkPrimary" font-size="13" font-weight="600">${esc(title)}</text>\n"""

    // recessive horizontal grid + left-of-axis tick labels
    var t = 0.0
    while (t <= axisMax + step * 1e-9) {
      val y = yPix(t)
      sb ++= f"""<line x1="$marginL%d" y1="$y%.1f" x2="${marginL + plotW}%d" y2="$y%.1f" stroke="$gridStroke%s" stroke-width="1"/>%n"""
      sb ++= f"""<text x="${marginL - 6}%d" y="${y + 4}%.1f" fill="$inkSecondary%s" font-size="10" text-anchor="end">${esc(fmt(t))}%s</text>%n"""
      t += step
    }

    val groupW = plotW.toDouble / groups.size
    val barGap = 2.0
    groups.zipWithIndex.foreach { case ((label, bars), gi) =>
      val gx = marginL + gi * groupW
      val usable = groupW * 0.72
      val barW = (usable - barGap * (bars.size - 1)) / bars.size
      val start = gx + (groupW - usable) / 2
      bars.zipWithIndex.foreach { case ((codec, v), bi) =>
        val x = start + bi * (barW + barGap)
        val y = yPix(v)
        val h = y0 + panelH - y
        val r = math.min(4.0, math.min(barW / 2, h)) // rounded data-end
        sb ++= f"""<path d="M $x%.2f ${y0 + panelH}%d L $x%.2f ${y + r}%.2f Q $x%.2f $y%.2f ${x + r}%.2f $y%.2f L ${x + barW - r}%.2f $y%.2f Q ${x + barW}%.2f $y%.2f ${x + barW}%.2f ${y + r}%.2f L ${x + barW}%.2f ${y0 + panelH}%d Z" fill="${colorOf(codec)}%s">"""
        sb ++= s"""<title>${esc(s"$codec · $label · ${fmt(v)}")}</title></path>\n"""
      }
      sb ++= f"""<text x="${gx + groupW / 2}%.1f" y="${y0 + panelH + 16}%d" fill="$inkSecondary%s" font-size="10" text-anchor="middle">${esc(label)}%s</text>%n"""
    }
    // baseline
    sb ++= s"""<line x1="$marginL" y1="${y0 + panelH}" x2="${marginL + plotW}" y2="${y0 + panelH}" stroke="$inkSecondary" stroke-width="1"/>\n"""
  }

  /** The full figure: a compression-ratio panel over all 12 grid cells,
    * then file-size small multiples per line count.
    */
  def storageSvg(cs: Seq[Cell]): String = {
    require(cs.nonEmpty, "no storage cells to plot")
    val codecs = seriesColor.map(_._1).filter(c => cs.exists(_.codec == c)) ++
      cs.map(_.codec).distinct.filterNot(seriesColor.toMap.contains).sorted
    val lineCounts = cs.map(_.lines).distinct.sorted

    def grouped(sel: Seq[Cell], value: Cell => Double,
                label: Cell => String): Seq[(String, Seq[(String, Double)])] = {
      val byKey = sel.groupBy(c => (c.ndv, c.lines))
      byKey.keys.toSeq.sortBy(k => (k._2, k._1)).map { k =>
        val cellsHere = byKey(k)
        val lab = label(cellsHere.head)
        lab -> codecs.flatMap(cd => cellsHere.find(_.codec == cd).map(c => cd -> value(c)))
      }
    }

    // compact group labels: 12 groups share ~73px each, so "0.1·100k"
    // (~45px at 10px type), never "ndv 0.1 / 100000" (~88px, collides)
    def kFmt(n: Long): String =
      if (n % 1000 == 0 && n >= 1000) s"${n / 1000}k" else n.toString

    val nPanels = 1 + lineCounts.size
    val height = topPad + nPanels * (panelH + panelGap)
    val sb = new StringBuilder
    sb ++= s"""<svg xmlns="http://www.w3.org/2000/svg" width="$width" height="$height" viewBox="0 0 $width $height" font-family="system-ui, sans-serif">\n"""
    sb ++= s"""<rect width="$width" height="$height" fill="$surface"/>\n"""
    sb ++= s"""<text x="$marginL" y="24" fill="$inkPrimary" font-size="15" font-weight="700">Parquet storage by JSON codec — size and compression ratio across NDV / line-count grid</text>\n"""

    // legend: swatch + codec name in ink (identity lives in the mark)
    var lx = marginL
    codecs.foreach { cd =>
      sb ++= s"""<rect x="$lx" y="36" width="12" height="12" rx="3" fill="${colorOf(cd)}"/>\n"""
      sb ++= s"""<text x="${lx + 17}" y="46" fill="$inkPrimary" font-size="11">${esc(cd)}</text>\n"""
      lx += 17 + cd.length * 7 + 24
    }

    var y0 = topPad + 24
    panel(sb, y0, "Compression ratio (parquet bytes / NDJSON bytes) by NDV · line count — lower is better",
      grouped(cs, _.ratio, c => s"${c.ndv}·${kFmt(c.lines)}"), fmtRatio)
    lineCounts.foreach { ln =>
      y0 += panelH + panelGap
      panel(sb, y0, s"Parquet file size — ${kFmt(ln)} lines, by NDV",
        grouped(cs.filter(_.lines == ln), _.bytes, c => s"ndv ${c.ndv}"), fmtBytes)
    }
    sb ++= "</svg>\n"
    sb.toString
  }

  /** Render both artifacts next to the bench detail JSON. */
  def write(storage: Seq[(String, Long, Seq[(String, Map[String, Double])])],
            dir: String): Unit = {
    val cs = cells(storage)
    val d = new java.io.File(dir)
    d.mkdirs()
    java.nio.file.Files.write(d.toPath.resolve("storage.svg"),
      storageSvg(cs).getBytes("UTF-8"))
    java.nio.file.Files.write(d.toPath.resolve("storage.csv"),
      storageCsv(cs).getBytes("UTF-8"))
  }
}
