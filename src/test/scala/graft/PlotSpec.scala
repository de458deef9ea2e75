package graft

import graft.tools.Plot
import org.scalatest.funsuite.AnyFunSuite

/** SURVEY §2.1 #22 — the figure surface the reference produces with
  * scripts/plot.py. Pure-JVM checks: grid parsing, the CSV table view
  * (reference benchmark_results.csv column order), and the SVG's
  * structural invariants (one bar per codec per grid cell, legend for
  * every series, axis scale covering the data).
  */
class PlotSpec extends AnyFunSuite {

  private val codecs = Seq("jsonc", "plain_json", "shredded", "variant")

  /** 2 line-counts × 2 NDVs × 4 codecs, Bench's storage tuple shape. */
  private val storage: Seq[(String, Long, Seq[(String, Map[String, Double])])] =
    for {
      lines <- Seq(1024L, 100000L)
      ndv <- Seq(0.1, 1.0)
    } yield {
      val original = lines * 160
      val per = codecs.map { c =>
        val ratio = 0.1 + 0.2 * codecs.indexOf(c) + 0.3 * ndv
        c -> Map("bytes" -> original * ratio, "ratio" -> ratio)
      }
      (s"events_ndv${ndv}_$lines", original, per)
    }

  test("cells parses every (ndv, lines, codec) point of the grid") {
    val cs = Plot.cells(storage)
    assert(cs.size == 16)
    assert(cs.map(_.lines).distinct.sorted == Seq(1024L, 100000L))
    assert(cs.map(_.ndv).distinct.sorted == Seq(0.1, 1.0))
    assert(cs.map(_.codec).distinct.sorted == codecs)
    val one = cs.find(c => c.codec == "jsonc" && c.ndv == 0.1 && c.lines == 1024L).get
    assert(one.original == 1024L * 160)
    assert(math.abs(one.ratio - 0.13) < 1e-9)
    assert(math.abs(one.bytes - one.original * 0.13) < 1e-6)
  }

  test("cells rejects keys outside the bench grid format") {
    intercept[IllegalArgumentException] {
      Plot.cells(Seq(("not_a_grid_key", 1L, Seq("jsonc" -> Map("ratio" -> 1.0)))))
    }
  }

  test("storageCsv is the reference benchmark_results.csv surface") {
    val csv = Plot.storageCsv(Plot.cells(storage))
    val lines = csv.trim.split("\n").toSeq
    assert(lines.head ==
      "format,ndv,num_of_lines,parquet_file_size,compressed_rate,original")
    assert(lines.size == 17) // header + 16 cells
    val cols = lines(1).split(",")
    assert(cols.length == 6)
    assert(codecs.contains(cols(0)))
    assert(cols(3).forall(_.isDigit)) // parquet_file_size is integral bytes
  }

  test("storageSvg draws one bar per cell, a legend per series, grouped panels") {
    val svg = Plot.storageSvg(Plot.cells(storage))
    // 1 ratio panel (4 groups × 4 bars) + 2 size panels (2 groups × 4) = 32
    assert(svg.split("<path ").length - 1 == 32)
    // every bar carries a hover tooltip
    assert(svg.split("<title>").length - 1 == 32)
    for (c <- codecs) assert(svg.contains(s">$c</text>"), s"legend entry $c")
    // panel titles: ratio once, one size facet per line count
    assert(svg.contains("Compression ratio"))
    // line counts render compact (100000 → 100k) so 12 group labels
    // fit their ~73px slots without colliding
    assert(svg.contains("1024 lines") && svg.contains("100k lines"))
    assert(!svg.contains("100000 lines"))
    // fixed identity→hue assignment present for all four series
    for (hex <- Seq("#2a78d6", "#eb6834", "#1baf7a", "#eda100"))
      assert(svg.contains(hex), s"series color $hex")
    // well-formed XML (parses under the JDK's namespace-aware parser)
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(true)
    f.newDocumentBuilder().parse(
      new java.io.ByteArrayInputStream(svg.getBytes("UTF-8")))
  }

  test("niceScale covers the max with a 1/2/5 step and 3-6 gridlines") {
    for (v <- Seq(0.034, 0.7, 1.0, 7.3, 42.0, 1234.0, 9.9e6)) {
      val (max, step) = Plot.niceScale(v)
      assert(max >= v, s"axis max $max < data max $v")
      val ticks = math.round(max / step)
      assert(ticks >= 3 && ticks <= 6, s"$v -> $ticks gridlines")
      val mantissa = step / math.pow(10, math.floor(math.log10(step)))
      assert(Seq(1.0, 2.0, 5.0).exists(m => math.abs(mantissa - m) < 1e-9),
        s"step $step not 1/2/5-shaped")
    }
  }

  test("write lands storage.svg + storage.csv in the figures dir") {
    val dir = java.nio.file.Files.createTempDirectory("plotspec").toString
    Plot.write(storage, dir)
    assert(new java.io.File(dir, "storage.svg").length() > 0)
    assert(new java.io.File(dir, "storage.csv").length() > 0)
  }
}
