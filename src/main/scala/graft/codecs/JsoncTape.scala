package graft.codecs

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import scala.collection.mutable.ArrayBuffer

/** Tape representation of a JSON document: three parallel buffers.
  *
  * Re-expresses the capability of the reference's `jsonc` crate
  * (/root/reference/src/format/jsonc.rs — "a variant of tape
  * representation", README.md:9): per document, a node tape of opcodes,
  * a string buffer, and an f64 number buffer (jsonc.rs:21-40). The
  * opcode layout below is our own design — same information content,
  * not a byte-level copy of the crate.
  *
  * Semantics deliberately preserved from the reference (SURVEY §1.2):
  *  - ALL numbers are stored as f64 — ints lose int-ness (the number
  *    buffer is Float64, jsonc.rs:36,83).
  *  - `get` on a string returns the token WITH its JSON quotes
  *    (benches/query.rs:24,99 compare against `"`-wrapped expecteds).
  *  - key order and duplicate keys survive round trips (the tape is a
  *    faithful event stream, unlike a map-based repr).
  */
object JsoncTape {
  // Node-tape opcodes. KEY precedes each object member's value nodes.
  final val NULL: Byte = 0
  final val TRUE: Byte = 1
  final val FALSE: Byte = 2
  final val NUM: Byte = 3 // consumes one slot in `numbers`
  final val STR: Byte = 4 // consumes one slot in `strings`
  final val OBJ_START: Byte = 5
  final val OBJ_END: Byte = 6
  final val ARR_START: Byte = 7
  final val ARR_END: Byte = 8
  final val KEY: Byte = 9 // consumes one slot in `strings`

  /** One encoded document. `nodes` maps to parquet BinaryType — the
    * compact Spark-native equivalent of the reference's List<UInt8>. */
  case class Tape(nodes: Array[Byte], strings: Seq[String], numbers: Seq[Double])

  @transient private lazy val factory = new JsonFactory()

  /** JSON text → tape (reference encode, jsonc.rs:52-58). */
  def encode(json: String): Tape = {
    val nodes = new ArrayBuffer[Byte](64)
    val strings = new ArrayBuffer[String](8)
    val numbers = new ArrayBuffer[Double](8)
    val p = factory.createParser(json)
    try {
      var tok = p.nextToken()
      while (tok != null) {
        tok match {
          case JsonToken.START_OBJECT => nodes += OBJ_START
          case JsonToken.END_OBJECT   => nodes += OBJ_END
          case JsonToken.START_ARRAY  => nodes += ARR_START
          case JsonToken.END_ARRAY    => nodes += ARR_END
          case JsonToken.FIELD_NAME   => nodes += KEY; strings += p.getText
          case JsonToken.VALUE_STRING => nodes += STR; strings += p.getText
          case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT =>
            nodes += NUM; numbers += p.getDoubleValue // f64-only, by design
          case JsonToken.VALUE_TRUE  => nodes += TRUE
          case JsonToken.VALUE_FALSE => nodes += FALSE
          case JsonToken.VALUE_NULL  => nodes += NULL
          case other => throw new IllegalArgumentException(s"unexpected token $other")
        }
        tok = p.nextToken()
      }
    } finally p.close()
    Tape(nodes.toArray, strings.toSeq, numbers.toSeq)
  }

  /** Tape → JSON text (reference decode, jsonc.rs:60-62). */
  def decode(nodes: Array[Byte], strings: Seq[String], numbers: Seq[Double]): String = {
    val sb = new java.lang.StringBuilder(nodes.length * 4)
    var si = 0; var ni = 0
    // A comma separates sibling values; a fresh container/key resets it.
    var needComma = false
    var i = 0
    while (i < nodes.length) {
      val op = nodes(i)
      if (needComma && op != OBJ_END && op != ARR_END) sb.append(',')
      op match {
        case OBJ_START => sb.append('{'); needComma = false
        case ARR_START => sb.append('['); needComma = false
        case OBJ_END => sb.append('}'); needComma = true
        case ARR_END => sb.append(']'); needComma = true
        case KEY =>
          appendQuoted(sb, strings(si)); si += 1; sb.append(':'); needComma = false
        case STR  => appendQuoted(sb, strings(si)); si += 1; needComma = true
        case NUM  => sb.append(formatNumber(numbers(ni))); ni += 1; needComma = true
        case TRUE  => sb.append("true"); needComma = true
        case FALSE => sb.append("false"); needComma = true
        case NULL  => sb.append("null"); needComma = true
        case other => throw new IllegalStateException(s"bad opcode $other")
      }
      i += 1
    }
    sb.toString
  }

  /** Dot-path lookup on the tape (reference `get`, used at
    * benches/query.rs:23-28 and variant.rs:95-97). Returns the value's
    * JSON token — strings KEEP their quotes. Null if the path misses.
    */
  def get(nodes: Array[Byte], strings: Seq[String], numbers: Seq[Double],
          path: Seq[String]): String =
    getCore(nodes, strings(_), numbers(_), path)

  /** Accessor-based core so both the UDF form (Seq buffers) and the
    * native expression (ArrayData buffers, see JsoncExprs) share one
    * implementation without copying the buffers per row. */
  private[codecs] def getCore(nodes: Array[Byte], strAt: Int => String,
      numAt: Int => Double, path: Seq[String]): String = {
    // Cursor over (node index, string index, number index).
    var pos = 0; var si = 0; var ni = 0

    // Advance the cursor past the single value starting at `pos`.
    def skipValue(): Unit = nodes(pos) match {
      case STR => si += 1; pos += 1
      case NUM => ni += 1; pos += 1
      case NULL | TRUE | FALSE => pos += 1
      case OBJ_START | ARR_START =>
        var depth = 0
        var going = true
        while (going) {
          nodes(pos) match {
            case OBJ_START | ARR_START => depth += 1
            case OBJ_END | ARR_END => depth -= 1; if (depth == 0) going = false
            case STR | KEY => si += 1
            case NUM => ni += 1
            case _ => ()
          }
          pos += 1
        }
      case KEY => throw new IllegalStateException("skipValue at KEY")
    }

    // Descend one path segment. On OBJ_START the segment is a member
    // key; on ARR_START an all-digit segment indexes into the array
    // (the reference's tape get walks arbitrary nodes — canada.json's
    // deep coordinate arrays need this; round-1 verdict gap item 2).
    def descend(seg: String): Boolean = {
      if (pos >= nodes.length) return false
      nodes(pos) match {
        case OBJ_START =>
          pos += 1
          while (nodes(pos) != OBJ_END) {
            val k = strAt(si); si += 1; pos += 1 // consume KEY
            if (k == seg) return true
            skipValue()
          }
          false
        case ARR_START =>
          val idx = parseIndex(seg)
          if (idx < 0) return false
          pos += 1
          var cur = 0
          while (nodes(pos) != ARR_END) {
            if (cur == idx) return true
            skipValue()
            cur += 1
          }
          false
        case _ => false
      }
    }

    var i = 0
    while (i < path.length) {
      if (!descend(path(i))) return null
      i += 1
    }
    // Serialize the value at the cursor as its JSON token.
    nodes(pos) match {
      case STR  => val sb = new java.lang.StringBuilder(); appendQuoted(sb, strAt(si)); sb.toString
      case NUM  => formatNumber(numAt(ni))
      case NULL => "null"
      case TRUE => "true"
      case FALSE => "false"
      case OBJ_START | ARR_START =>
        val start = pos; val s0 = si; val n0 = ni
        skipValue()
        decode(nodes.slice(start, pos),
          Array.tabulate(si - s0)(j => strAt(s0 + j)).toSeq,
          Array.tabulate(ni - n0)(j => numAt(n0 + j)).toSeq)
      case other => throw new IllegalStateException(s"bad opcode $other")
    }
  }

  /** Non-negative int from an all-digit path segment, -1 otherwise. */
  private def parseIndex(seg: String): Int = {
    if (seg.isEmpty || seg.length > 9) return -1
    var v = 0
    var i = 0
    while (i < seg.length) {
      val c = seg.charAt(i)
      if (c < '0' || c > '9') return -1
      v = v * 10 + (c - '0')
      i += 1
    }
    v
  }

  /** f64 → JSON token. Whole numbers print without a fraction (matching
    * Rust's f64 Display used by the reference's decode: 87.0 → "87"). */
  def formatNumber(d: Double): String =
    if (d.isNaN || d.isInfinite) "null"
    else if (d == math.rint(d) && math.abs(d) < 1e15) d.toLong.toString
    else d.toString

  private def appendQuoted(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case _ if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
  }
}
