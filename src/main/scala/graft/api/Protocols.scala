package graft.api

import org.json4s._
import org.json4s.jackson.JsonMethods

/** Boundary codecs — the analog of the reference's protocol system
  * (mrjob/protocol.py; slot selection mrjob/job.py:1052-1076).
  *
  * Inside the engine there are NO line protocols: Tungsten/Encoders
  * replace the per-hop JSON encode/decode that the reference concedes
  * is its hot spot (mrjob/protocol.py:28-30). Protocols exist only at
  * the edges — reading line-oriented input and writing mrjob-style
  * `json(key)\tjson(value)` output — mirroring the harness's own
  * `--skip-internal-protocol` optimization
  * (mrjob/spark/harness.py:118-124, 679-685).
  *
  * | reference protocol (mrjob/protocol.py)        | here |
  * |---|---|
  * | JSONProtocol (:265)       | [[JsonPairProtocol]] (byte-compatible) |
  * | JSONValueProtocol (:272)  | [[JsonValueProtocol]] |
  * | TextProtocol (:393)       | [[TextPairProtocol]] |
  * | RawValueProtocol (:454)   | [[RawValueProtocol]] |
  * | BytesProtocol (:349)      | [[BytesPairProtocol]] |
  * | BytesValueProtocol (:369) | [[BytesValueProtocol]] |
  * | ReprProtocol (:465)       | [[ReprPairProtocol]] |
  * | PickleProtocol (:284)     | [[JavaSerProtocol]] (JVM-native codec) |
  */
trait LineProtocol[K, V] extends Serializable {
  def read(line: String): (K, V)
  def write(k: K, v: V): String
}

/** Render a JValue with the exact byte layout of Python's stdlib
  * `json.dumps` (default args — the reference's StandardJSONProtocol,
  * mrjob/protocol.py:116-138): `", "` / `": "` separators,
  * `ensure_ascii` escaping of non-ASCII to \\uXXXX, and Python float
  * repr (lower-case `e`, two-digit signed exponent). A reference user
  * switching engines gets byte-identical output part files
  * (ints/strings/bools/null are exact; a few pathological doubles may
  * differ where Java's and Python's shortest-repr algorithms
  * disagree). */
object PyJson {
  def dumps(v: JValue): String = v match {
    case JNull | JNothing => "null"
    case JBool(b) => if (b) "true" else "false"
    case JInt(i) => i.toString
    case JLong(l) => l.toString
    case JDecimal(d) => d.toString
    case JDouble(d) => pyFloat(d)
    case JString(s) => quote(s)
    case JArray(xs) => xs.map(dumps).mkString("[", ", ", "]")
    case JSet(xs) => xs.map(dumps).mkString("[", ", ", "]")
    case JObject(fields) =>
      fields.map { case (k, fv) => quote(k) + ": " + dumps(fv) }
        .mkString("{", ", ", "}")
  }

  /** Python `repr(float)` formatting. Java's Double.toString supplies
    * the shortest round-trip DIGITS (same as CPython), but the two
    * switch to scientific notation at different magnitudes: Java
    * outside [1e-3, 1e7), Python outside [1e-4, 1e16). So the digits
    * are re-rendered under PYTHON's rule — positional when the leading
    * digit's decimal exponent is in [-4, 16), scientific otherwise —
    * or json.dumps(1e8) = '100000000.0' would come out '1e+08'
    * (round-2 ADVICE: [1e7, 1e16) covers everyday counts and
    * micro-timestamps, not pathological values). */
  private[api] def pyFloat(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d.isInfinite) return if (d > 0) "Infinity" else "-Infinity"
    if (d == 0.0) return if (1 / d < 0) "-0.0" else "0.0"
    val bd = new java.math.BigDecimal(java.lang.Double.toString(d))
      .stripTrailingZeros
    val exp = bd.precision - bd.scale - 1 // decimal exponent of lead digit
    if (exp >= 16 || exp < -4) {
      val unscaled = bd.unscaledValue.toString
      val neg = unscaled.startsWith("-")
      val digs = if (neg) unscaled.substring(1) else unscaled
      val mant =
        if (digs.length == 1) digs else digs.head + "." + digs.tail
      val sign = if (exp < 0) "-" else "+"
      (if (neg) "-" else "") + mant + "e" + sign + f"${math.abs(exp)}%02d"
    } else {
      val s = bd.toPlainString
      if (s.contains('.')) s else s + ".0"
    }
  }

  private[graft] def quote(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case '\b' => b.append("\\b")
      case '\f' => b.append("\\f")
      case c if c < ' ' || c > '~' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }
}

/** The ONE json parse entry for every JSON protocol: its initializer
  * configures jackson to accept the NaN/Infinity tokens PyJson.dumps
  * emits (CPython json.dumps allow_nan default) — jackson REJECTS
  * them otherwise, so read(write(NaN)) would crash mid-chain. Living
  * on the shared parse path (not in one protocol's initializer, a
  * review catch: JsonValueProtocol.read crashed on its own write's
  * output unless the UNRELATED JsonPairProtocol object happened to
  * be class-loaded first) guarantees the configure runs before any
  * protocol parses. */
private[api] object PyJsonParse {
  JsonMethods.mapper.configure(
    com.fasterxml.jackson.core.JsonParser.Feature.ALLOW_NON_NUMERIC_NUMBERS,
    true)
  def parse(s: String): JValue = JsonMethods.parse(s)
}

/** Dynamic JSON values (the mrjob default internal/output encoding).
  * Keys/values are json4s JValues — the Scala stand-in for "arbitrary
  * JSON-encodable Python value" (mrjob/job.py:274-275). Output bytes
  * match the reference's stdlib-JSON lines exactly (see [[PyJson]];
  * golden-bytes gate in ParityGoldenSpec). */
object JsonPairProtocol extends LineProtocol[JValue, JValue] {
  def read(line: String): (JValue, JValue) = {
    val i = line.indexOf('\t')
    require(i >= 0, s"no tab in JSON pair line: $line")
    (PyJsonParse.parse(line.substring(0, i)),
      PyJsonParse.parse(line.substring(i + 1)))
  }
  def write(k: JValue, v: JValue): String =
    PyJson.dumps(k) + "\t" + PyJson.dumps(v)
}

/** Value-only JSON lines; key reads as JNull
  * (JSONValueProtocol, mrjob/protocol.py:272-281). */
object JsonValueProtocol extends LineProtocol[JValue, JValue] {
  def read(line: String): (JValue, JValue) =
    (JNull, PyJsonParse.parse(line))
  def write(k: JValue, v: JValue): String = PyJson.dumps(v)
}

/** Tab-separated UTF-8 text pairs (TextProtocol,
  * mrjob/protocol.py:393-451). Splits on the FIRST tab, like
  * protocol.py:91. */
object TextPairProtocol extends LineProtocol[String, String] {
  def read(line: String): (String, String) = {
    val i = line.indexOf('\t')
    if (i < 0) (line, "") else (line.substring(0, i), line.substring(i + 1))
  }
  def write(k: String, v: String): String = s"$k\t$v"
}

/** Whole line as value, key = null (RawValueProtocol,
  * mrjob/job.py:1270 — the default first-step input). */
object RawValueProtocol extends LineProtocol[String, String] {
  def read(line: String): (String, String) = (null, line)
  def write(k: String, v: String): String = v
}

/** Byte-line codec — the reference's bytes-level protocols operate on
  * raw line bytes, not decoded strings (BytesProtocol,
  * mrjob/protocol.py:349-390). Wire these up with binary record IO
  * (e.g. hadoopFile + TextInputFormat, whose Text payload is bytes);
  * the string [[LineProtocol]]s cover the UTF-8 world. */
trait ByteLineProtocol[K, V] extends Serializable {
  def read(line: Array[Byte]): (K, V)
  def write(k: K, v: V): Array[Byte]
}

/** (key, value) bytestrings joined by a tab; a tabless line reads as
  * (line, null); null sides are simply omitted on write
  * (BytesProtocol, mrjob/protocol.py:349-367). */
object BytesPairProtocol extends ByteLineProtocol[Array[Byte], Array[Byte]] {
  def read(line: Array[Byte]): (Array[Byte], Array[Byte]) = {
    val i = line.indexOf('\t'.toByte)
    if (i < 0) (line, null)
    else (line.slice(0, i), line.slice(i + 1, line.length))
  }
  def write(k: Array[Byte], v: Array[Byte]): Array[Byte] =
    Seq(k, v).filter(_ != null) match {
      case Seq(one) => one
      case Seq(a, b) =>
        val out = new Array[Byte](a.length + 1 + b.length)
        System.arraycopy(a, 0, out, 0, a.length)
        out(a.length) = '\t'.toByte
        System.arraycopy(b, 0, out, a.length + 1, b.length)
        out
      case _ => Array.emptyByteArray
    }
}

/** Whole line bytes as value, key = null (BytesValueProtocol,
  * mrjob/protocol.py:369-390 — the Python-2-era default input). */
object BytesValueProtocol extends ByteLineProtocol[Array[Byte], Array[Byte]] {
  def read(line: Array[Byte]): (Array[Byte], Array[Byte]) = (null, line)
  def write(k: Array[Byte], v: Array[Byte]): Array[Byte] = v
}

/** Python-literal pairs — the ReprProtocol analog
  * (mrjob/protocol.py:465-502): values rendered as Python literals
  * (`'str'`, `42`, `1.5`, `True`, `None`, `[...]`, `{'k': v}`) and
  * parsed back with a safeeval-style literal parser. Basic
  * JSON-able types only, like the reference ("only works for basic
  * types"). */
object ReprPairProtocol extends LineProtocol[JValue, JValue] {
  def read(line: String): (JValue, JValue) = {
    val i = line.indexOf('\t')
    require(i >= 0, s"no tab in repr pair line: $line")
    (PyLiteral.parse(line.substring(0, i)),
      PyLiteral.parse(line.substring(i + 1)))
  }
  def write(k: JValue, v: JValue): String =
    PyLiteral.render(k) + "\t" + PyLiteral.render(v)
}

/** Value-only repr lines (ReprValueProtocol, mrjob/protocol.py:490+). */
object ReprValueProtocol extends LineProtocol[JValue, JValue] {
  def read(line: String): (JValue, JValue) = (JNull, PyLiteral.parse(line))
  def write(k: JValue, v: JValue): String = PyLiteral.render(v)
}

/** Python literal rendering + safeeval-style parsing for the repr
  * protocols. Rendering follows Python repr conventions: single-quoted
  * strings (double-quoted when the string contains `'` but no `"`),
  * True/False/None, lists and dicts with `, ` / `: ` separators. */
object PyLiteral {
  def render(v: JValue): String = v match {
    case JNull | JNothing => "None"
    case JBool(b) => if (b) "True" else "False"
    case JInt(i) => i.toString
    case JLong(l) => l.toString
    case JDecimal(d) => d.toString
    // Python repr spells non-finite floats nan/inf/-inf (PyJson's
    // NaN/Infinity forms are the json.dumps spelling, not repr's)
    case JDouble(d) if d.isNaN => "nan"
    case JDouble(d) if d.isInfinite => if (d > 0) "inf" else "-inf"
    case JDouble(d) => PyJson.pyFloat(d)
    case JString(s) => quoteRepr(s)
    case JArray(xs) => xs.map(render).mkString("[", ", ", "]")
    case JSet(xs) => xs.map(render).mkString("{", ", ", "}")
    case JObject(fields) =>
      fields.map { case (k, fv) => renderKey(k) + ": " + render(fv) }
        .mkString("{", ", ", "}")
  }

  /** json4s JObject keys are Strings, so a parsed NON-string Python
    * dict key ({1: 'a'}, {True: 2}) is carried as its rendered form
    * behind a NUL-prefixed marker (no genuine Python str contains the
    * marker — repr would escape the NUL) and re-emitted RAW here:
    * without this, one repr hop rewrote {1: 'a'} as {'1': 'a'},
    * silently retyping the key (the reference's ReprProtocol
    * preserves int keys; its JSON protocols are the ones that
    * stringify). */
  private[api] val NonStrKeyMarker = "\u0000py\u0000"
  private def renderKey(k: String): String =
    if (k.startsWith(NonStrKeyMarker)) k.substring(NonStrKeyMarker.length)
    else quoteRepr(k)

  private def quoteRepr(s: String): String = {
    val q = if (s.contains('\'') && !s.contains('"')) '"' else '\''
    val b = new StringBuilder().append(q)
    s.foreach {
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c == q => b.append('\\').append(q)
      case c if c < ' ' => b.append(f"\\x${c.toInt}%02x")
      case c => b.append(c)
    }
    b.append(q).toString
  }

  /** Recursive-descent parser over the literal subset (safeeval analog,
    * mrjob/util.py safeeval — evaluates literals only, never code). */
  def parse(s: String): JValue = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    require(p.done, s"trailing input in literal: $s")
    v
  }

  private final class Parser(s: String) {
    private var i = 0
    def done: Boolean = i >= s.length
    def skipWs(): Unit = while (!done && s(i).isWhitespace) i += 1
    private def peek: Char = s(i)
    private def expect(c: Char): Unit = {
      require(!done && s(i) == c, s"expected '$c' at $i in: $s"); i += 1
    }

    def value(): JValue = {
      skipWs()
      require(!done, s"empty literal: $s")
      peek match {
        case '\'' | '"' => JString(string())
        case '[' => seq(']').pipe(JArray(_))
        case '(' => seq(')').pipe(JArray(_)) // tuples read as lists
        case '{' => dictOrSet()
        case _ => atom()
      }
    }

    private def seq(close: Char): List[JValue] = {
      i += 1 // open bracket
      val out = scala.collection.mutable.ListBuffer.empty[JValue]
      skipWs()
      while (!done && peek != close) {
        out += value()
        skipWs()
        if (!done && peek == ',') { i += 1; skipWs() }
      }
      expect(close)
      out.toList
    }

    private def dictOrSet(): JValue = {
      i += 1
      skipWs()
      if (!done && peek == '}') { i += 1; return JObject(Nil) }
      val first = value()
      skipWs()
      if (!done && peek == ':') {
        i += 1
        val fields = scala.collection.mutable.ListBuffer.empty[(String, JValue)]
        fields += key(first) -> value()
        skipWs()
        while (!done && peek == ',') {
          i += 1; skipWs()
          val k = value(); skipWs(); expect(':')
          fields += key(k) -> value()
          skipWs()
        }
        expect('}')
        JObject(fields.toList)
      } else {
        val items = scala.collection.mutable.ListBuffer[JValue](first)
        while (!done && peek == ',') { i += 1; skipWs(); items += value(); skipWs() }
        expect('}')
        JSet(items.toSet)
      }
    }

    private def key(v: JValue): String = v match {
      case JString(k) => k
      // non-string dict key: marker-wrapped rendered form, emitted
      // raw (unquoted) on the way back out — see renderKey
      case other => NonStrKeyMarker + render(other)
    }

    private def string(): String = {
      val q = peek; i += 1
      val b = new StringBuilder
      while (!done && peek != q) {
        if (peek == '\\') {
          i += 1
          require(!done, s"dangling escape in: $s")
          peek match {
            case 'n' => b.append('\n'); i += 1
            case 't' => b.append('\t'); i += 1
            case 'r' => b.append('\r'); i += 1
            case 'x' =>
              b.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
              i += 3
            case 'u' =>
              b.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 5
            case c => b.append(c); i += 1
          }
        } else { b.append(peek); i += 1 }
      }
      expect(q)
      b.toString
    }

    private def atom(): JValue = {
      val start = i
      while (!done && !",)]}: \t".contains(peek)) i += 1
      s.substring(start, i) match {
        case "None" => JNull
        case "True" => JBool(true)
        case "False" => JBool(false)
        // Python repr forms first, Java forms tolerated
        case "nan" | "NaN" => JDouble(Double.NaN)
        case "inf" | "Infinity" | "+inf" => JDouble(Double.PositiveInfinity)
        case "-inf" | "-Infinity" => JDouble(Double.NegativeInfinity)
        case num if num.matches("[+-]?\\d+") =>
          // arbitrary precision: render emits BigInt-backed JInt, so
          // toLong alone couldn't round-trip our own output
          if (num.length <= 18) JLong(num.toLong)
          else scala.util.Try(JLong(num.toLong))
            .getOrElse(JInt(BigInt(num)))
        case num => JDouble(num.toDouble)
      }
    }
  }

  private implicit class PipeOps[A](private val a: A) extends AnyVal {
    def pipe[B](f: A => B): B = f(a)
  }
}

/** PickleProtocol analog (mrjob/protocol.py:284-340): an opaque,
  * any-serializable-value pair codec with line-safe encoding. The
  * reference string-escapes pickles to dodge stray tab/newline bytes;
  * the JVM-native equivalent is Java serialization + Base64 (same
  * contract — arbitrary values, line-safe, only readable by the same
  * runtime family — with Base64 as the escape form). Like pickle,
  * only feed it output produced by your own jobs.
  *
  * Deserialization runs under an [[java.io.ObjectInputFilter]]
  * (JDK-core, scala stdlib, and `graft.*` classes; bounded depth and
  * stream size) — unpickling attacker-supplied bytes is an RCE vector
  * via gadget chains, exactly like Python pickle, so unknown classes
  * are REJECTED rather than instantiated. Widen via
  * `graft.javaser.filter` system property (ObjectInputFilter pattern
  * syntax) when jobs ship their own serializable classes. */
object JavaSerProtocol extends LineProtocol[AnyRef, AnyRef] {
  private def ser(a: AnyRef): String = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(a); oos.close()
    java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
  }
  private val deserFilter = java.io.ObjectInputFilter.Config.createFilter(
    sys.props.getOrElse("graft.javaser.filter",
      "java.lang.*;java.util.**;java.math.*;scala.**;graft.**;" +
        "maxdepth=32;maxbytes=16777216;!*"))
  private def deser(s: String): AnyRef = {
    val in = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(
      java.util.Base64.getDecoder.decode(s)))
    in.setObjectInputFilter(deserFilter)
    try in.readObject() finally in.close()
  }
  def read(line: String): (AnyRef, AnyRef) = {
    val i = line.indexOf('\t')
    require(i >= 0, s"no tab in serialized pair line")
    (deser(line.substring(0, i)), deser(line.substring(i + 1)))
  }
  def write(k: AnyRef, v: AnyRef): String = ser(k) + "\t" + ser(v)
}
