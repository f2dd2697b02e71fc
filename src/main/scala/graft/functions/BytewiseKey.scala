package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Order-preserving binary encoding of arbitrary (mixed-type) JSON keys —
 * the reference's data-model keystone: LevelDB keys are arbitrary JSON
 * with a TOTAL ORDER ACROSS TYPES, `null < false < true < numbers <
 * strings < arrays`, via bytewise encoding (`/root/reference/index.js:4,118`
 * — `keyEncoding: bytewise`; SURVEY §1.2).
 *
 * `bytewise_key(json)` maps a JSON scalar/array to a `binary` whose
 * unsigned lexicographic byte order equals that semantic cross-type
 * order. Spark compares `BinaryType` bytewise-unsigned and parquet keeps
 * unsigned min/max stats for binary columns, so a view clustered on the
 * encoded key gets the SAME pruned range scans (`>=`/`<` pushed to the
 * scan) a string- or long-keyed view gets — schema-free keys with no
 * loss of the seek analog.
 *
 * Encoding (one tag byte, then an order-preserving payload):
 *  - null  → `0x10`
 *  - false → `0x20`, true → `0x21`
 *  - number → `0x40` + IEEE-754 double, big-endian, sign-flipped
 *    (negative values: all bits flipped; non-negative: sign bit flipped)
 *    — the standard monotone double↔bytes bijection
 *  - string → `0x70` + UTF-8 bytes with `0x00→0x01 0x01`, `0x01→0x01 0x02`
 *    escaping + `0x00` terminator (the terminator sorts below any content
 *    byte, so a prefix sorts first; escaping keeps content unambiguous)
 *  - array → `0xA0` + each element's full encoding + `0x00` terminator
 *    (element tags are all > 0x00, so a prefix array sorts first;
 *    nesting recurses naturally)
 *
 * JSON objects are rejected loudly: an object is not an orderable key in
 * the reference model either (bytewise orders them after arrays, but no
 * reference test emits one and the map/filter semantics never compare
 * them).
 *
 * CodegenFallback is acceptable: encoding runs once per emission at view
 * BUILD time (write path), never in the per-query hot path — reads
 * compare the stored bytes.
 */
object BytewiseKey {

  private val TagNull = 0x10
  private val TagFalse = 0x20
  private val TagTrue = 0x21
  private val TagNumber = 0x40
  private val TagString = 0x70
  private val TagArray = 0xa0

  /** Encode one JSON value (scalar or array) to its order-preserving
    * bytes. Fails loudly on malformed JSON, objects, and trailing text —
    * a silently misencoded key would corrupt scan order. */
  def encode(json: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(json.length + 9)
    val end = encodeValue(json, skipWs(json, 0), out)
    require(skipWs(json, end) == json.length,
      s"trailing characters after key JSON value: '$json'")
    out.toByteArray
  }

  private def skipWs(s: String, p0: Int): Int = {
    var p = p0
    while (p < s.length && Character.isWhitespace(s.charAt(p))) p += 1
    p
  }

  private def expectWord(s: String, p: Int, w: String): Int = {
    require(s.regionMatches(p, w, 0, w.length),
      s"malformed key JSON at offset $p in '$s' (expected '$w')")
    p + w.length
  }

  /** Returns the offset just past the encoded value. */
  private def encodeValue(s: String, p: Int, out: java.io.ByteArrayOutputStream): Int = {
    require(p < s.length, s"unexpected end of key JSON: '$s'")
    s.charAt(p) match {
      case 'n' => out.write(TagNull); expectWord(s, p, "null")
      case 'f' => out.write(TagFalse); expectWord(s, p, "false")
      case 't' => out.write(TagTrue); expectWord(s, p, "true")
      case '"' => encodeString(s, p, out)
      case '[' => encodeArray(s, p, out)
      case c if c == '-' || (c >= '0' && c <= '9') => encodeNumber(s, p, out)
      case '{' => throw new IllegalArgumentException(
        s"JSON objects are not orderable keys: '$s'")
      case c => throw new IllegalArgumentException(
        s"malformed key JSON at '$c' (offset $p) in '$s'")
    }
  }

  private def encodeNumber(s: String, p0: Int, out: java.io.ByteArrayOutputStream): Int = {
    var p = p0
    while (p < s.length && ("+-.eE".indexOf(s.charAt(p)) >= 0 ||
        (s.charAt(p) >= '0' && s.charAt(p) <= '9'))) p += 1
    val d0 = try s.substring(p0, p).toDouble catch {
      case _: NumberFormatException => throw new IllegalArgumentException(
        s"malformed number '${s.substring(p0, p)}' in key JSON '$s'")
    }
    require(!d0.isNaN, s"NaN is not an orderable key: '$s'")
    // an overflowing literal (1e999) parses as Infinity — encoding it
    // would silently collapse every overflow onto one key; fail loudly
    require(!d0.isInfinite,
      s"number '${s.substring(p0, p)}' overflows double range in key '$s'")
    // normalize -0.0 to 0.0: doubleToLongBits gives them different bit
    // patterns (and the negative flip path would order -0.0 below 0.0),
    // but they are EQUAL numbers and must encode identically
    val d = if (d0 == 0.0) 0.0 else d0
    // monotone double→bytes: flip all bits for negatives, the sign bit
    // for non-negatives; unsigned byte order then equals numeric order
    val bits = java.lang.Double.doubleToLongBits(d)
    val flipped = if (bits < 0L) ~bits else bits ^ java.lang.Long.MIN_VALUE
    out.write(TagNumber)
    var i = 56
    while (i >= 0) { out.write(((flipped >>> i) & 0xffL).toInt); i -= 8 }
    p
  }

  private def encodeString(s: String, p0: Int, out: java.io.ByteArrayOutputStream): Int = {
    val sb = new java.lang.StringBuilder
    var p = p0 + 1 // past the opening quote
    var closed = false
    while (!closed) {
      require(p < s.length, s"unterminated string in key JSON: '$s'")
      s.charAt(p) match {
        case '"' => closed = true; p += 1
        case '\\' =>
          require(p + 1 < s.length, s"dangling escape in key JSON: '$s'")
          s.charAt(p + 1) match {
            case '"' => sb.append('"'); p += 2
            case '\\' => sb.append('\\'); p += 2
            case '/' => sb.append('/'); p += 2
            case 'n' => sb.append('\n'); p += 2
            case 't' => sb.append('\t'); p += 2
            case 'r' => sb.append('\r'); p += 2
            case 'b' => sb.append('\b'); p += 2
            case 'f' => sb.append('\f'); p += 2
            case 'u' =>
              require(p + 5 < s.length, s"truncated \\u escape in key JSON: '$s'")
              sb.append(Integer.parseInt(s.substring(p + 2, p + 6), 16).toChar)
              p += 6
            case c => throw new IllegalArgumentException(
              s"unsupported escape '\\$c' in key JSON '$s'")
          }
        case c => sb.append(c); p += 1
      }
    }
    out.write(TagString)
    val bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < bytes.length) {
      (bytes(i) & 0xff) match {
        case 0x00 => out.write(0x01); out.write(0x01)
        case 0x01 => out.write(0x01); out.write(0x02)
        case b => out.write(b)
      }
      i += 1
    }
    out.write(0x00)
    p
  }

  private def encodeArray(s: String, p0: Int, out: java.io.ByteArrayOutputStream): Int = {
    out.write(TagArray)
    var p = skipWs(s, p0 + 1)
    require(p < s.length, s"unterminated array in key JSON: '$s'")
    if (s.charAt(p) == ']') { out.write(0x00); return p + 1 }
    var done = false
    while (!done) {
      p = skipWs(s, encodeValue(s, skipWs(s, p), out))
      require(p < s.length, s"unterminated array in key JSON: '$s'")
      s.charAt(p) match {
        case ',' => p += 1
        case ']' => done = true; p += 1
        case c => throw new IllegalArgumentException(
          s"malformed array at '$c' (offset $p) in key JSON '$s'")
      }
    }
    out.write(0x00)
    p
  }

  /** bytewise_key(json_text): the Catalyst expression. */
  case class Encode(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    override def nullSafeEval(input: Any): Any =
      encode(input.asInstanceOf[UTF8String].toString)
    override protected def withNewChildInternal(newChild: Expression): Encode =
      copy(child = newChild)
    override def prettyName: String = "bytewise_key"
  }

  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "bytewise_key" -> (es => Encode(es.head)))

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (n, b) => reg.createOrReplaceTempFunction(n, b, "scala_udf") }
  }
}
