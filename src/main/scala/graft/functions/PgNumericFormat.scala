package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PostgreSQL-style numeric TO_CHAR masks (reference to_char numeric
  * tier; suite query/functions/02_0078_function_to_char.test is the
  * postgres int8 regression set): digit slots 9/0, group separators
  * G/",", decimal D/".", sign marks S/SG/MI, angle-bracket PR, FM.
  * The reference trims the space padding PostgreSQL would emit, so
  * output here is the trimmed form.
  */
case class PgNumericFormat(child: Expression, mask: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val v = input match {
      case d: org.apache.spark.sql.types.Decimal => d.toJavaBigDecimal
      case d: java.math.BigDecimal => d
      case n: Number => new java.math.BigDecimal(n.toString)
      case s => new java.math.BigDecimal(s.toString)
    }
    UTF8String.fromString(PgNumericFormat.format(v, mask))
  }
  override protected def withNewChildInternal(newChild: Expression): PgNumericFormat =
    copy(child = newChild)
}

object PgNumericFormat {

  /** does the (literal) format look like a numeric mask? — at least
    * one digit slot and nothing but mask characters
    */
  def isNumericMask(fmt: String): Boolean = {
    val stripped = fmt.toUpperCase
      .replaceAll("\"(\\\\\"|[^\"])*\"", "") // quoted literal text
      .replace("FM", "").replace("SG", "").replace("PR", "")
      .replace("MI", "").replace("TH", "")
    stripped.exists(c => c == '9' || c == '0') &&
      stripped.forall(c => "90GDS,. ".contains(c))
  }

  private sealed trait Tok
  private case object D9 extends Tok
  private case object D0 extends Tok
  private case object Sep extends Tok
  private case object SignAlways extends Tok // S / SG
  private case object SignMinus extends Tok  // MI
  private case class Lit(s: String) extends Tok

  /** tokenize one side of the mask (no decimal marker inside) */
  private def toks(m: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < m.length) {
      val c = m.charAt(i)
      val up = m.substring(i).toUpperCase
      if (c == '"') {
        // quoted literal; backslash escapes the next char (PG \")
        val sbq = new StringBuilder
        var j = i + 1
        while (j < m.length && m.charAt(j) != '"') {
          if (m.charAt(j) == '\\' && j + 1 < m.length) {
            sbq.append(m.charAt(j + 1)); j += 2
          } else { sbq.append(m.charAt(j)); j += 1 }
        }
        out += Lit(sbq.toString)
        i = j + 1
      } else if (c == '\\' && i + 1 < m.length && m.charAt(i + 1) == '"') {
        // escaped quote outside a quoted run: literal "
        out += Lit("\""); i += 2
      } else if (up.startsWith("SG")) { out += SignAlways; i += 2 }
      else if (up.startsWith("MI")) { out += SignMinus; i += 2 }
      else if (up.startsWith("FM")) { i += 2 } // handled by caller
      else if (up.startsWith("PR")) { i += 2 } // handled by caller
      else if (up.startsWith("TH")) { i += 2 } // ordinal suffix: unsupported, drop
      else c match {
        case '9' => out += D9; i += 1
        case '0' => out += D0; i += 1
        case ',' | 'G' | 'g' => out += Sep; i += 1
        case 'S' | 's' => out += SignAlways; i += 1
        case other => out += Lit(other.toString); i += 1
      }
    }
    out.result()
  }

  def format(v0: java.math.BigDecimal, mask0: String): String = {
    val up0 = mask0.toUpperCase
    val fm = up0.contains("FM")
    val pr = up0.contains("PR")
    val decIdx0 = mask0.indexWhere(c => c == '.' || c == 'D' || c == 'd')
    val (intM, fracM) =
      if (decIdx0 < 0) (mask0, "")
      else (mask0.substring(0, decIdx0), mask0.substring(decIdx0 + 1))
    val intToks = toks(intM)
    val fracToks = toks(fracM)

    val fracDigits = fracToks.count(t => t == D9 || t == D0)
    val neg = v0.signum() < 0
    val v = v0.abs.setScale(fracDigits, java.math.RoundingMode.HALF_UP)
    val digits = v.toBigInteger.toString
    val fracStr =
      if (fracDigits == 0) ""
      else v.remainder(java.math.BigDecimal.ONE).movePointRight(fracDigits)
        .toBigInteger.toString.reverse.padTo(fracDigits, '0').reverse.toString

    // leftmost '0' slot forces zero fill from there rightward
    val forcedFrom = intToks.indexWhere(_ == D0)
    val signToken = intToks.exists(t => t == SignAlways || t == SignMinus)

    // integer side: fill right-to-left; each slot renders positionally
    val parts = new Array[String](intToks.length)
    var di = digits.length - 1
    var i = intToks.length - 1
    while (i >= 0) {
      parts(i) = intToks(i) match {
        case D9 =>
          if (di >= 0) { val d = digits.charAt(di).toString; di -= 1; d }
          else if (forcedFrom >= 0 && i >= forcedFrom) "0"
          else if (fm) "" else " "
        case D0 =>
          if (di >= 0) { val d = digits.charAt(di).toString; di -= 1; d }
          else "0"
        case Sep =>
          if (di >= 0 || (forcedFrom >= 0 && i > forcedFrom)) ","
          else if (fm) "" else " "
        case SignAlways => if (neg) "-" else "+"
        case SignMinus => if (neg) "-" else if (fm) "" else " "
        case Lit(s) => s
      }
      i -= 1
    }
    val overflow = if (di >= 0) digits.substring(0, di + 1) else ""
    val intStr = overflow + parts.mkString

    // fraction side: left-to-right
    val fb = new StringBuilder
    var fi = 0
    val lastSig = // index of last fraction digit to keep under FM
      if (!fm) fracDigits
      else {
        var keep = fracDigits
        var k = fracToks.length - 1
        var digitPos = fracDigits
        while (k >= 0) {
          fracToks(k) match {
            case D9 =>
              digitPos -= 1
              if (keep == digitPos + 1 && fracStr.charAt(digitPos) == '0') keep = digitPos
            case D0 => digitPos -= 1; k = -1 // forced zero stops trimming
            case _ =>
          }
          k -= 1
        }
        keep
      }
    for (t <- fracToks) t match {
      case D9 | D0 =>
        if (fi < lastSig) { fb.append(fracStr.charAt(fi)) }
        fi += 1
      case Sep => if (fi < lastSig) fb.append(',')
      case SignAlways => fb.append(if (neg) "-" else "+")
      case SignMinus => fb.append(if (neg) "-" else if (fm) "" else " ")
      case Lit(s) => fb.append(s)
    }
    val body = (if (decIdx0 < 0) intStr else intStr + "." + fb.toString)
      // a leading sign slot floats right to sit against the first
      // digit (PostgreSQL right-justifies the signed number)
      .replaceAll("^([+-])(\\s+)", "$2$1")
      .replaceAll("^\\s+", "").replaceAll("\\s+$", "")

    if (pr) { if (neg) s"<$body>" else body }
    else if (signToken || !neg) body
    else "-" + body
  }


}
