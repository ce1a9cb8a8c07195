package graft.core

import java.util.regex.{Pattern => JPattern}

/** Typed value classes available to route parameters.
  *
  * Same vocabulary as the reference
  * (/root/reference/interlinked/router.py:16-29): `identifier`, `str`
  * (default), `int`, `path`, ISO-8601 `datetime`, `uuid`.
  */
object ValuePatterns {
  val IdPattern = "[a-z][a-z0-9:_]+"

  val patterns: Map[String, String] = Map(
    "identifier" -> "[a-z][a-z0-9_]*",
    "str" -> "[a-z0-9:+._ -]+",
    "int" -> "[-+]?[0-9]+",
    "path" -> "[a-z0-9./_-]+",
    // ISO 8601 datetime
    "datetime" -> ("(-?(?:[1-9][0-9]*)?[0-9]{4})-(1[0-2]|0[1-9])-(3[01]|0[1-9]|[12][0-9])" +
      "T(2[0-3]|[01][0-9]):([0-5][0-9]):([0-5][0-9])(.[0-9]+)?" +
      "(Z|[+-](?:2[0-3]|[01][0-9]):[0-5][0-9])?"),
    "uuid" -> "[a-f0-9]{8}-?[a-f0-9]{4}-?4[a-f0-9]{3}-?[a-f0-9]{4}-?[a-f0-9]{12}"
  )

  def apply(name: String): String =
    patterns.getOrElse(
      name,
      throw new InvalidValue(s"Unknown value pattern '$name'")
    )
}

/** One parsed segment of a pattern string: literal text optionally
  * followed by a `{field}` or `{field:specifier}` hole.
  * Reference: PatternField (/root/reference/interlinked/workflow.py:342-359).
  */
final case class PatternField(
    literalText: String,
    fieldName: Option[String],
    specifier: Option[String]
) {
  def fmt(kw: Map[String, Any]): String = {
    val res = literalText
    fieldName match {
      case None => res
      case Some(name) =>
        val suffix = kw.get(name) match {
          case Some(v) => String.valueOf(v)
          case None =>
            throw new NoSuchElementException(s"key not found: $name")
        }
        specifier.foreach { spec =>
          val regexp = JPattern.compile(ValuePatterns(spec))
          if (!regexp.matcher(suffix).lookingAt())
            throw new InvalidValue(
              s"Parameter '$name' does not match specifier '$spec'"
            )
        }
        res + suffix
    }
  }
}

/** A parameterized resource pattern, e.g. `model.{name}` or
  * `run.{date:datetime}` — parse once, format many.
  * Reference: Pattern (/root/reference/interlinked/workflow.py:363-381).
  */
final class Pattern private (val pattern: String, val fields: Seq[PatternField]) {
  /** Substitute `kw` into the holes; validates typed specifiers. */
  def fmt(kw: Map[String, Any]): String = fields.map(_.fmt(kw)).mkString

  def fieldNames: Seq[String] = fields.flatMap(_.fieldName)

  override def toString: String = s"<Pattern $pattern>"
  override def equals(o: Any): Boolean = o match {
    case p: Pattern => p.pattern == pattern
    case _          => false
  }
  override def hashCode(): Int = pattern.hashCode
}

object Pattern {
  /** Parse `{name}` / `{name:spec}` holes (python-Formatter-style split). */
  def fromString(pattern: String): Pattern = {
    val fields = Seq.newBuilder[PatternField]
    val n = pattern.length
    var i = 0
    val literal = new StringBuilder
    while (i < n) {
      val c = pattern.charAt(i)
      if (c == '{') {
        val close = pattern.indexOf('}', i)
        if (close < 0) { literal.append(c); i += 1 }
        else {
          val inner = pattern.substring(i + 1, close)
          val (name, spec) = inner.indexOf(':') match {
            case -1 => (inner, None)
            case k  => (inner.substring(0, k), Some(inner.substring(k + 1)))
          }
          fields += PatternField(literal.result(), Some(name), spec.filter(_.nonEmpty))
          literal.clear()
          i = close + 1
        }
      } else { literal.append(c); i += 1 }
    }
    if (literal.nonEmpty) fields += PatternField(literal.result(), None, None)
    val fs = fields.result()
    new Pattern(pattern, if (fs.isEmpty) Seq(PatternField("", None, None)) else fs)
  }
}
