package graft.core

import java.util.regex.{Matcher, Pattern => JPattern}
import scala.collection.mutable

/** A successful route lookup: the route pattern that matched, its
  * registered value, and the parameters captured from the key.
  * Reference: Match (/root/reference/interlinked/router.py:33-37).
  */
final case class RouteMatch[V](route: String, value: V, kw: Map[String, String])

/** Pattern router: maps parameterized path patterns to values.
  *
  * Semantics follow the reference Router
  * (/root/reference/interlinked/router.py:40-114): exact key match
  * wins; otherwise routes are probed in insertion order with
  * case-insensitive regexes compiled from the pattern, each `{name}` /
  * `{name:type}` hole becoming a typed capture group.
  */
final class Router[V] {
  // (compiled regex, ordered param names, value); insertion-ordered so
  // pattern probing is deterministic.
  private val routes =
    mutable.LinkedHashMap[String, (JPattern, Seq[String], V)]()

  def this(init: (String, V)*) = { this(); addRoutes(init) }

  def addRoutes(rs: Iterable[(String, V)]): Unit =
    rs.foreach { case (p, v) => add(p, v) }

  /** Register `value` under the parameterized `path`. */
  def add(path: String, value: V): Unit = {
    if (path.contains("{}"))
      throw new InvalidValue(
        s"Anonymous pattern '{}' is not supported (in $path)"
      )
    val paramRe =
      JPattern.compile("\\{(" + ValuePatterns.IdPattern + ")\\}", JPattern.CASE_INSENSITIVE)
    val m = paramRe.matcher(path)
    val regex = new StringBuilder("^")
    val names = Seq.newBuilder[String]
    var idx = 0
    while (m.find()) {
      val raw = m.group(1)
      val (name, tpe) = raw.indexOf(':') match {
        case -1 => (raw, "str")
        case k  => (raw.substring(0, k), raw.substring(k + 1))
      }
      regex.append(JPattern.quote(path.substring(idx, m.start())))
      // Java named groups reject '_' in names, so capture positionally
      // and track names alongside.
      regex.append("(").append(ValuePatterns(tpe)).append(")")
      names += name
      idx = m.end()
    }
    // Tail literal: reference keeps only the part before a ':'
    // (router.py:82) — preserved for route-string compatibility.
    regex.append(JPattern.quote(path.substring(idx).split(":", 2)(0))).append("$")
    routes.put(
      path,
      (JPattern.compile(regex.result(), JPattern.CASE_INSENSITIVE), names.result(), value)
    )
  }

  /** Exact-match first, then pattern probe in registration order. */
  def matchKey(key: String): Option[RouteMatch[V]] = {
    routes.get(key) match {
      case Some((_, _, value)) => return Some(RouteMatch(key, value, Map.empty))
      case None                =>
    }
    routes.iterator
      .map { case (route, (regex, names, value)) =>
        val m: Matcher = regex.matcher(key)
        if (m.matches())
          Some(RouteMatch(route, value, names.zipWithIndex.map { case (n, i) =>
            n -> m.group(i + 1)
          }.toMap))
        else None
      }
      .collectFirst { case Some(rm) => rm }
  }

  /** Value for the matched key, or `default`. */
  def get(key: String, default: => V): V =
    matchKey(key).map(_.value).getOrElse(default)

  def getOption(key: String): Option[V] = matchKey(key).map(_.value)

  def contains(key: String): Boolean = routes.contains(key)

  def keys: Seq[String] = routes.keys.toSeq

  def isEmpty: Boolean = routes.isEmpty

  /** Shallow copy (reference Router.clone, router.py:49-56). */
  def copyRouter(): Router[V] = {
    val r = new Router[V]
    r.routes ++= routes
    r
  }
}
