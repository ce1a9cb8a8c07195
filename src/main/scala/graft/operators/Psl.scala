package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Public-suffix-list eTLD+1 reduction (t35's registrable-domain
  * core) with FULL rule semantics — normal rules, wildcard rules
  * (`*.ck`), exception rules (`!www.ck`) — per the publicsuffix.org
  * algorithm:
  *
  *  - a rule matches when its labels are a suffix of the host's
  *    labels (`*` matches exactly one label);
  *  - the prevailing rule is the matching exception rule if any,
  *    else the LONGEST matching rule, else the default rule `*`;
  *  - an exception rule's public suffix is the rule minus its
  *    leftmost label;
  *  - registrable domain = public suffix + one more label; a host
  *    that IS a public suffix has none (NULL → `invalid` verdict).
  *
  * [[Rules]] is a committed SNAPSHOT SUBSET of the list (the common
  * ICANN ccSLDs, the high-traffic private-section suffixes, the
  * wildcard/exception families) — ~190 rules vs ~9k upstream; the
  * swap point for a full refresh is this one Seq (same syntax as the
  * upstream file: leading `*.` and `!` markers). Documented
  * divergences from strict PSL, both deliberate:
  *  - a single-label host matching NO explicit rule passes through
  *    whole (`localhost` stays blockable as itself; strict PSL's
  *    default rule would void it);
  *  - IP literals (bracketed IPv6, dotted IPv4) pass through whole —
  *    the address is the blockable unit.
  *
  * Scale shape: since round 16 the hot path is the X24 codegen
  * expression ([[graft.functions.UrlOps.registrableDomain]]) — ONE
  * tree node, hash-set rule probes over the host's last 1–3 label
  * tails, no join, no shuffle; a full-PSL refresh (9k rules) only
  * grows the hash sets. The columnar formulation below is the parity
  * reference; the DuckDB twin is generated from the SAME rule data,
  * so t35 stays fully oracle-gated on the expression path.
  */
object Psl {

  /** The snapshot lives in [[graft.functions.PslRules]] (round 16:
    * shared with the X24 JVM engine so the columnar reference, the
    * codegen expression and the DuckDB twin all derive from ONE
    * Seq). Kept as a stable alias for specs and docs.
    */
  val Rules: Seq[String] = graft.functions.PslRules.Rules

  private[operators] val Normal: Map[Int, Seq[String]] = graft.functions.PslRules.Normal
  private[operators] val WildBases: Map[Int, Seq[String]] = graft.functions.PslRules.WildBases
  private[operators] val Exceptions: Map[Int, Seq[String]] = graft.functions.PslRules.Exceptions

  /** Longest normal/private rule (suffix label bound for the probes). */
  private val MaxK = (Normal.keys ++ WildBases.keys.map(_ + 1) ++
    Exceptions.keys).max

  require(MaxK <= 3, s"registrableDomain tails sized for <=3-label suffixes, rules need $MaxK")

  /** Registrable domain (eTLD+1) of a lowercased host under [[Rules]].
    * NULL for hosts that ARE a public suffix; IP literals and
    * rule-less single-label hosts pass through whole (scaladoc above).
    */
  def registrableDomain(host: Column): Column =
    graft.functions.GraftExpressions.registrableDomain(host)

  /** The original columnar formulation, kept as the PARITY REFERENCE
    * for the X24 engine (UrlParityFuzzSpec pins value equality) and
    * as the executable documentation of the algorithm the DuckDB
    * twin restates. Not used on any hot path since round 16: as a
    * catalyst tree it probes three label tails against ~190-literal
    * isin lists and the optimizer inlines that forest into every
    * reference (measured: a major share of the 39.8 MiB crawl task
    * binaries) — X24 is one node and three hash-set probes.
    */
  private[graft] def registrableDomainRef(host: Column): Column = {
    val arr = split(host, "\\.")
    val n = size(arr)
    // tail(k) = last k labels; element_at(-i) is NULL past the front,
    // and concat_ws SKIPS nulls — every use is therefore n>=k guarded
    def tail(k: Int): Column =
      concat_ws(".", (k to 1 by -1).map(i => element_at(arr, -i)): _*)
    def inSet(c: Column, s: Seq[String]): Column =
      if (s.isEmpty) lit(false) else c.isin(s: _*)
    def hit(k: Int, cond: Column): Column =
      when(n >= k && cond, lit(k)).otherwise(lit(0))
    val normK = (1 to 3).map(k => hit(k, inSet(tail(k), Normal.getOrElse(k, Nil))))
    val wildK = (2 to 3).map(k => hit(k, inSet(tail(k - 1), WildBases.getOrElse(k - 1, Nil))))
    val excK = greatest(
      (2 to 3).map(k => hit(k, inSet(tail(k), Exceptions.getOrElse(k, Nil)))): _*)
    val matchK = greatest((normK ++ wildK): _*)
    val suffixLen = when(excK > 0, excK - 1)
      .when(matchK > 0, matchK).otherwise(lit(1))
    val matched = excK > 0 || matchK > 0
    when(host.isNull, lit(null))
      .when(host.startsWith("[") || host.rlike("^[0-9]+(\\.[0-9]+){3}$"), host)
      .when(suffixLen >= n, when(matched, lit(null)).otherwise(host))
      .when(suffixLen === 1, tail(2))
      .when(suffixLen === 2, tail(3))
      .otherwise(tail(4))
  }

  /** DuckDB twin of [[registrableDomain]] over host expression `e` —
    * generated from the SAME rule data, so the two engines cannot
    * drift rule-by-rule.
    */
  def duckRegistrableDomain(e: String): String = {
    val parts = s"string_split($e, '.')"
    val n = s"len($parts)"
    def tail(k: Int) = s"array_to_string(list_slice($parts, -$k, -1), '.')"
    def inList(s: Seq[String]) = s.map(x => s"'$x'").mkString("(", ", ", ")")
    def hit(k: Int, cond: String) = s"CASE WHEN $n >= $k AND $cond THEN $k ELSE 0 END"
    val normK = (1 to 3).flatMap(k =>
      Normal.get(k).map(s => hit(k, s"${tail(k)} IN ${inList(s)}")))
    val wildK = (2 to 3).flatMap(k =>
      WildBases.get(k - 1).map(s => hit(k, s"${tail(k - 1)} IN ${inList(s)}")))
    val excK = "GREATEST(" + (2 to 3).flatMap(k =>
      Exceptions.get(k).map(s => hit(k, s"${tail(k)} IN ${inList(s)}")))
      .mkString(", ") + ", 0)"
    val matchK = "GREATEST(" + (normK ++ wildK).mkString(", ") + ")"
    val suffixLen =
      s"CASE WHEN $excK > 0 THEN $excK - 1 WHEN $matchK > 0 THEN $matchK ELSE 1 END"
    val matched = s"($excK > 0 OR $matchK > 0)"
    s"""CASE WHEN $e IS NULL THEN NULL
       WHEN starts_with($e, '[') OR regexp_matches($e, '^[0-9]+(\\.[0-9]+){3}$$') THEN $e
       WHEN $suffixLen >= $n THEN (CASE WHEN $matched THEN NULL ELSE $e END)
       WHEN $suffixLen = 1 THEN ${tail(2)}
       WHEN $suffixLen = 2 THEN ${tail(3)}
       ELSE ${tail(4)} END"""
  }
}
