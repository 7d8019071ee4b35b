package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt exclusion gate — RFC 9309 (Robots Exclusion Protocol),
  * implemented from the public spec (the Xls/Cfb/Warc from-spec
  * precedent): the politeness step between q197's frontier additions and
  * the fetcher.
  *
  * Spec coverage (stated, the q193 honesty rule):
  *   - group structure (§2.1): one or more `User-agent:` lines start a
  *     group; rule lines attach to the current group; ALL groups naming
  *     the same agent merge; agent tokens match case-insensitively; a
  *     specific-agent match beats `*` (only the most specific agent's
  *     merged rule set applies to a crawler).
  *   - rules (§2.2): `Allow` / `Disallow` path rules; `*` wildcards and
  *     the `$` end anchor; longest-rule-wins precedence with Allow
  *     breaking ties (octet length of the rule as specificity — the
  *     reference-parser convention); an empty rule value is no rule;
  *     URLs matching no rule are allowed; `#` comments stripped.
  *   - NOT covered (documented): percent-encoding normalization (§2.2.2
  *     para 3) and regex-special path octets beyond `.` — the common
  *     crawl-path shape ([A-Za-z0-9/_.-]) doesn't exercise them; a
  *     production gate percent-normalizes upstream in the q145
  *     canonicalizer.
  *
  * Scale shape: the robots corpus is HOST-dimension-sized (one small text
  * per host — millions of hosts, not billions of URLs), so the parsed
  * rule sets collapse to one array per host and BROADCAST-join onto the
  * URL stream; adjudication is a per-row fold over that array — the URL
  * corpus is never shuffled and never exploded against rules. The parse
  * itself is one window pass over exploded robots LINES (robots-sized,
  * not URL-sized).
  */
object RobotsTxt {

  /** Match-regex text for a rule path: `.` and `$` escaped by LITERAL
    * replaces (no regex in the construction — the oracle mirrors the same
    * three `replace` calls byte-for-byte), `*` → `.*`, `^` prepended, and
    * a rule-final `$` converted back from its escaped form into the real
    * end anchor. Both engines then match UNANCHORED (Java `find` /
    * RE2 search) against the same pattern, so `^`/`$` carry the anchors. */
  def regexText(rule: Column): Column = {
    val esc = replaceLit(replaceLit(replaceLit(
      rule, ".", "\\."), "$", "\\$"), "*", ".*")
    when(rule.endsWith("$"),
      concat(lit("^"), esc.substr(lit(1), length(esc) - 2), lit("$")))
      .otherwise(concat(lit("^"), esc))
  }

  /** SQL `replace` (literal, not regex) lifted to the Column DSL. */
  private def replaceLit(c: Column, find: String, repl: String): Column =
    call_function("replace", c, lit(find), lit(repl))

  /** The non-UA directive lines of `agent`'s WINNING groups (named
    * groups when the host has any, else the `*` groups) — the shared
    * group-resolution machinery behind [[agentRules]] and
    * [[crawlDelays]]. Output: (host, field, value). */
  private def winningDirectives(robots: DataFrame, hostCol: String,
      textCol: String, agent: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("host")).orderBy(col("line_no"))
    val lines = robots
      .select(col(hostCol).as("host"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("line_no", "raw")))
      .select(col("host"), col("line_no"),
        trim(regexp_replace(col("raw"), "#.*$", "")).as("ln"))
      .filter(length(col("ln")) > 0)
      .select(col("host"), col("line_no"),
        lower(trim(regexp_extract(col("ln"), "^([^:]+):", 1))).as("field"),
        trim(regexp_extract(col("ln"), "^[^:]+:(.*)$", 1)).as("value"))
      .filter(col("field").isin("user-agent", "allow", "disallow", "crawl-delay"))
    val grouped = lines
      .withColumn("is_ua", col("field") === "user-agent")
      // a group starts at the first UA line of a contiguous UA run
      .withColumn("ua_start", col("is_ua") &&
        !coalesce(lag(col("is_ua"), 1).over(w), lit(false)))
      .withColumn("grp", sum(when(col("ua_start"), 1).otherwise(0)).over(w))
    val groupAgents = grouped.filter(col("is_ua"))
      .groupBy(col("host"), col("grp"))
      .agg(
        max(when(lower(col("value")) === lit(agent.toLowerCase), 1)
          .otherwise(0)).as("named"),
        max(when(col("value") === "*", 1).otherwise(0)).as("star"))
    val hostHasNamed = groupAgents.groupBy(col("host"))
      .agg(max(col("named")).as("has_named"))
    grouped.filter(!col("is_ua") && length(col("value")) > 0)
      .join(groupAgents, Seq("host", "grp"))
      .join(hostHasNamed, Seq("host"))
      // the most specific agent's MERGED directive set: the named
      // groups when any exist for the host, else the * groups
      .filter(when(col("has_named") === 1, col("named") === 1)
        .otherwise(col("star") === 1))
      .select(col("host"), col("field"), col("value"))
  }

  /** Parse per-host robots.txt bodies into the MERGED rule set that
    * applies to `agent`. Input: (hostCol, textCol) — one row per host.
    * Output: (host, is_allow, rule, spec). */
  def agentRules(robots: DataFrame, hostCol: String, textCol: String,
      agent: String): DataFrame =
    winningDirectives(robots, hostCol, textCol, agent)
      .filter(col("field").isin("allow", "disallow"))
      .select(col("host"), (col("field") === "allow").as("is_allow"),
        col("value").as("rule"), length(col("value")).cast("long").as("spec"))

  /** Per-host `Crawl-delay` (seconds) for `agent` — NOT in RFC 9309 but
    * ubiquitously published and honored by the major non-Google engines
    * (stated; the spec's extensibility clause §2.2.4 covers unknown
    * directives). Resolution is the same winning-group rule as paths: a
    * host whose named groups exist takes ONLY their delays — if they
    * publish none, the default applies, never the `*` group's. Several
    * delays in the winning groups take the MAX (conservative
    * politeness, deterministic); non-numeric values are ignored.
    * Output: one row per robots host, (host, delay_s). */
  def crawlDelays(robots: DataFrame, hostCol: String, textCol: String,
      agent: String, defaultDelay: Long = 1L): DataFrame = {
    val d = winningDirectives(robots, hostCol, textCol, agent)
      .filter(col("field") === "crawl-delay")
      .select(col("host"), expr("try_cast(value AS BIGINT)").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("host")).agg(max(col("v")).as("d"))
    robots.select(col(hostCol).as("host")).distinct()
      .join(d, Seq("host"), "left")
      .select(col("host"), coalesce(col("d"), lit(defaultDelay)).as("delay_s"))
  }

  /** Adjudicate (host, path) URLs against the rule table: collapse rules
    * to one array per host, broadcast, fold per URL row — longest
    * matching rule wins, Allow breaks specificity ties, no match =
    * allowed. Returns `urls`'s columns plus (allowed, rule, spec). */
  def adjudicate(urls: DataFrame, rules: DataFrame): DataFrame = {
    val ruleArr = rules
      .select(col("host"),
        struct(col("spec"), col("is_allow"), regexText(col("rule")).as("re"),
          col("rule")).as("r"))
      .groupBy(col("host")).agg(collect_list(col("r")).as("rs"))
    urls.join(broadcast(ruleArr), Seq("host"), "left")
      .withColumn("m", expr("filter(rs, r -> path RLIKE r.re)"))
      .withColumn("best", expr(
        "aggregate(m, CAST(NULL AS STRUCT<spec: BIGINT, is_allow: BOOLEAN, re: STRING, rule: STRING>), " +
          "(acc, r) -> CASE WHEN acc IS NULL THEN r " +
          "WHEN r.spec > acc.spec OR (r.spec = acc.spec AND r.is_allow AND NOT acc.is_allow) " +
          "OR (r.spec = acc.spec AND r.is_allow = acc.is_allow AND r.rule < acc.rule) THEN r " +
          "ELSE acc END)"))
      .select(urls.columns.map(col) :+
        coalesce(col("best.is_allow"), lit(true)).as("allowed") :+
        col("best.rule").as("rule") :+
        coalesce(col("best.spec"), lit(0L)).as("spec"): _*)
  }
}
