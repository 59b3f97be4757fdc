"""robots.txt politeness: parse per-domain robots bodies into rule rows
and classify every page url allowed/blocked under Google's longest-match
semantics — the gate a compliant crawl (and retroactive filters like C4's
robots pass) applies before a page may enter the corpus.

Engine analog of the reference's per-file admission gate (ref:
transcription/service_validation.py — named accept/reject decision ahead
of processing), re-keyed on (domain, url path).

Scale design: robots bodies are a DOMAIN-side table — ~10^7 rows against
10^12 pages — so parsing runs Arrow-batched over the small side only and
the rule set joins BROADCAST onto the page scan: per page the match is a
map-side prefix comparison + one partial max, no shuffle of page rows
beyond the per-url aggregate (and that aggregate's key is the page's own
url, so AQE-coalesced partial aggregation absorbs it). The parser is
Python-per-robots-file, never Python-per-page.

LITE semantics (documented subset of RFC 9309 / Google):
* groups = consecutive ``User-agent`` lines followed by rules; a group
  applies when it names ``*`` or exactly the caller's agent token
  (no substring ranking). Per RFC 9309, when a domain has a group naming
  the caller's agent, ONLY that group applies — ``*`` groups are the
  fallback, not a union.
* ``Allow``/``Disallow`` prefixes match literally (no ``*``/``$``
  wildcards); empty ``Disallow:`` means unrestricted and emits no rule.
* longest prefix wins; at equal length ``Allow`` wins; no matching rule
  means allowed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULES_SCHEMA = "domain string, agent string, rule string, prefix string"


def parse_robots_body(body: str) -> list[tuple[str, str, str]]:
    """One robots.txt body → [(agent, 'allow'|'disallow', prefix)].
    Comments stripped, unknown directives ignored, rule lines before any
    User-agent line ignored (spec: rules belong to a group)."""
    out: list[tuple[str, str, str]] = []
    agents: list[str] = []
    collecting_agents = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        k, v = line.split(":", 1)
        k, v = k.strip().lower(), v.strip()
        if k == "user-agent":
            if collecting_agents:
                agents.append(v.lower())
            else:
                agents = [v.lower()]
            collecting_agents = True
        elif k in ("allow", "disallow"):
            collecting_agents = False
            if not agents or not v:
                continue  # empty Disallow: = unrestricted; dangling rule dropped
            for a in agents:
                out.append((a, k, v))
        else:
            collecting_agents = False
    return out


def parse_robots(
    robots: DataFrame, *, domain_col: str = "domain", body_col: str = "body"
) -> DataFrame:
    """Domain-side robots table → rule rows (Arrow-batched; the corpus
    never enters Python)."""
    src = robots.select(
        F.col(domain_col).cast("string").alias("_d"), F.col(body_col).alias("_b")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for d, b in zip(pdf["_d"], pdf["_b"]):
                for agent, rule, prefix in parse_robots_body(str(b or "")):
                    rows.append((d, agent, rule, prefix))
            yield pd.DataFrame(rows, columns=["domain", "agent", "rule", "prefix"])

    return src.mapInPandas(batches, schema=RULES_SCHEMA)


def robots_verdicts(
    pages: DataFrame,
    rules: DataFrame,
    *,
    agent: str = "*",
    url_col: str = "url",
) -> DataFrame:
    """Per-page crawl verdict: ``(url, verdict 'allowed'|'blocked',
    matched_rule, matched_prefix)`` under longest-match-then-allow-wins.

    ``rules`` is `parse_robots` output (or the same shape); it broadcasts.
    Pages whose domain has no robots entry — or no applicable rule — are
    allowed with NULL match columns.
    """
    from slower_whisper_spark.functions.url import registered_domain, url_path

    a = agent.lower()
    applicable = rules.where((F.col("agent") == "*") | (F.col("agent") == a))
    # RFC 9309 group selection: a domain with an agent-specific group uses
    # ONLY it; '*' is the fallback. Computed on the (tiny) rule side.
    dom_has = applicable.groupBy("domain").agg(
        F.max((F.col("agent") == a).cast("int")).alias("_has_spec")
    )
    applicable = (
        applicable.join(dom_has, "domain")
        .where((F.col("agent") == a).cast("int") == F.col("_has_spec"))
        .drop("_has_spec")
    )
    p = pages.select(
        F.col(url_col).alias("url"),
        registered_domain(url_col).alias("domain"),
        F.coalesce(url_path(url_col), F.lit("/")).alias("path"),
    )
    j = p.join(F.broadcast(applicable), "domain", "left")
    hit = F.col("prefix").isNotNull() & F.col("path").startswith(F.col("prefix"))
    # rank = (prefix length, allow-beats-disallow); non-matching rules rank
    # below every match and carry a NULL payload
    ranked = j.select(
        "url",
        F.when(
            hit,
            F.struct(
                F.length("prefix").alias("l"),
                (F.col("rule") == "allow").cast("int").alias("a"),
                F.col("rule").alias("rule"),
                F.col("prefix").alias("prefix"),
            ),
        ).alias("m"),
    )
    best = ranked.groupBy("url").agg(F.max("m").alias("m"))
    return best.select(
        "url",
        F.when(
            F.col("m").isNull() | (F.col("m.rule") == "allow"), "allowed"
        )
        .otherwise("blocked")
        .alias("verdict"),
        F.col("m.rule").alias("matched_rule"),
        F.col("m.prefix").alias("matched_prefix"),
    )
