"""robots.txt parsing and crawl-politeness URL filtering (RFC 9309).

Curation front-door for the web-page corpus: a KG-construction crawl
must drop pages a host's robots.txt disallows before extraction.  The
reference has no crawler surface (csvweb converts CSV the caller
already fetched); this module follows RFC 9309 (Robots Exclusion
Protocol) semantics:

* Groups: consecutive ``User-agent:`` lines share the following
  ``Allow:`` / ``Disallow:`` rules; rules before any user-agent line
  belong to no group and are ignored; ``#`` comments and unknown
  fields are skipped; field names are case-insensitive.
* Group selection: the group whose agent token equals the requesting
  agent (case-insensitive) wins; otherwise the ``*`` group; otherwise
  everything is allowed.  (RFC longest-agent-substring selection is
  simplified to exact-else-star - the dominant real-world shape.)
* Rule matching: patterns match the URL's path-and-query by prefix,
  with ``*`` matching any octet sequence and a trailing ``$``
  anchoring the end.  The matching rule with the LONGEST pattern wins;
  on a length tie, allow beats disallow.  No matching rule or no
  robots.txt for the host means allowed.  An empty ``Disallow:``
  matches nothing (i.e. allows all).
* Percent-encoding equivalence classes (RFC 9309 §2.2.2) are NOT
  normalized - paths and patterns compare as published - documented
  subset.

Scale shape (the 100 TB question is the PAGE side, not the rule side):

1. robots.txt bodies are parsed by one Arrow-batched mapInPandas over
   the (host, body) table - one row per HOST, millions of times
   smaller than the page corpus.
2. The applicable group's rules are folded into ONE array-of-structs
   row per host, pre-sorted by (pattern length desc, allow desc) with
   each pattern pre-compiled to an anchored Java regex.
3. Page verdicts are a single equi-join on host (broadcast when the
   rule table is small - AQE-decided, or forced with
   `broadcast_rules=True` - else a plain hash join) plus a JVM
   higher-order `filter(rules, r -> path rlike r.rx)[0]` - no
   aggregation ever touches the page table, and under a broadcast
   join it is never shuffled at all.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ROBOTS_RULES_SCHEMA = ("host string, agent string, pattern string, "
                       "rx string, allow boolean, pat_len int")

_FIELD_RE = re.compile(r"^([A-Za-z-]+)\s*:\s*(.*)$")


def _pattern_regex(pattern: str) -> str:
    """RFC 9309 pattern -> anchored Java regex: '*' matches any
    sequence, a TRAILING '$' anchors the end, everything else is
    literal."""
    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in body)
    return "^" + rx + ("$" if anchored_end else "")


def parse_robots_text(host: str, body: str) -> list[tuple]:
    """All (host, agent, pattern, rx, allow, pat_len) rules of one
    robots.txt body.  Group state machine per RFC 9309 §2.2: a run of
    user-agent lines opens a group; the first rule line closes the
    run; rules with no preceding user-agent line are dropped."""
    out: list[tuple] = []
    agents: list[str] = []
    in_agent_run = False
    for raw in body.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        m = _FIELD_RE.match(line)
        if not m:
            continue
        field, value = m.group(1).lower(), m.group(2).strip()
        if field == "user-agent":
            if not in_agent_run:
                agents = []
                in_agent_run = True
            agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agent_run = False
            if not value:  # empty pattern matches nothing (RFC 9309)
                continue
            allow = field == "allow"
            for agent in agents:
                out.append((host, agent, value, _pattern_regex(value),
                            allow, len(value)))
        else:  # sitemap / crawl-delay / unknown: not match-relevant
            in_agent_run = False
    return out


def parse_robots(robots: DataFrame, host_col: str = "host",
                 body_col: str = "body") -> DataFrame:
    """(host, body) robots.txt table -> flat rule rows.  One
    Arrow-batched mapInPandas; the input is per-HOST, so this is the
    cheap side of the pipeline by construction."""
    staged = robots.select(F.col(host_col).cast("string").alias("host"),
                           F.col(body_col).cast("string").alias("_body"))

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["host", "agent", "pattern", "rx", "allow", "pat_len"]
        for pdf in batches:
            rows: list[tuple] = []
            for host, body in zip(pdf["host"], pdf["_body"]):
                if body is not None:
                    rows.extend(parse_robots_text(host, body))
            yield pd.DataFrame(rows, columns=cols)

    return staged.mapInPandas(parse, ROBOTS_RULES_SCHEMA)


def rules_for_agent(rules: DataFrame, agent: str) -> DataFrame:
    """Applicable group per host for `agent`: exact agent match
    preferred, else the '*' group - one array-of-structs row per host,
    rules pre-sorted by (pat_len desc, allow desc) so the FIRST
    matching element is the RFC winner (longest match, allow on
    ties)."""
    agent = agent.lower()
    cand = rules.where(F.col("agent").isin(agent, "*"))
    per_agent = (cand
                 .groupBy("host", "agent")
                 .agg(F.collect_list(
                     F.struct("pat_len", "allow", "rx")).alias("rules")))
    # exact group shadows the star group host-by-host
    pick = (per_agent
            .withColumn("_pri", F.when(F.col("agent") == agent, 0)
                                 .otherwise(1))
            .groupBy("host")
            .agg(F.min_by("rules", "_pri").alias("rules")))
    return pick.select(
        "host",
        F.reverse(F.array_sort(F.col("rules"))).alias("rules"))


def _split_url(url: Column) -> tuple[Column, Column]:
    host = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)",
                            1)
    path = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+",
                            "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    return host, path


def robots_verdicts(pages: DataFrame, robots: DataFrame,
                    agent: str = "*", url_col: str = "url",
                    broadcast_rules: bool = False) -> DataFrame:
    """pages + boolean `allowed` column.  `robots` is the (host, body)
    table; see the module docstring for the join shape.  The verdict
    is the first element of a JVM higher-order filter over the host's
    pre-sorted rule array; NULL array (no robots / no applicable group
    / no match) -> allowed.

    `broadcast_rules=True` adds an explicit broadcast hint so the page
    table is NEVER shuffled - correct when the per-host rule table
    fits in executor memory.  Default False: AQE picks broadcast vs
    hash join from the measured rule-table size (a web-scale crawl can
    have 10^8 robots hosts - an unconditional hint would OOM, the same
    failure mode the canonical-map broadcasts were gated for)."""
    grouped = rules_for_agent(parse_robots(robots), agent)
    if broadcast_rules:
        grouped = F.broadcast(grouped)
    host, path = _split_url(F.col(url_col))
    staged = pages.withColumn("_rhost", host).withColumn("_rpath", path)
    joined = staged.join(grouped,
                         staged["_rhost"] == grouped["host"], "left")
    matched = F.filter(F.col("rules"),
                       lambda r: F.regexp_like(F.col("_rpath"), r["rx"]))
    # try_element_at: NULL on empty match array (ANSI-safe), -> allowed
    verdict = F.coalesce(F.try_element_at(matched, F.lit(1))["allow"],
                         F.lit(True))
    return (joined
            .withColumn("allowed", verdict)
            .drop("_rhost", "_rpath", "host", "rules"))


def filter_allowed(pages: DataFrame, robots: DataFrame,
                   agent: str = "*", url_col: str = "url",
                   broadcast_rules: bool = False) -> DataFrame:
    """Drop pages the host's robots.txt disallows for `agent`."""
    return (robots_verdicts(pages, robots, agent, url_col,
                            broadcast_rules)
            .where(F.col("allowed")).drop("allowed"))
