"""robots.txt parsing + matching — the Robots Exclusion Protocol
(RFC 9309, public spec).  The engine already honors per-page robots
META directives (stages/robots.py); real crawls must also honor the
per-HOST robots.txt file, which is what this implements from scratch.

Frozen subset of the RFC (documented so the SQL oracle can mirror it):

* group selection: the group whose ``User-agent`` line equals the
  product token case-insensitively wins; otherwise the ``*`` group; no
  group -> everything allowed.  Multiple user-agent lines stack onto
  the following rule block (RFC §2.2.1).
* rules: ``Allow`` / ``Disallow`` with a path pattern supporting the
  two RFC metacharacters — ``*`` (any char run) and a trailing ``$``
  (end anchor).  An empty Disallow value means "allow everything"
  (historical convention, kept by the RFC).
* decision: the MOST SPECIFIC match wins = the matched pattern with the
  most octets (RFC §2.2.2); ties go to ``Allow``.  No match -> allowed.
* lines are ``field: value``; ``#`` starts a comment; unknown fields
  (Crawl-delay, Sitemap, ...) are ignored; field names are
  case-insensitive.

``Rules`` is a plain tuple-list so it broadcasts / pickles cheaply and
parses once per host inside the cogroup stage (stages/robots.py
``robots_txt_verdicts``).
"""

from __future__ import annotations

import re

# one parsed rule: (allow: bool, pattern: str, n_octets: int, regex)
Rules = list


def _pattern_regex(pat: str):
    """RFC pattern -> compiled regex: '*' = '.*', trailing '$' = anchor;
    everything else literal.  Match is against the path from its start
    (a prefix match unless anchored)."""
    anchored = pat.endswith("$")
    body = pat[:-1] if anchored else pat
    rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
    return re.compile(rx + ("$" if anchored else ""))


def parse_robots_txt(text: str | None, agent: str = "*") -> Rules:
    """Rules for ``agent`` per the frozen subset above.  Deterministic,
    total: garbage lines are skipped, never raised on."""
    if not text:
        return []
    agent = agent.lower()
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    in_agent_run = False
    for raw in str(text).splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                if cur_agents:
                    groups.append((cur_agents, cur_rules))
                cur_agents, cur_rules = [], []
                in_agent_run = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agent_run = False
            if not cur_agents:
                continue  # rule before any user-agent line: ignored
            if field == "disallow" and value == "":
                continue  # empty Disallow = allow everything (no rule)
            cur_rules.append((field == "allow", value))
        # unknown fields (Crawl-delay, Sitemap, ...) are ignored and do
        # NOT end a user-agent stacking run (RFC 9309 §2.2.4: crawlers
        # ignore unsupported lines) — 'UA: a / Crawl-delay: 1 / UA: b /
        # Disallow: /x' stacks a AND b onto the /x rule block
    if cur_agents:
        groups.append((cur_agents, cur_rules))

    chosen: list[tuple[bool, str]] | None = None
    for agents, rules in groups:   # exact agent match beats '*'
        if agent in agents:
            chosen = rules
            break
    if chosen is None:
        for agents, rules in groups:
            if "*" in agents:
                chosen = rules
                break
    if not chosen:
        return []
    return [(allow, pat, len(pat), _pattern_regex(pat))
            for allow, pat in chosen]


def robots_allowed(rules: Rules, path: str) -> bool:
    """RFC §2.2.2 most-specific-match decision for one path."""
    best_n = -1
    best_allow = True      # no match -> allowed
    for allow, _pat, n, rx in rules:
        if rx.match(path) and (n > best_n
                               or (n == best_n and allow and not best_allow)):
            best_n, best_allow = n, allow
    return best_allow


def url_path(url: str) -> str:
    """Path (+query) component the RFC matches against; path-less urls
    match as '/'."""
    s = str(url)
    if "://" in s:
        rest = s.split("://", 1)[1]
        slash = rest.find("/")
        return rest[slash:] if slash >= 0 else "/"
    return s if s.startswith("/") else "/"


def sitemap_urls(text: str | None) -> list[str]:
    """``Sitemap:`` lines from a robots.txt (RFC 9309 §2.3 allows them
    anywhere, outside any group; values are absolute URLs).  The crawl
    discovery link: robots.txt -> sitemap urls -> stages/sitemaps."""
    if not text:
        return []
    out = []
    for raw in str(text).splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, value = line.split(":", 1)
        if field.strip().lower() == "sitemap":
            v = value.strip()
            if v:
                out.append(v)
    return out


_DELAY_VALUE_RE = re.compile(r"^\d+(\.\d+)?$")


def crawl_delay_value(text: str | None, agent: str = "*"):
    """Effective ``Crawl-delay`` for ``agent`` — the politeness input
    major crawlers honor by convention (not part of RFC 9309; frozen
    here so the SQL oracle can mirror it).

    Rules: group selection is IDENTICAL to :func:`parse_robots_txt`
    (exact agent beats ``*``; user-agent lines stack; crawl-delay
    lines — like every non-user-agent, non-rule line — do NOT end a
    stacking run, they attach to the open group).  Within the chosen
    group the LAST syntactically valid value (``\\d+(\\.\\d+)?``) wins;
    no group / no valid value -> ``None``.  Total on garbage."""
    if not text:
        return None
    agent = agent.lower()
    groups: list[tuple[list[str], list[float]]] = []
    cur_agents: list[str] = []
    cur_delays: list[float] = []
    in_agent_run = False
    for raw in str(text).splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, value = line.split(":", 1)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agent_run:
                if cur_agents:
                    groups.append((cur_agents, cur_delays))
                cur_agents, cur_delays = [], []
                in_agent_run = True
            cur_agents.append(value.lower())
        elif field in ("allow", "disallow"):
            in_agent_run = False
        elif field == "crawl-delay":
            if cur_agents and _DELAY_VALUE_RE.match(value):
                cur_delays.append(float(value))
    if cur_agents:
        groups.append((cur_agents, cur_delays))

    chosen = None
    for agents, delays in groups:   # exact agent match beats '*'
        if agent in agents:
            chosen = delays
            break
    if chosen is None:
        for agents, delays in groups:
            if "*" in agents:
                chosen = delays
                break
    return chosen[-1] if chosen else None
