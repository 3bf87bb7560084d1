"""robots.txt parsing and the per-(host, robot) verifier cache.

Reference semantics (/root/reference/src/robots.rs):

- one robots.txt fetched per host, compiled per (host, robot) pair and
  cached (robots.rs:5-58);
- `is_allowed` checks only the URL *path* against the compiled rules
  (robots.rs:79-82);
- a URL whose host cannot be determined is allowed (robots.rs:16-19);
- fetch errors and disallowed URLs are both silently dropped at dispatch
  time (workload.rs:100-105) — the URL stays in the seen set forever.

Parsing follows the Robots Exclusion Protocol (RFC 9309): user-agent
groups, longest-rule-wins precedence, Allow wins length ties, `*`
wildcards and `$` end anchor; group selection is the longest user-agent
token that is a case-insensitive substring of the robot name, falling
back to `*`; no matching group → allowed.

In this sandbox robots bodies come from a fixture table instead of HTTP
(see sources/); a body equal to ``FETCH_ERROR_MARKER`` simulates a
network failure (reference behavior: URL silently dropped).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

FETCH_ERROR_MARKER = "#FETCH_ERROR#"


class RobotsFetchError(Exception):
    pass


def _rule_regex(pattern: str) -> re.Pattern:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "$":
            out.append("$")
        else:
            out.append(re.escape(ch))
    return re.compile("^" + "".join(out))


@dataclass
class _Group:
    agents: list[str]
    rules: list[tuple[bool, str, re.Pattern]]  # (is_allow, raw, compiled)


def parse_robots(text: str) -> list[_Group]:
    groups: list[_Group] = []
    cur: _Group | None = None
    last_was_agent = False
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if cur is None or not last_was_agent:
                cur = _Group(agents=[], rules=[])
                groups.append(cur)
            cur.agents.append(val.lower())
            last_was_agent = True
        elif key in ("allow", "disallow"):
            last_was_agent = False
            if cur is None:
                continue
            if val == "" and key == "disallow":
                continue  # empty Disallow = allow all (no rule)
            cur.rules.append((key == "allow", val, _rule_regex(val)))
        else:
            last_was_agent = False
    return groups


class RobotsVerifier:
    """Compiled rules for one (robots.txt body, robot name) pair.

    Longest-match-wins / allow-beats-tie evaluation runs in
    O(distinct rule lengths) regex calls per path, not O(rules): rules
    are bucketed by length into combined alternation regexes (checking
    lengths descending, allow before disallow, first hit wins)."""

    def __init__(self, robot: str, body: str):
        robot_l = robot.lower()
        best: _Group | None = None
        best_len = -1
        for g in parse_robots(body):
            for a in g.agents:
                if a == "*":
                    if best_len < 0:
                        best, best_len = g, 0
                elif a in robot_l and len(a) > best_len:
                    best, best_len = g, len(a)
        rules = best.rules if best else []
        by_len: dict[int, dict[bool, list[str]]] = {}
        for is_allow, raw, rx in rules:
            body_pat = rx.pattern[1:]  # strip the leading ^
            by_len.setdefault(len(raw), {}).setdefault(is_allow, []).append(body_pat)
        self._levels: list[tuple[re.Pattern | None, re.Pattern | None]] = []
        for length in sorted(by_len, reverse=True):
            allow = by_len[length].get(True)
            deny = by_len[length].get(False)
            self._levels.append(
                (
                    re.compile("^(?:" + "|".join(allow) + ")") if allow else None,
                    re.compile("^(?:" + "|".join(deny) + ")") if deny else None,
                )
            )

    def is_allowed(self, path: str) -> bool:
        path = path or "/"
        for allow_rx, deny_rx in self._levels:
            if allow_rx is not None and allow_rx.match(path):
                return True
            if deny_rx is not None and deny_rx.match(path):
                return False
        return True


class RobotsCache:
    """Pure-python per-(host, robot) verifier cache (robots.rs:5-32).

    ``fetch`` maps host → robots.txt body, raising RobotsFetchError for
    unreachable hosts; the default fixture fetcher is injected by the
    crawler. Fetch errors are cached as None → caller drops the URL.
    """

    def __init__(self, fetch):
        self._fetch = fetch
        self._cache: dict[tuple[str, str], RobotsVerifier | None] = {}

    def is_allowed(self, robot: str, host: str, path: str) -> bool | None:
        """True/False = verdict; None = fetch error (drop silently)."""
        if not host:
            return True
        key = (host, robot)
        if key not in self._cache:
            try:
                body = self._fetch(host)
            except RobotsFetchError:
                self._cache[key] = None
            else:
                if body == FETCH_ERROR_MARKER:
                    self._cache[key] = None
                else:
                    self._cache[key] = RobotsVerifier(robot, body or "")
        v = self._cache[key]
        return None if v is None else v.is_allowed(path)


def make_table_fetcher(robots_map: dict[str, str]):
    """Fixture fetcher: missing host = HTTP 404 = empty rules (allow all)."""

    def fetch(host: str) -> str:
        return robots_map.get(host, "")

    return fetch

def make_http_robots_fetcher(timeout: float = 5.0, scheme: str = "http",
                             port: int | None = None):
    """Live-HTTP robots fetcher (S5, robots.rs:35-51): GET
    ``scheme://host/robots.txt``. Reference parity quirks:

    - an IP-literal host has no ``domain()`` in the reference, which
      skips robots entirely (robots.rs:16-19) → empty rules here;
    - reqwest does NOT error on HTTP status, so a 404's body bytes
      compile as the robots file (no rules → allow) — mirrored by
      reading the HTTPError body;
    - transport errors raise → cached None → URL silently dropped
      (workload.rs:100-105).

    Simplification vs the reference: the cache keys by HOST, so the
    robots URL uses the default port unless ``port`` overrides it (the
    reference rebuilds the robots URL from each page URL, keeping its
    port — robots.rs:35-44); non-default-port crawls pass ``port``.
    """

    def fetch(host: str) -> str:
        import ipaddress
        import urllib.error
        import urllib.request

        try:
            ipaddress.ip_address(host)
            return ""  # IP host: reference skips robots (no domain)
        except ValueError:
            pass
        netloc = host if port is None else f"{host}:{port}"
        try:
            with urllib.request.urlopen(
                f"{scheme}://{netloc}/robots.txt", timeout=timeout
            ) as r:
                return r.read().decode("utf-8", "replace")
        except urllib.error.HTTPError as e:
            try:
                return e.read().decode("utf-8", "replace")
            except Exception:
                return ""
        except Exception as e:
            raise RobotsFetchError(str(e)) from None

    return fetch
