"""URL ignore filters.

Reference semantics (/root/reference/src/filters.rs:15-27):

- Regex filter: URL ignored when the regex MATCHES anywhere in the full
  URL string (`regex.is_match`, i.e. an unanchored search).
- Domain allowlist: URL ignored UNLESS its host — with a leading "www."
  stripped — equals one of the allowed domains (also "www."-stripped).
  A URL with no host is ignored.
- Multiple filters OR together: ignored if ANY filter ignores
  (/root/reference/src/engine.rs:51-57).
- All `-f domain=` args squash into one allowlist
  (/root/reference/src/cfg.rs:142-155); an empty allowlist ignores
  every URL with a host (matches `Filter::Domain(vec![])` semantics) —
  so a `domains=None` config means "no domain filter at all".

The vectorized path tries pyarrow's RE2 engine first and falls back to
the `regex` package (fancy-regex parity: lookarounds etc.) per value.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import regex as _regex

from .url import host_of


def _strip_www(h: str) -> str:
    return h[4:] if h.startswith("www.") else h


@dataclass
class FilterSpec:
    """Compiled filter set; picklable (compiles lazily per process)."""

    ignore_regexes: tuple[str, ...] = ()
    allow_domains: tuple[str, ...] | None = None  # None = no domain filter
    _compiled: list = field(default=None, repr=False, compare=False)
    _re2_ok: list = field(default=None, repr=False, compare=False)

    def __getstate__(self):
        return (self.ignore_regexes, self.allow_domains)

    def __setstate__(self, state):
        self.ignore_regexes, self.allow_domains = state
        self._compiled = None
        self._re2_ok = None

    def _ensure(self):
        if self._compiled is None:
            self._compiled = [_regex.compile(p) for p in self.ignore_regexes]
            self._re2_ok = []
            for p in self.ignore_regexes:
                try:
                    pc.match_substring_regex(pa.array([""]), p)
                    self._re2_ok.append(True)
                except pa.ArrowInvalid:
                    self._re2_ok.append(False)
            self._allowed = (
                None
                if self.allow_domains is None
                else {_strip_www(d) for d in self.allow_domains}
            )

    def is_ignored(self, url: str) -> bool:
        self._ensure()
        for rx in self._compiled:
            if rx.search(url):
                return True
        if self._allowed is not None:
            h = host_of(url)
            if not h or _strip_www(h) not in self._allowed:
                return True
        return False

    def ignored_mask(self, urls: pa.Array | list[str]) -> np.ndarray:
        """Vectorized is_ignored over a column of canonical URLs."""
        self._ensure()
        arr = pa.array(urls, type=pa.string()) if not isinstance(urls, pa.Array) else urls
        n = len(arr)
        mask = np.zeros(n, dtype=bool)
        for rx, ok, pat in zip(self._compiled, self._re2_ok, self.ignore_regexes):
            if ok:
                m = pc.match_substring_regex(arr, pat)
                mask |= np.asarray(m.fill_null(False))
            else:
                vals = arr.to_pylist()
                mask |= np.fromiter(
                    (v is not None and rx.search(v) is not None for v in vals),
                    dtype=bool,
                    count=n,
                )
        if self._allowed is not None:
            vals = arr.to_pylist()
            dom_ok = np.fromiter(
                (
                    v is not None
                    and (h := host_of(v)) != ""
                    and _strip_www(h) in self._allowed
                    for v in vals
                ),
                dtype=bool,
                count=n,
            )
            mask |= ~dom_ok
        return mask
