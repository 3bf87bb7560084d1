"""Check-file loading — the reference's primary user surface (S3/M2/M3).

The reference sniffs the extraction-UDF format from ``--check-file`` /
``--check-file-format`` (``cfg.rs:162-183``: explicit format wins, then
``.js`` → Js, ``.side``/``.json`` → Side, else error), defaults to the
JS snippet ``return window.location.href`` when no file is given
(``cfg.rs:344-346``), runs Side scripts through siderunner and reads the
``"RESULT"`` variable — ``Null`` when unset (``backend.rs:173-183``).

This module reproduces that surface over the synthetic page rows. There
is no browser in the sandbox, so the JS flavor is a small recognized
subset evaluated against a page context (``window.location.*`` from the
URL, ``document.body`` from the page's data payload, JSON literals) and
the Side flavor interprets the store/echo/open/executeScript commands
that operate on variables — DOM-dependent commands raise
``NotImplementedError`` with the command name, the same honesty contract
as the HTTP transport stub.

Extractor contract (``config.py`` ``CrawlConfig.extractor``):
``fn(page_rows: pa.Table) -> pa.Array[string]`` over the OK rows, where
each output value is the JSON-encoded extraction result for that page.
"""

from __future__ import annotations

import json
import re
from urllib.parse import urlsplit

import pyarrow as pa

DEFAULT_JS = "return window.location.href"  # cfg.rs:344-346

_VAR_RE = re.compile(r"\$\{([^}]+)\}")


class CheckFileError(ValueError):
    pass


def _eval_js(src: str, page: dict, variables: dict | None = None):
    """Evaluate the supported JS subset against one page context.

    Supported: ``return window.location.href|host|hostname|pathname|
    protocol``, ``return document.body.innerText`` (the page's data
    payload), ``return <JSON literal>``. Anything else raises — the
    sandbox has no JS engine, and silently guessing would corrupt data.
    """
    s = src.strip().rstrip(";").strip()
    if variables:
        s = _VAR_RE.sub(lambda m: str(variables.get(m.group(1), "")), s)
    if not s.startswith("return"):
        raise CheckFileError(f"unsupported JS (no return): {src!r}")
    expr = s[len("return"):].strip()
    loc = urlsplit(page["url"])
    window = {
        "window.location.href": page["url"],
        "window.location.host": loc.netloc,
        "window.location.hostname": loc.hostname or "",
        "window.location.pathname": loc.path,
        "window.location.protocol": loc.scheme + ":",
        "document.body.innerText": page.get("data"),
        "document.URL": page["url"],
    }
    if expr in window:
        return window[expr]
    try:
        return json.loads(expr)
    except json.JSONDecodeError:
        raise CheckFileError(
            f"unsupported JS expression {expr!r} (no browser in this "
            "environment; supported: window.location.*, "
            "document.body.innerText, document.URL, JSON literals)"
        ) from None


class JsCheck:
    """M2 analog: a ``.js`` snippet evaluated per OK page."""

    def __init__(self, source: str):
        self.source = source

    def __call__(self, page_rows: pa.Table) -> pa.Array:
        urls = page_rows.column("url").to_pylist()
        datas = page_rows.column("data").to_pylist()
        out = [
            json.dumps(_eval_js(self.source, {"url": u, "data": d}))
            for u, d in zip(urls, datas)
        ]
        return pa.array(out, pa.string())


class SideCheck:
    """M3 analog: minimal Selenium-IDE (.side) interpreter.

    Runs every test's command list in order against per-page variables;
    the extraction result is the ``RESULT`` variable, JSON ``null`` when
    no command set it (backend.rs:173-183)."""

    SUPPORTED = {"store", "echo", "open", "executeScript",
                 "execute script", "pause", "//store"}

    def __init__(self, source: str):
        try:
            doc = json.loads(source)
        except json.JSONDecodeError as e:
            raise CheckFileError(f"invalid .side JSON: {e}") from None
        self.commands = [
            c
            for t in doc.get("tests", [])
            for c in t.get("commands", [])
        ]
        for c in self.commands:
            cmd = c.get("command", "")
            if cmd.startswith("//"):  # Selenium IDE disabled command
                continue
            if cmd not in self.SUPPORTED:
                raise NotImplementedError(
                    f".side command {cmd!r} needs a browser; this "
                    f"environment supports {sorted(self.SUPPORTED)}"
                )

    def _run_one(self, page: dict):
        variables: dict = {}
        for c in self.commands:
            cmd = c.get("command", "")
            target = c.get("target", "") or ""
            value = c.get("value", "") or ""
            if cmd.startswith("//") or cmd in ("pause", "echo", "open"):
                continue
            if cmd == "store":
                variables[value] = _VAR_RE.sub(
                    lambda m: str(variables.get(m.group(1), "")), target)
            elif cmd in ("executeScript", "execute script"):
                res = _eval_js(target, page, variables)
                if value:
                    variables[value] = res
        return variables.get("RESULT")

    def __call__(self, page_rows: pa.Table) -> pa.Array:
        urls = page_rows.column("url").to_pylist()
        datas = page_rows.column("data").to_pylist()
        out = [
            json.dumps(self._run_one({"url": u, "data": d}))
            for u, d in zip(urls, datas)
        ]
        return pa.array(out, pa.string())


def default_extractor() -> JsCheck:
    """The reference's default UDF when no check file is given."""
    return JsCheck(DEFAULT_JS)


def load_check_file(path: str, fmt: str | None = None):
    """Open + sniff a check file exactly like ``cfg.rs:162-183``."""
    with open(path) as fh:
        content = fh.read()
    if fmt in ("side", "json"):
        kind = "side"
    elif fmt == "js":
        kind = "js"
    elif path.endswith(".js"):
        kind = "js"
    elif path.endswith(".side") or path.endswith(".json"):
        kind = "side"
    else:
        raise CheckFileError(
            f"Failed to determine a format of a check file {path!r}")
    return JsCheck(content) if kind == "js" else SideCheck(content)
