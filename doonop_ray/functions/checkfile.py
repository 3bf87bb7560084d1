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
that operate on variables, plus the click-free storeText/assert/
assertText subset against the page payload as document body —
DOM-interaction commands raise ``NotImplementedError`` with the command
name, the same honesty contract as the HTTP transport stub.

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


class SideAssertError(CheckFileError):
    """A .side ``assert``/``assertText`` failed for a page — the analog
    of a Selenium-IDE test failure, surfaced per page rather than
    silently emitting a wrong extraction."""


# DOM-free locator subset: the synthetic page payload IS the document
# body, so only whole-body locators are resolvable without a browser.
_BODY_LOCATORS = {"css=body", "xpath=//body", "tag=body"}


class SideCheck:
    """M3 analog: minimal Selenium-IDE (.side) interpreter.

    Runs every test's command list in order against per-page variables;
    the extraction result is the ``RESULT`` variable, JSON ``null`` when
    no command set it (backend.rs:173-183).

    Click-free command subset beyond store/executeScript:

    - ``storeText`` — element text into a variable; only the whole-body
      locators (``css=body`` et al) resolve, since the synthetic page
      payload is the document body (no DOM in this environment);
    - ``assert`` — stored variable equals the (interpolated) expected
      value, else ``SideAssertError`` for that page;
    - ``assertText`` — element text equals the expected value.

    DOM-interaction commands (click, waitFor*, type, ...) still raise
    ``NotImplementedError`` at load time — the honesty contract."""

    SUPPORTED = {"store", "echo", "open", "executeScript",
                 "execute script", "pause", "//store",
                 "storeText", "store text",
                 "assert", "assertText", "assert text"}

    _TEXT_CMDS = {"storeText", "store text", "assertText", "assert text"}

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
            if cmd in self._TEXT_CMDS:
                loc = (c.get("target", "") or "").strip()
                if loc not in _BODY_LOCATORS:
                    raise NotImplementedError(
                        f".side locator {loc!r} needs a DOM; this "
                        f"environment resolves {sorted(_BODY_LOCATORS)}"
                    )

    @staticmethod
    def _body_text(page: dict) -> str:
        d = page.get("data")
        return d if isinstance(d, str) else json.dumps(d)

    def _run_one(self, page: dict):
        variables: dict = {}

        def interp(s: str) -> str:
            return _VAR_RE.sub(
                lambda m: str(variables.get(m.group(1), "")), s)

        for c in self.commands:
            cmd = c.get("command", "")
            target = c.get("target", "") or ""
            value = c.get("value", "") or ""
            if cmd.startswith("//") or cmd in ("pause", "echo", "open"):
                continue
            if cmd == "store":
                variables[value] = interp(target)
            elif cmd in ("storeText", "store text"):
                variables[value] = self._body_text(page)
            elif cmd == "assert":
                got = variables.get(target)
                want = interp(value)
                if str(got) != want:
                    raise SideAssertError(
                        f"assert failed on {page['url']}: "
                        f"variable {target!r} is {got!r}, expected "
                        f"{want!r}")
            elif cmd in ("assertText", "assert text"):
                got = self._body_text(page)
                want = interp(value)
                if got != want:
                    raise SideAssertError(
                        f"assertText failed on {page['url']}: body is "
                        f"{got!r}, expected {want!r}")
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
