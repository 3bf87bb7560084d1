"""CLI integration tests — mirror the reference's own CLI tests
(/root/reference/tests/crawling.rs): golden Statistics stderr line, JSONL
stdout, zero-stats on empty input."""

import json
import subprocess
import sys

import pytest

from doonop_ray.synth import WorldParams, build_world

ENV = {"PYTHONPATH": "/root/repo", "RAY_ADDRESS": "local", "PATH": "/usr/bin:/bin"}


def run_cli(args, timeout=240):
    import os

    env = dict(os.environ)
    env.update(ENV)
    return subprocess.run(
        [sys.executable, "-m", "doonop_ray", *args],
        capture_output=True, text=True, timeout=timeout, env=env,
        cwd="/root/repo",
    )


@pytest.fixture(scope="module")
def world_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("world")
    w = build_world(WorldParams(seed=7, n_hosts=3, pages_per_host=6))
    w.write(str(d))
    return str(d), w


def test_cli_no_urls_prints_zero_stats(world_dir):
    d, _ = world_dir
    r = run_cli(["--world", d])
    assert r.returncode == 0
    assert "Statistics: visited 0, collected 0, errors 0, retries 0" in r.stderr


def test_cli_conformance_crawl_matches_reference_format(world_dir):
    # mirrors tests/crawling.rs:13-23: crawl a 2-page chain, assert the
    # exact stats suffix and the JSONL payloads on stdout
    d, w = world_dir
    seeds = w.seeds.column("url").to_pylist()
    r = run_cli(["--world", d, "--conformance", "--json",
                 "--retry-threshold-ms", "0", *seeds])
    assert r.returncode == 0, r.stderr
    stats_line = [ln for ln in r.stderr.splitlines() if ln.startswith("Statistics:")]
    assert len(stats_line) == 1
    import re

    m = re.match(
        r"Statistics: visited (\d+), collected (\d+), errors (\d+), retries (\d+)",
        stats_line[0],
    )
    assert m
    collected = int(m.group(2))
    payloads = [json.loads(ln) for ln in r.stdout.splitlines()]
    assert len(payloads) == collected > 0


def good_seed(w) -> str:
    """A seed URL whose page has no injected failure (fail_mode == '')."""
    df = w.pages.select(["url", "fail_mode"]).to_pandas()
    ok = set(df.loc[df["fail_mode"] == "", "url"])
    return next(s for s in w.seeds.column("url").to_pylist() if s in ok)


def test_cli_scaled_crawl_with_filters(world_dir, tmp_path):
    d, w = world_dir
    seeds = w.seeds.column("url").to_pylist()
    # filter on a host whose SEED page fetches OK on attempt 0, else the
    # crawl legitimately ends after one errored page and stdout is empty
    from urllib.parse import urlsplit

    host = urlsplit(good_seed(w)).hostname
    r = run_cli(["--world", d, "--json", "--retry-threshold-ms", "0",
                 "-j", "2", "-f", f"domain={host}",
                 "--out", str(tmp_path / "out"), "--num-cpus", "4", *seeds])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Statistics: visited" in r.stderr
    # domain filter: everything crawled is on the allowed host (default
    # UDF => payload is the page URL, cfg.rs:344-346)
    checked = 0
    for ln in r.stdout.splitlines():
        payload = json.loads(ln)
        if isinstance(payload, dict) and "u" in payload:
            assert host in payload["u"]
            checked += 1
        elif isinstance(payload, str):
            assert host in payload
            checked += 1
    assert checked > 0


def test_cli_limit_zero_quirk(world_dir, tmp_path):
    d, w = world_dir
    seeds = w.seeds.column("url").to_pylist()
    r = run_cli(["--world", d, "--conformance", "--limit", "0",
                 "--retry-threshold-ms", "0", *seeds])
    assert "collected 1" in r.stderr  # workload.rs:213-222 quirk


SIDE_FIXTURE = {
    # shape-compatible with the reference fixture
    # tests/resources/default.side.json (store "THE RESULT" -> RESULT)
    "id": "x", "version": "2.0", "name": "test", "url": "http://localhost/",
    "tests": [{"id": "t1", "name": "", "commands": [
        {"id": "c1", "comment": "", "command": "store",
         "target": "THE RESULT", "targets": [], "value": "RESULT"},
    ]}],
    "suites": [], "urls": [], "plugins": [],
}


def test_cli_side_check_file(world_dir, tmp_path):
    # mirrors tests/crawling.rs:25-41 (using_side_file): the stored value
    # must reach stdout and the stats line must still be exact
    d, w = world_dir
    side = tmp_path / "default.side.json"
    side.write_text(json.dumps(SIDE_FIXTURE))
    seeds = [good_seed(w)]
    r = run_cli(["--world", d, "--conformance", "--json",
                 "--check-file", str(side), "--check-file-format", "side",
                 "--retry-threshold-ms", "0", *seeds])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "THE RESULT" in r.stdout
    assert "Statistics: visited" in r.stderr


def test_cli_js_check_file_default_udf_parity(world_dir, tmp_path):
    # a .js check file with the DEFAULT snippet behaves exactly like no
    # check file at all (cfg.rs:344-346) — both emit the page URL
    d, w = world_dir
    js = tmp_path / "check.js"
    js.write_text("return window.location.href")
    seeds = [good_seed(w)]
    r_js = run_cli(["--world", d, "--conformance", "--json",
                    "--check-file", str(js),
                    "--retry-threshold-ms", "0", *seeds])
    r_def = run_cli(["--world", d, "--conformance", "--json",
                     "--retry-threshold-ms", "0", *seeds])
    assert r_js.returncode == r_def.returncode == 0
    assert r_js.stdout == r_def.stdout
    payloads = [json.loads(ln) for ln in r_js.stdout.splitlines()]
    assert payloads and all(
        isinstance(p, str) and p.startswith("https://") for p in payloads)


def test_cli_check_file_format_error(world_dir, tmp_path):
    d, _ = world_dir
    f = tmp_path / "check.txt"
    f.write_text("return 1")
    r = run_cli(["--world", d, "--check-file", str(f), "https://x.example.com/"])
    assert r.returncode != 0
    assert "format" in (r.stderr + r.stdout).lower()
