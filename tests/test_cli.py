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


def test_cli_scaled_crawl_with_filters(world_dir, tmp_path):
    d, w = world_dir
    seeds = w.seeds.column("url").to_pylist()
    r = run_cli(["--world", d, "--json", "--retry-threshold-ms", "0",
                 "-j", "2", "-f", "domain=h000.example.com",
                 "--out", str(tmp_path / "out"), "--num-cpus", "4", *seeds])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Statistics: visited" in r.stderr
    # domain filter: everything crawled is on the allowed host
    for ln in r.stdout.splitlines():
        payload = json.loads(ln)
        if isinstance(payload, dict) and "u" in payload:
            assert "h000.example.com" in payload["u"]


def test_cli_limit_zero_quirk(world_dir, tmp_path):
    d, w = world_dir
    seeds = w.seeds.column("url").to_pylist()
    r = run_cli(["--world", d, "--conformance", "--limit", "0",
                 "--retry-threshold-ms", "0", *seeds])
    assert "collected 1" in r.stderr  # workload.rs:213-222 quirk
