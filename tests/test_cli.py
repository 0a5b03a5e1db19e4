"""CLI tests — usage errors exit fast (no Spark session); one end-to-end
subprocess run covers the happy path (exit codes mirror the reference:
0 all passed, 1 any FAILED, 2 usage error)."""

from __future__ import annotations

import json
import subprocess
import sys

import pytest

CLI = [sys.executable, "-m", "validatelite_spark.cli"]


def run_cli(*args: str, timeout: int = 300):
    return subprocess.run([*CLI, *args], capture_output=True, text=True,
                          timeout=timeout, cwd="/root/repo")


class TestUsageErrors:
    def test_no_rules(self):
        p = run_cli("check", "/root/testdata/sf0.001/documents.parquet",
                    timeout=60)
        assert p.returncode == 2
        assert "no rules" in p.stderr

    def test_bad_rule_expression(self):
        p = run_cli("check", "/root/testdata/sf0.001/documents.parquet",
                    "--rule", "frobnicate(x)", timeout=60)
        assert p.returncode == 2
        assert "frobnicate" in p.stderr


@pytest.mark.slow
class TestEndToEnd:
    def test_check_json_output_and_exit_code(self):
        p = run_cli("--cpus", "4", "check",
                    "/root/testdata/sf0.001/documents.parquet",
                    "--rule", "not_null(text)",
                    "--rule", "range(n_chars,100,400)",
                    "--json")
        assert p.returncode == 1, p.stderr[-2000:]  # range rule FAILS
        payload = json.loads(p.stdout.strip().splitlines()[-1])
        assert payload["summary"]["failed"] == 1
        by_name = {r["rule_name"]: r for r in payload["results"]}
        assert by_name["not_null_text"]["status"] == "PASSED"
        assert by_name["range_n_chars"]["failed_records"] == 206
