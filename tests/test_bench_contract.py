"""Driver-facing bench contract (r5 verdict #1).

The driver captures a bounded TAIL of bench.py stdout and parses the
LAST line as the round's bench record. Round 5 lost its record because
the final line embedded per-query data_metrics and outgrew the window
(BENCH_r05.json `parsed: null`). These tests pin the contract: the
final line is valid JSON, carries the headline fields, and stays well
under 4 KB even with every headline + heavy query populated.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _full_payload(bench) -> dict:
    # Worst realistic case: every headline/heavy query present with
    # full-precision medians and bests, plus the sf matrix.
    medians = {q: 123.4567 for q in bench.HEADLINE}
    heavy = {q: 1234.5678 for q in bench.HEAVY}
    return {
        "metric": "headline_queries_total",
        "value": round(sum(medians.values()), 4),
        "unit": "sec",
        "queries": medians,
        "queries_best": medians,
        "value_best": round(sum(medians.values()), 4),
        "sf": 0.1,
        "sf_matrix": {"0.1": 1234.5678, "0.01": 123.4567},
        "heavy": heavy,
        "heavy_best": heavy,
        "calib_sec": 12.3456,
        "cores": 32,
        "master": "local[32]",
    }


def test_final_line_parses_and_is_compact():
    bench = _bench()
    line = bench._final_line(_full_payload(bench))
    assert "\n" not in line
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total"
    assert parsed["unit"] == "sec"
    assert set(parsed["queries"]) == set(bench.HEADLINE)
    # The host-speed yardstick must ride the driver-facing line (r6
    # verdict #1): it is what separates box slowdowns from code ones.
    assert parsed["calib_sec"] == 12.3456
    # Self-describing parallelism (r9 verdict #3): the record must say
    # what core count it ran with, so overhead-bound per-query ratios
    # can't be misread as $SPARK_GRAFT_CPUS being ignored.
    assert parsed["cores"] == 32
    assert parsed["master"] == "local[32]"
    # Hard size bound with margin: the driver window truncated ~>8 KB
    # lines in r5; we require the whole record to fit in 4 KB.
    assert len(line) < 4096, f"final bench line too large: {len(line)} bytes"


def test_final_line_degrades_rather_than_bloats():
    bench = _bench()
    payload = _full_payload(bench)
    # Simulate a future mistake: someone re-attaches a bulky field.
    payload["queries"] = {f"q_{i:04d}_some_long_operator_name": 1.2345 for i in range(400)}
    line = bench._final_line(payload)
    assert len(line) < 4096
    parsed = json.loads(line)
    # Totals survive even in the degraded record.
    assert parsed["metric"] == "headline_queries_total"
    assert "value" in parsed and "sf" in parsed


def test_bench_stdout_last_line_is_the_headline_record(tmp_path):
    """End-to-end at sf0.001 with a 2-query headline: the LAST stdout
    line is the compact record; data_metrics rides an earlier line.
    bench.py is copied into tmp_path so its side-artifacts
    (BENCH_DELTA.md, BENCH_DATA_METRICS.json) don't touch the repo."""
    import shutil

    bench_copy = tmp_path / "bench.py"
    shutil.copyfile(os.path.join(REPO, "bench.py"), bench_copy)
    code = (
        "import importlib.util, json\n"
        f"spec = importlib.util.spec_from_file_location('bench', {str(bench_copy)!r})\n"
        "bench = importlib.util.module_from_spec(spec)\n"
        "spec.loader.exec_module(bench)\n"
        "bench.HEADLINE = ['q1_pricing_summary', 'dedup_exact']\n"
        "bench.HEAVY = []\n"
        "bench.TIMED_RUNS = 1\n"
        "bench.main()\n"
    )
    env = dict(os.environ, SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001")
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=600,
        check=True,
    ).stdout
    lines = [ln for ln in out.strip().splitlines() if ln.strip()]
    last = json.loads(lines[-1])
    assert last["metric"] == "headline_queries_total"
    assert "data_metrics" not in last
    assert len(lines[-1]) < 4096
    prev = json.loads(lines[-2])
    assert prev["metric"] == "data_metrics"
    # The bulky noise evidence (per-query IQR + calibration probes)
    # rides the data_metrics line, not the driver-facing one.
    assert set(prev["spread"]) == {"q1_pricing_summary", "dedup_exact"}
    assert len(prev["calib_probes"]) == 2
    assert "calib_sec" in last
    assert (tmp_path / "BENCH_DATA_METRICS.json").exists()


def test_delta_verdict_column_is_noise_aware(tmp_path):
    """The BENCH_DELTA.md verdict column flags a ratio only when it
    exceeds both the 10% floor and the run's own relative IQR — a 1.3x
    move inside a huge measured spread must read `~`, and a 1.3x move
    with tight spread must read SLOWER (r6 verdict #1)."""
    bench = _bench()
    prev = {
        "parsed": {
            "metric": "headline_queries_total",
            "sf": 0.1,
            "calib_sec": 1.0,
            "queries": {"tight": 1.0, "noisy": 1.0, "steady": 1.0},
            "heavy": {},
        }
    }
    (tmp_path / "BENCH_r01.json").write_text(json.dumps(prev))
    medians = {"tight": 1.3, "noisy": 1.3, "steady": 1.05}
    bests = {"tight": 1.2, "noisy": 0.9, "steady": 1.0}
    spreads = {"tight": 0.02, "noisy": 0.8, "steady": 0.01}
    bench._write_delta(
        str(tmp_path), medians, bests, {}, 0.1, spreads=spreads, calib=1.2
    )
    text = (tmp_path / "BENCH_DELTA.md").read_text()
    rows = {
        ln.split("|")[1].strip(): ln
        for ln in text.splitlines()
        if ln.startswith("| ")
    }
    assert rows["tight"].rstrip().endswith("SLOWER |")
    assert rows["noisy"].rstrip().endswith("~ |")
    assert rows["steady"].rstrip().endswith("~ |")
    # Host-speed comparison vs the prior round's calibration probe.
    assert "host-speed ratio 1.20x" in text
