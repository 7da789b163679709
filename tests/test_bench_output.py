"""The driver's bench capture keeps only a 2,000-char stdout TAIL and
JSON-parses it. These tests pin the bench emit contract: the final stdout
line must stay under that cap no matter how many queries are timed, and
the full result must land in BENCH_local.json."""

import importlib.util
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load_bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _fake_result(n_queries: int) -> dict:
    return {
        "metric": "pipeline_docs_per_sec",
        "value": 4547.0,
        "unit": "docs/sec",
        "queries": {
            f"some_fairly_long_query_name_{i:03d}": round(0.1 * i, 3)
            for i in range(n_queries)
        },
        "sf": 0.1,
        "bench_pages": 100000,
        "pipeline_mb_per_sec": 3.89,
        "sketch_mb_per_sec": 30.979,
        "kernel_mb_per_sec_single_core": 3.652,
        "hw_probe_mb_per_sec": {"1": 12.1, "4": 43.1},
        "hw_probe_end_mb_per_sec": {"1": 10.9},
        "recovery_gaps": {
            "after_headline": {"waited_sec": 0, "probes": [14.1]},
            "mid_queries": {"waited_sec": 0, "probes": [14.8]},
        },
        "cpus": 32,
    }


def test_stdout_line_fits_driver_tail_and_parses(capsys, tmp_path):
    bench = _load_bench()
    # 200 queries is ~3x the current registry — the cap must hold
    for n in (10, 76, 200):
        bench._emit_result(_fake_result(n), out_dir=tmp_path)
        line = capsys.readouterr().out.strip().splitlines()[-1]
        assert len(line) < 2000, (n, len(line))
        parsed = json.loads(line)
        assert parsed["metric"] == "pipeline_docs_per_sec"
        assert parsed["value"] == 4547.0
        assert parsed["queries"]
        omitted = parsed.get("queries_omitted", 0)
        assert len(parsed["queries"]) + omitted == n
        # full result on disk, untruncated
        full = json.loads((tmp_path / "BENCH_local.json").read_text())
        assert len(full["queries"]) == n
        assert full["recovery_gaps"]["after_headline"]["probes"] == [14.1]


def test_emit_result_keeps_headline_order(capsys, tmp_path):
    bench = _load_bench()
    res = _fake_result(200)
    bench._emit_result(res, out_dir=tmp_path)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    kept = list(json.loads(line)["queries"])
    # insertion order preserved: the first timed entries (headline
    # pipeline stages) survive the cap, tail entries are the ones dropped
    assert kept == list(res["queries"])[: len(kept)]
