"""bench.py stdout contract: ONE json.loads-able line, no matter what fails.

Round-4 post-mortem: cfg5's XLA OOM dump (~15 KB) was embedded verbatim in
the final JSON line, blowing past the driver's tail-capture window so
BENCH_r04.json shipped `parsed: null`. These tests pin the fix: error
strings are truncated to <=200 chars and every main() exit path prints a
single parseable JSON object (reference metric machinery:
advance_timestep.f90:150-166)."""
import io
import json
import os
import subprocess
import sys

import bench


def test_short_err_bounds_and_one_line():
    e = RuntimeError("Ran out of memory in hbm\n" + "x" * 50000)
    s = bench._short_err(e)
    assert len(s) <= 203
    assert "\n" not in s
    assert bench._is_oom(e)
    assert not bench._is_oom(ValueError("bad shape"))


def test_main_stdout_single_json_line_on_failure(tmp_path, monkeypatch):
    """Force every config to raise a huge error; stdout must still be one
    parseable JSON line."""
    big = "Ran out of memory in hbm. " + "=" * 20000

    def boom(*a, **k):
        raise RuntimeError(big)

    monkeypatch.setattr(bench, "bench_single", boom)
    monkeypatch.setattr(bench, "bench_ml_fixed", boom)
    monkeypatch.setattr(bench, "bench_ml_regrid", boom)
    # cfg5 runs in subprocesses; fake the spawn so the unit test stays
    # hermetic while exercising the result-parsing/error-bounding path
    fake = type("P", (), {
        "stdout": json.dumps(
            {"error": bench._short_err(RuntimeError(big))}) + "\n",
        "stderr": ""})()
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: fake)
    monkeypatch.setenv("BENCH_CONFIGS", "cfg1,cfg5")
    monkeypatch.setenv("BENCH_OUT_DIR", str(tmp_path))
    monkeypatch.chdir(tmp_path)

    cap = io.StringIO()
    old = sys.stdout
    sys.stdout = cap
    try:
        bench.main()
    finally:
        sys.stdout = old

    lines = [ln for ln in cap.getvalue().splitlines() if ln.strip()]
    assert len(lines) == 1, lines
    obj = json.loads(lines[0])
    assert "value" in obj and "vs_baseline" in obj
    # every embedded error is bounded
    for r in obj.get("configs", {}).values():
        if "error" in r:
            assert len(r["error"]) <= 203
    assert len(lines[0]) < 8000
