"""Entry-path tests for the driver gates.

Round 3 shipped with ``python bench.py`` crashing (a ``main`` ->
``_run`` rename left the ``__main__`` guard dangling, VERDICT r3
weak #1).  These tests execute the actual module entry paths so a
rename/refactor can never again ship a crashing gate:

* ``bench.py`` is executed as ``__main__`` with ``--dry-parse`` (no JAX
  work) — this exercises the same guard the driver runs.
* ``main()`` is called with ``_run`` monkeypatched, proving the parsed
  batch reaches the benchmark body and its return value propagates.
* ``__graft_entry__.dryrun_multichip`` is importable and the phase list
  used by the budget logic matches the phase functions that exist.
"""

from __future__ import annotations

import runpy
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_bench_main_guard_dry_parse():
    """Run bench.py exactly as the driver does (fresh interpreter)."""
    proc = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--dry-parse"],
        capture_output=True,
        text=True,
        timeout=120,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr


def test_bench_main_calls_run(monkeypatch):
    sys.path.insert(0, str(REPO))
    import bench

    calls = {}

    def fake_run(batch):
        calls["batch"] = batch
        return 123.0

    monkeypatch.setattr(bench, "_run", fake_run)
    fps = bench.main(["--batch", "3"])
    assert calls["batch"] == 3
    assert fps == 123.0

    # Default batch comes from the env/2 fallback.
    monkeypatch.delenv("RV3D_BENCH_BATCH", raising=False)
    bench.main([])
    assert calls["batch"] == 2


def test_bench_module_exec_path(monkeypatch):
    """Execute the module body under __main__ semantics (dry parse)."""
    monkeypatch.setattr(sys, "argv", ["bench.py", "--dry-parse"])
    runpy.run_path(str(REPO / "bench.py"), run_name="__main__")


def test_graft_entry_has_gate_functions():
    sys.path.insert(0, str(REPO))
    import __graft_entry__ as ge

    assert callable(ge.entry)
    assert callable(ge.dryrun_multichip)
    # Budget/phase machinery: every phase the driver prints must exist.
    for name in ge.DRYRUN_PHASES:
        assert callable(getattr(ge, name)), name
