"""bench.py must be wedge-proof (round-3 verdict weak #1).

The axon tunnel on this rig wedges for hours after a stalled TPU job; the
driver runs ``python bench.py`` exactly once per round.  These tests pin the
orchestration contract: probe before touching the backend, bounded retries,
and on persistent failure ONE parseable JSON line with an ``error`` field
(exit code 0) -- never a raw traceback as the round's only perf record.
"""

from __future__ import annotations

import importlib.util
import json
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


@pytest.fixture()
def bench(monkeypatch):
    monkeypatch.setenv("BENCH_MAX_ATTEMPTS", "3")
    monkeypatch.setenv("BENCH_RETRY_SLEEP", "0")
    spec = importlib.util.spec_from_file_location("bench_mod", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.MAX_ATTEMPTS = 3
    mod.RETRY_SLEEP_S = 0
    return mod


def _last_json(capsys):
    out = capsys.readouterr().out.strip().splitlines()
    return json.loads(out[-1])


def test_persistent_probe_failure_emits_error_json(bench, monkeypatch, capsys):
    calls = {"n": 0}

    def dead_probe():
        calls["n"] += 1
        return False

    monkeypatch.setattr(bench, "_probe", dead_probe)
    rc = bench.orchestrate()
    assert rc == 0, "driver must record rc=0 with a parseable line, not a crash"
    parsed = _last_json(capsys)
    assert "error" in parsed and parsed["value"] == 0.0
    assert parsed["unit"] == "pairs/s/chip"
    assert calls["n"] == 3, "must retry up to MAX_ATTEMPTS"


def test_recovery_after_transient_wedge(bench, monkeypatch, capsys):
    """First probe fails (wedged), second succeeds -> result line printed."""
    seq = iter([False, True])
    monkeypatch.setattr(bench, "_probe", lambda: next(seq))
    monkeypatch.setattr(
        bench,
        "_run_inner",
        lambda: json.dumps(
            {"metric": "m", "value": 25000.0, "unit": "pairs/s/chip", "vs_baseline": 0.5}
        ),
    )
    assert bench.orchestrate() == 0
    parsed = _last_json(capsys)
    assert parsed["value"] == 25000.0 and "error" not in parsed


def test_inner_failure_then_success_retries(bench, monkeypatch, capsys):
    """Probe ok but inner dies mid-run (tunnel wedged during bench) -> retry."""
    monkeypatch.setattr(bench, "_probe", lambda: True)
    seq = iter([None, json.dumps({"metric": "m", "value": 1.0, "unit": "u", "vs_baseline": 0.0})])
    monkeypatch.setattr(bench, "_run_inner", lambda: next(seq))
    assert bench.orchestrate() == 0
    assert _last_json(capsys)["value"] == 1.0


def test_run_inner_extracts_last_json_line(bench, monkeypatch):
    """Inner child may print warnings before the result; take the last JSON."""
    fake = subprocess.CompletedProcess(
        args=[],
        returncode=0,
        stdout="some warning\n{\"not\": \"it\"}\n{\"metric\": \"m\", \"value\": 7.0}\n",
        stderr="",
    )
    monkeypatch.setattr(bench.subprocess, "run", lambda *a, **k: fake)
    line = bench._run_inner()
    assert json.loads(line)["value"] == 7.0


def test_probe_source_is_compile_free():
    """The probe must stay a device_put + fetch: any jnp op is a 1-5 min
    remote compile on this rig and would turn the probe into its own hang."""
    spec = importlib.util.spec_from_file_location("bench_mod2", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert "device_put" in mod._PROBE_SRC
    assert "jnp" not in mod._PROBE_SRC and "jit" not in mod._PROBE_SRC


def test_probe_runs_in_subprocess_on_cpu():
    """End-to-end: the probe child itself works under the CPU backend."""
    res = subprocess.run(
        [sys.executable, "-c",
         "import importlib.util, json, sys; "
         f"spec = importlib.util.spec_from_file_location('b', {str(REPO / 'bench.py')!r}); "
         "m = importlib.util.module_from_spec(spec); spec.loader.exec_module(m); "
         "print('RES', m._probe())"],
        capture_output=True,
        text=True,
        timeout=300,
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "HOME": "/root", "PYTHONPATH": ""},
    )
    assert "RES True" in res.stdout, res.stderr[-500:]
