"""Driver-harness robustness: bench fallback contract + runnable examples.

The driver runs bench.py unattended at round end; a dead TPU tunnel makes
JAX backend init hang rather than raise, so bench must emit its one-JSON-line
contract from the last committed numbers instead of hanging (observed live
during a tunnel outage).
"""
import importlib.util
import json
import os
import subprocess
import sys

ROOT = os.path.join(os.path.dirname(__file__), os.pardir)


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_stale_fallback_contract(capsys):
    bench = _load_bench()
    bench._stale_fallback()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["metric"] == "audio_seconds_per_second_per_chip"
    assert d["unit"] == "audio-s/s/chip"
    assert d["stale"] is True
    # the committed BENCHMARKS.md must parse: all configs present, positive
    for name in ("batch", "pipeline", "online", "vocoder", "longform"):
        assert d["configs"].get(name, 0) > 0, f"config {name} missing/zero"
    assert d["value"] == d["configs"]["batch"]
    assert abs(d["vs_baseline"] - d["value"] / 100.0) < 1e-6


def test_bench_stale_fallback_single_config(capsys):
    """--config N during an outage must keep the single-config contract:
    name-prefixed metric, no vs_baseline (never the wrong headline)."""
    bench = _load_bench()
    bench._stale_fallback(3)
    line = capsys.readouterr().out.strip().splitlines()[-1]
    d = json.loads(line)
    assert d["metric"] == "online_audio_seconds_per_second_per_chip"
    assert d["vs_baseline"] is None
    assert list(d["configs"]) == ["online"]
    assert d["stale"] is True


def test_multichip_example_runs():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # force the CPU backend path
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", "multichip.py")],
        capture_output=True, text=True, timeout=600, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "data-parallel run_lws" in proc.stdout
    assert "time-sharded batch_lws" in proc.stdout


def test_bench_row_json_subprocess_roundtrip():
    """The full-suite streaming isolation (bench._row_subprocess) depends on
    `--config N --row-json` emitting a parseable row dict on stdout; pin the
    contract on the CPU backend with the cheapest config (3, online)."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py"),
         "--config", "3", "--row-json"],
        capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    row = json.loads(proc.stdout.strip().splitlines()[-1])
    assert row["name"] == "online"
    assert row["audio_s"] > 0 and row["wall"] > 0
    assert len(row["shape"]) == 3 and len(row["cons"]) == 2
