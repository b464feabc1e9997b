"""On-TPU kernel verification (auto-skips off-TPU).

tests/conftest.py forces every in-process test onto the virtual CPU mesh,
so the real-hardware check runs tools/tpu_smoke.py in a subprocess with a
clean environment: compiled tiled/online Pallas kernels vs the float64 C++
oracle and the reference sparse golden (see that script's docstring).

Set SKIP_TPU_SMOKE=1 to skip (e.g. when iterating on unrelated code — the
remote compile can take minutes on first run).
"""
import importlib.util
import os
import subprocess
import sys

import pytest

ROOT = os.path.join(os.path.dirname(__file__), os.pardir)
SCRIPT = os.path.join(ROOT, "tools", "tpu_smoke.py")


def _backend_reachable(env, budget=240):
    """bench.py's subprocess probe (single try): a dead/half-dead tunnel
    makes jax backend init hang rather than raise."""
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(ROOT, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    os_env = os.environ.copy()
    os.environ.clear()
    os.environ.update(env)
    try:
        return bench._backend_reachable(budget=budget, tries=1)
    finally:
        os.environ.clear()
        os.environ.update(os_env)


@pytest.mark.skipif(os.environ.get("SKIP_TPU_SMOKE") == "1",
                    reason="SKIP_TPU_SMOKE=1")
def test_tpu_smoke():
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    # A dead/half-dead TPU tunnel makes jax.devices() hang rather than raise,
    # which would otherwise burn the full smoke timeout (30 min). Probe the
    # backend cheaply first and skip fast when it is unreachable.
    if _backend_reachable(env) is None:
        pytest.skip("TPU backend probe failed/timed out — tunnel unreachable")
    try:
        proc = subprocess.run([sys.executable, SCRIPT], capture_output=True,
                              text=True, timeout=1800, env=env)
    except subprocess.TimeoutExpired:
        # a dead TPU tunnel hangs jax backend init indefinitely; that is an
        # infra condition (same class as NO_TPU), not a kernel failure
        pytest.skip("TPU smoke timed out — backend unreachable or "
                    "pathological remote compile")
    sys.stdout.write(proc.stdout)
    sys.stderr.write(proc.stderr)
    if proc.returncode == 3:
        pytest.skip("no TPU available")
    assert proc.returncode == 0, f"TPU smoke failed (rc={proc.returncode})"
