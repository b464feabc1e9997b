#!/usr/bin/env bash
# CI entry point: everything a clean checkout needs to be trusted.
#
#   tools/ci.sh          # fast suite + golden reproduction (~12 min)
#   tools/ci.sh --full   # + the interpret-mode Pallas kernel suite (~+4 min)
#
# All stages run on CPU (float64, 8 virtual devices); TPU smoke is skipped
# (run tests/test_tpu_smoke.py on a machine with a chip).
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== sdist/wheel build =="
python -m pip wheel --no-deps --no-build-isolation -w /tmp/lws_tpu_wheel . \
    >/dev/null 2>&1 || python -m pip wheel --no-deps -w /tmp/lws_tpu_wheel .
ls /tmp/lws_tpu_wheel/lws_tpu-*.whl

echo "== golden reproduction (reference C core, bit-for-bit) =="
python tools/make_goldens.py --check

echo "== fast suite (CPU, x64, 8 virtual devices) =="
SKIP_TPU_SMOKE=1 python -m pytest tests/ -q --ignore=tests/test_pallas.py

if [[ "${1:-}" == "--full" ]]; then
    echo "== Pallas kernels, interpret mode =="
    python -m pytest tests/test_pallas.py -q -p xdist -n 4 \
        || python -m pytest tests/test_pallas.py -q
fi

echo "CI OK"
