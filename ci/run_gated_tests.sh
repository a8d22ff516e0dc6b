#!/usr/bin/env bash
# Run the optional-dependency-gated test paths (ROADMAP #7).
#
# The interop bridges (arviz / pymc / bridgestan) and the torch autodiff
# backend are developed against the pinned upstream API surface recorded
# in mici_tpu.interop.EXTERNAL_API_CONTRACT; their tests skip when a
# package is absent.  This script reports which optional packages are
# importable, then runs every gated test module so the real-library paths
# execute the moment the packages exist.  Exits non-zero if any test
# fails (skips are fine and are listed in the summary).
#
# Usage: ci/run_gated_tests.sh [extra pytest args...]
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== optional package availability =="
python - <<'EOF'
import importlib.util

for pkg in ("arviz", "pymc", "bridgestan", "torch", "xxhash"):
    state = "present" if importlib.util.find_spec(pkg) else "ABSENT (tests will skip)"
    print(f"  {pkg:12s} {state}")
EOF

echo "== gated test modules =="
exec python -m pytest -rs -q \
    tests/test_interop.py \
    tests/test_autodiff.py \
    tests/test_utils.py \
    "$@"
