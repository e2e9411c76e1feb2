#!/bin/sh
# One-shot round sign-off: every check the round protocol requires,
# in the order that fails fastest. Run from the repo root on an
# otherwise-idle box (check `uptime` first — bench deltas under load
# are noise, see SCALE.md's bench-history note).
#
#   sh tools/round_signoff.sh            # full protocol (~25 min)
#   sh tools/round_signoff.sh --quick    # skip sf0.1-dependent steps
#
# Exits nonzero on the first failing stage.
set -e
cd "$(dirname "$0")/.."

echo "== 0/5 driver-window composition (50-slot budget) =="
python tools/window_preview.py 2>/dev/null | head -3

echo "== 1/5 pytest =="
python -m pytest tests/ -q -x

echo "== 2/5 oracle gate, sf0.001 (drift-fast SF) =="
python tools/check_oracle.py /root/testdata/sf0.001 2>/dev/null | tail -3

echo "== 3/5 oracle gate, sf0.01 (the driver's SF) =="
python tools/check_oracle.py /root/testdata/sf0.01 2>/dev/null | tail -3

if [ "$1" = "--quick" ]; then
    echo "== quick mode: skipping probes + bench =="
    exit 0
fi

echo "== 4/5 perturbed + skewed corpus probes =="
python tools/drift_probe.py 2>/dev/null | tail -3
python tools/skew_probe.py 2>/dev/null | tail -3

echo "== 5/5 idle-box bench (min-of-3, sf0.1) =="
uptime
python bench.py

echo "== sign-off complete =="
