#!/bin/bash
# On-chip validation sequence for a fresh TPU session (run after the tunnel
# recovers and `python bench.py --warm` has populated .jax_cache).
#
#   bash scripts/tpu_session.sh [logdir]
#
# 1. bench.py            -> rays/s JSON (expect >= ~707k, BASELINE.md r2)
# 2. hero #4             -> kerr 1000x1000 @ 1e6 steps (224 s r2 baseline)
# 3. GR_LANE_TILE sweep  -> 1024 (default) vs 2048 vs 4096 on the bench
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_session}
mkdir -p "$LOG"

echo "== bench =="
timeout 3600 python bench.py 2>"$LOG/bench.err" | tee "$LOG/bench.json"

echo "== hero #4 (kerr 1000x1000 @ 1e6 steps) =="
timeout 3600 python -m gr_raytracer_tpu --width=1000 --height=1000 \
  --max-steps=1000000 --camera-position=-10,0,-0.5 --theta=1.52 \
  --psi=-1.57 --phi=0 -c scene-definitions/kerr.toml \
  render --filename "$LOG/render-kerr-1000.png" --checkpoint 2>&1 | tail -3 | tee "$LOG/hero4.log"

echo "== profiled 256^2 flagship (Perfetto trace for roofline analysis) =="
timeout 1800 python -m gr_raytracer_tpu --width=256 --height=256 \
  --max-steps=2000 --camera-position=-10,0,-0.5 --theta=1.52 --psi=-1.57 \
  -c scene-definitions/kerr.toml --profile "$LOG/trace" \
  render --filename "$LOG/render-kerr-256.png" 2>&1 | tail -2

echo "== lane-tile sweep =="
for t in 1024 2048 4096; do
  echo "-- GR_LANE_TILE=$t"
  GR_LANE_TILE=$t timeout 3600 python bench.py 2>"$LOG/bench_tile$t.err" \
    | tee "$LOG/bench_tile$t.json"
done
echo "done; logs in $LOG"
