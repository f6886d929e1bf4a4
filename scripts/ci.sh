#!/usr/bin/env bash
# CI entry — the reference's `cargo build && cargo test` equivalent
# (/root/reference/.github/workflows/ci.yaml:20-23), for this repo:
#
#   1. native extension builds (native/gr_native.cpp -> libgr_native.so);
#   2. full pytest suite on the 8-device virtual CPU mesh in f64
#      (tests/conftest.py pins the backend — no TPU required);
#   3. vendored-asset check: every scene TOML parses and the generated
#      resources exist (the release-bundle contents, release.yaml:35-60);
#   4. bench smoke: bench.py's worker on the CPU fallback at a small size —
#      same code path as the scored run, never writes BENCH_r*.json.
#
# Usage: bash scripts/ci.sh [pytest-args...]
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== [1/4] native build ==="
python -c "from gr_raytracer_tpu import native; assert native.available(), 'native build failed'; print('native OK')"

echo "=== [2/4] test suite ==="
python -m pytest tests/ -x -q "$@"

echo "=== [3/4] vendored assets ==="
python - <<'EOF'
import glob, os, sys
sys.path.insert(0, os.getcwd())
from gr_raytracer_tpu import config as cfgmod
scenes = sorted(glob.glob("scene-definitions/*.toml"))
assert len(scenes) >= 14, f"expected >=14 vendored scenes, found {len(scenes)}"
for s in scenes:
    cfgmod.load_config(s)
pngs = glob.glob("resources/*.png")
assert pngs, "no generated resources/*.png"
print(f"assets OK: {len(scenes)} scenes parse, {len(pngs)} textures present")
EOF

echo "=== [4/4] bench smoke (CPU) ==="
JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= GR_BENCH_SIZE=64 GR_BENCH_STEPS=200 \
    python bench.py --worker

echo "CI OK"
