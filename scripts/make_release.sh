#!/usr/bin/env bash
# Release bundle — the reference cross-builds per-platform archives carrying
# the binary + scene-definitions + resources (/root/reference/.github/
# workflows/release.yaml:35-60). The Python equivalent is platform-neutral:
# one wheel + sdist (the "binary"; the native C++ helper is compiled on
# first import, native.py) plus a scenes+resources asset archive, all under
# dist/.
#
# Usage: bash scripts/make_release.sh [version-tag]
set -euo pipefail
cd "$(dirname "$0")/.."

TAG="${1:-$(python -c 'import tomllib;print(tomllib.load(open("pyproject.toml","rb"))["project"]["version"])')}"
OUT=dist
rm -rf "$OUT" build ./*.egg-info
mkdir -p "$OUT"

echo "=== wheel + sdist ==="
if python -m build --version >/dev/null 2>&1; then
    # --no-isolation: setuptools is available in-environment; isolated
    # builds would try the network.
    python -m build --no-isolation --outdir "$OUT"
else
    # Offline fallback (no `build` package): setuptools' backend directly.
    python - <<'EOF'
from setuptools import build_meta
build_meta.build_sdist("dist")
build_meta.build_wheel("dist")
EOF
fi

echo "=== asset bundle (scene-definitions + resources, release.yaml:41-55) ==="
BUNDLE="gr_raytracer_tpu-${TAG}-assets"
STAGE="$OUT/$BUNDLE"
mkdir -p "$STAGE"
cp -r scene-definitions resources "$STAGE/"
cp README.md docs/examples.md "$STAGE/" 2>/dev/null || true
tar -C "$OUT" -czf "$OUT/$BUNDLE.tar.gz" "$BUNDLE"
rm -rf "$STAGE"

echo "=== contents ==="
ls -l "$OUT"
echo "release $TAG OK"
