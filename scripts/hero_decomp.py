"""Hero-#5 per-phase decomposition at HEAD -> docs/hero5_decomp.json.

Runs the 300x300 hero-camera slice of kerr-volumetric-streaky (the same
probe workload the r4/r5 driver work was steered by) through the shipped
CLI with GR_SPLIT_TIMING=1, twice:

  fused    the r5 production driver (fast_path.make_fast_vol_fused_tracer:
           geo pass + compaction + device sort + raymarch + fold in ONE
           jit; only the folded ~1 MB wire crosses the tunnel). Phases:
           fused_drain = per-chunk device_get (device compute not hidden
           by the dispatch pipeline + wire transfer).
  compact  the r4 driver (GR_COMPACT_FUSED=0): compact geometric wire +
           host-side sort + re-upload raymarch batches. Phases:
           geo_drain / sort / rm_dispatch / rm_fetch / scatter / fold.

Each config runs twice; the second (warm, compile-cached) run is the one
recorded. The delta between the two configs' phase tables is the measured
account of WHAT fusing removed (r4 verdict weak #5: "the next binding
term is unmeasured").

Usage: python scripts/hero_decomp.py [SIZE]
"""

import ast
import json
import re
import os
import subprocess
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
SIZE = int(sys.argv[1]) if len(sys.argv) > 1 else 300
OUT = os.environ.get("GR_DECOMP_OUT", os.path.join(REPO, "docs", "hero5_decomp.json"))

CMD = [
    sys.executable, "-m", "gr_raytracer_tpu",
    "--width", str(SIZE), "--height", str(SIZE), "--max-steps", "20000",
    "--camera-position=-10,0,-0.5", "--theta=1.52", "--psi=-1.57",
    "-c", os.path.join(REPO, "scene-definitions", "kerr-volumetric-streaky.toml"),
    "render", "--filename", f"/tmp/hero_decomp_{SIZE}.hdr",
]


def run_once(env_extra):
    env = dict(os.environ, GR_SPLIT_TIMING="1", **env_extra)
    t0 = time.perf_counter()
    p = subprocess.run(CMD, cwd=REPO, env=env, capture_output=True, text=True)
    wall = time.perf_counter() - t0
    if p.returncode != 0:
        sys.stderr.write(p.stderr[-2000:])
        raise SystemExit(f"render failed rc={p.returncode}")
    timing = {}
    elapsed = saved = None
    for line in p.stderr.splitlines():
        if line.startswith("[split-timing] "):
            timing = ast.literal_eval(line[len("[split-timing] "):])
        m = re.match(r"elapsed: ([0-9.]+)s", line)
        if m:
            elapsed = float(m.group(1))
    for line in p.stdout.splitlines():
        m = re.search(r"saved image to .* \(([0-9.]+)s\)", line)
        if m:
            saved = float(m.group(1))
    return wall, timing, elapsed, saved


def run_config(name, env_extra):
    cold_wall = run_once(env_extra)[0]
    warm_wall, timing, elapsed, saved = run_once(env_extra)
    phases = {
        k: round(v, 3)
        for k, v in timing.items()
        if not k.startswith(("n_", "max_"))
    }
    counts = {k: round(v, 3) if isinstance(v, float) else v
              for k, v in timing.items() if k.startswith(("n_", "max_"))}
    acc = sum(v for k, v in phases.items() if k not in ("rm_batches", "rm_lanes"))
    rec = {
        "cold_wall_s": round(cold_wall, 1),
        "warm_wall_s": round(warm_wall, 1),
        # process startup (imports + jax/tunnel init): wall - CLI 'elapsed'
        "startup_s": round(warm_wall - elapsed, 1) if elapsed else None,
        # scene build + tracer-cache setup: 'elapsed' - render+write span
        "scene_build_s": round(elapsed - saved, 1) if elapsed and saved else None,
        "render_write_s": saved,
        "phases_s": phases,
        "phase_counts": counts,
        "phases_total_s": round(acc, 2),
        "unattributed_s": round((saved or warm_wall) - acc, 2),
    }
    print(f"[{name}] warm {warm_wall:.1f}s phases {phases}", flush=True)
    return rec


def main():
    import jax

    commit = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=REPO,
        capture_output=True, text=True,
    ).stdout.strip()
    rec = {
        "scene": f"kerr-volumetric-streaky.toml {SIZE}x{SIZE} hero camera, 4x4 adaptive AA",
        "backend": jax.default_backend(),
        "commit": commit,
        "note": (
            "warm-run per-phase wall clock through the shipped CLI "
            "(GR_SPLIT_TIMING=1); 'unattributed' = camera/jitter/AA "
            "selection/tone-map/IO + dispatch enqueue time outside the "
            "accounted drains. The fused driver's single phase replaces "
            "the compact driver's geo_drain+sort+rm_dispatch+rm_fetch+"
            "scatter+fold."
        ),
    }
    import os as _os
    cfgs = _os.environ.get("GR_DECOMP_CONFIGS", "fused,compact_r4").split(",")
    if "fused" in cfgs:
        rec["fused"] = run_config("fused", {})
    if "compact_r4" in cfgs:
        rec["compact_r4"] = run_config("compact_r4", {"GR_COMPACT_FUSED": "0"})
    with open(OUT, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
