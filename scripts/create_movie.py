"""Assemble rendered frames into a movie (MP4 via ffmpeg, else animated GIF).

The reference's scripts/Readme.md names ffmpeg/ImageMagick batch scripts
(create_movie_from_images.sh, create_kerr_images.sh) that are not in its
checkout; this is the frames→movie convenience for this repo's sequence
generators (scripts/camera_flythrough.py, scripts/kerr_spin_sweep.py):

    python scripts/camera_flythrough.py --out-dir frames/
    python scripts/create_movie.py "frames/*.png" flythrough.mp4 --fps 24

Prefers ffmpeg (H.264, yuv420p for player compatibility); falls back to a
PIL animated GIF when ffmpeg is unavailable — no hard dependency either way.
"""

from __future__ import annotations

import argparse
import glob
import os
import shutil
import subprocess
import sys


def make_movie(pattern: str, out: str, fps: int = 24) -> str:
    frames = sorted(glob.glob(pattern))
    if not frames:
        raise SystemExit(f"no frames match {pattern!r}")
    ffmpeg = shutil.which("ffmpeg")
    if ffmpeg and out.lower().endswith((".mp4", ".mkv", ".webm")):
        # Feed an explicit concat list so arbitrary (sorted) names work.
        list_path = out + ".frames.txt"
        with open(list_path, "w") as f:
            for p in frames:
                f.write(f"file '{os.path.abspath(p)}'\nduration {1.0 / fps}\n")
            f.write(f"file '{os.path.abspath(frames[-1])}'\n")
        try:
            subprocess.run(
                [
                    ffmpeg, "-y", "-f", "concat", "-safe", "0", "-i", list_path,
                    "-vf", "pad=ceil(iw/2)*2:ceil(ih/2)*2",
                    "-c:v", "libx264", "-pix_fmt", "yuv420p", "-r", str(fps), out,
                ],
                check=True,
                capture_output=True,
            )
        finally:
            os.unlink(list_path)
        return out
    # GIF fallback (also used for .gif outputs).
    from PIL import Image

    if not out.lower().endswith(".gif"):
        out = os.path.splitext(out)[0] + ".gif"
        print(f"ffmpeg unavailable or non-video suffix; writing {out}", file=sys.stderr)
    images = [Image.open(p).convert("RGB") for p in frames]
    images[0].save(
        out,
        save_all=True,
        append_images=images[1:],
        duration=int(1000 / fps),
        loop=0,
    )
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("pattern", help="frame glob, e.g. 'frames/*.png' (quote it)")
    ap.add_argument("out", help="output movie (.mp4 with ffmpeg, else .gif)")
    ap.add_argument("--fps", type=int, default=24)
    args = ap.parse_args()
    path = make_movie(args.pattern, args.out, args.fps)
    print(f"wrote {path} ({len(sorted(glob.glob(args.pattern)))} frames)")


if __name__ == "__main__":
    main()
