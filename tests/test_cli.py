"""CLI parser parity (reference: cli/cli.rs:115-139) and subcommand smoke
tests that run through main() end-to-end on tiny inputs."""

import numpy as np
import pytest

from gr_raytracer_tpu import cli

SCENE = """
celestial_temperature = 0.0
[celestial_texture.Checker]
beaming_exponent = 0.0
width = 4.0
height = 4.0
color1 = [0, 255, 0]
color2 = [0, 100, 0]
[geometry_type.Euclidean]
[[objects]]
[objects.Sphere]
radius = 2.0
position = [0.0, 0.0, 0.0]
temperature = 0.0
[objects.Sphere.texture.Checker]
beaming_exponent = 0.0
width = 4.0
height = 4.0
color1 = [255, 0, 0]
color2 = [100, 0, 0]
"""


def test_global_defaults():
    args = cli._build_parser().parse_args(["render"])
    assert args.width == 500 and args.height == 500
    assert args.step_size == 0.01
    assert args.max_steps == 20000
    assert args.max_radius == 15000.0
    assert args.epsilon == 1e-5
    assert args.camera_position == "18.0,0.0,0.8"
    assert args.phi == 0.0 and args.theta == 0.0 and args.psi == 0.0
    assert args.tone_mapping == "reinhard"
    assert not args.show_sampling_mask
    assert args.sampling_mask_color == "255,0,255"
    assert args.filename == "render.png"


def test_subcommand_parsing():
    p = cli._build_parser()
    a = p.parse_args(["render-ray", "-r", "3", "-c", "4"])
    assert a.action == "render-ray" and a.row == 3 and a.col == 4
    a = p.parse_args(["render-ray-at", "-p=1,2,3", "-d=0,1,0"])
    assert a.position == "1,2,3" and a.direction == "0,1,0"
    a = p.parse_args(["blackbody", "-t", "5000"])
    assert a.temperature == 5000.0 and a.redshift == 1.0
    a = p.parse_args(["blackbody-spectrum", "--width", "10"])
    assert a.width == 10 and a.min_temperature == 1000.0


def test_floats_rejects_wrong_arity():
    with pytest.raises(SystemExit):
        cli._floats("1,2", 3, "--camera-position")


def test_render_smoke(tmp_path, capsys):
    scene_file = tmp_path / "s.toml"
    scene_file.write_text(SCENE)
    out = tmp_path / "out.png"
    cli.main(
        [
            "--f64",
            "--width", "5", "--height", "5",
            "--max-steps", "500", "--max-radius", "30", "--step-size", "0.1",
            "--camera-position", "10,0,0",
            "-c", str(scene_file),
            "render", "--filename", str(out),
        ]
    )
    assert out.exists()
    from PIL import Image

    img = np.asarray(Image.open(out))
    assert img.shape == (5, 5, 3)
    # Euclidean default facing: center ray hits the red sphere.
    assert img[2, 2, 0] > img[2, 2, 1]


def test_blackbody_smoke(capsys):
    cli.main(["--f64", "blackbody", "-t", "5000"])
    out = capsys.readouterr().out
    assert "sRGB" in out and "XYZ" in out


def test_render_ray_smoke(tmp_path):
    scene_file = tmp_path / "s.toml"
    scene_file.write_text(SCENE)
    out = tmp_path / "ray.csv"
    cli.main(
        [
            "--f64",
            "--width", "5", "--height", "5",
            "--max-steps", "200", "--max-radius", "30", "--step-size", "0.1",
            "--camera-position", "10,0,0",
            "-c", str(scene_file),
            "render-ray", "-r", "2", "-c", "2", "--filename", str(out),
        ]
    )
    lines = out.read_text().strip().split("\n")
    assert lines[0] == "i,t,tau,x,y,z"
    assert len(lines) > 2


GEOMETRY_BLOCKS = {
    "euclidean": "[geometry_type.Euclidean]",
    "schwarzschild": "[geometry_type.Schwarzschild]\nradius = 1.0\nhorizon_epsilon = 1e-5",
    "kerr": "[geometry_type.Kerr]\nradius = 1.0\na = 0.5\nhorizon_epsilon = 1e-5",
    "kerr_bl": "[geometry_type.KerrBL]\nradius = 1.0\na = 0.5\nhorizon_epsilon = 1e-5",
}


@pytest.mark.parametrize("geometry", sorted(GEOMETRY_BLOCKS))
def test_render_ray_at(tmp_path, geometry):
    """render-ray-at writes an `i,t,tau,x,y,z` CSV with one row per step + 1
    from an arbitrary Cartesian position/direction, for every geometry's CLI
    adapter (cli/kerr.rs:113-153, cli/schwarzschild.rs, cli/kerr_bl.rs)."""
    scene_file = tmp_path / "s.toml"
    scene_file.write_text(
        "celestial_temperature = 0.0\n"
        "[celestial_texture.Checker]\n"
        "beaming_exponent = 0.0\nwidth = 4.0\nheight = 4.0\n"
        "color1 = [0, 255, 0]\ncolor2 = [0, 100, 0]\n"
        + GEOMETRY_BLOCKS[geometry] + "\n"
    )
    out = tmp_path / "ray.csv"
    cli.main(
        [
            "--f64",
            "--max-steps", "10", "--max-radius", "20", "--step-size", "0.01",
            "-c", str(scene_file),
            "render-ray-at",
            "-p", "0,4,-18",
            "-d", "0,1,0",
            "--filename", str(out),
        ]
    )
    lines = out.read_text().strip().split("\n")
    assert lines[0] == "i,t,tau,x,y,z"
    # 10-step budget, ray starts far from everything: header + <= 11 rows,
    # all finite Cartesian coordinates.
    assert 2 <= len(lines) <= 12
    for line in lines[1:]:
        vals = [float(v) for v in line.split(",")]
        assert len(vals) == 6 and np.isfinite(vals).all()
    first = [float(v) for v in lines[1].split(",")]
    last = [float(v) for v in lines[-1].split(",")]
    if geometry in ("kerr_bl", "schwarzschild"):
        # Reference-faithful quirks: the KerrBL adapter treats direction
        # components as raw tetrad-axis coefficients (cli/kerr_bl.rs:88-107)
        # — axis y is the Gram-Schmidt θ̂, pointing toward −y_world at
        # (0, 4, −18); and the Schwarzschild adapter's (φ̂, −θ̂, −r̂)
        # projection (cli/schwarzschild.rs:96-112) is applied to a tetrad
        # whose axes are (φ̂, +θ̂, +r̂) (schwarzschild.rs:116-132), so the
        # spatial part comes out NEGATED relative to the requested world
        # direction. Both reproduced exactly.
        assert last[4] < first[4]
    else:
        # Euclidean/Kerr Cartesian adapters give world-direction semantics.
        assert last[4] > first[4]


def test_render_devices_flag_matches_single_device(tmp_path):
    """`--devices 0` shards each ray chunk over all (virtual) local devices;
    the image must match the single-device render exactly — rays are a pure
    batch axis, so GSPMD partitioning inserts no collectives and no
    reordering (the multi-chip analog of RAYON_NUM_THREADS)."""
    scene_file = tmp_path / "s.toml"
    scene_file.write_text(SCENE)
    common = [
        "--f64",
        "--width", "6", "--height", "6",
        "--max-steps", "300", "--max-radius", "30", "--step-size", "0.1",
        "--camera-position", "10,0,0",
        "-c", str(scene_file),
    ]
    out1 = tmp_path / "one.png"
    outn = tmp_path / "many.png"
    cli.main(common + ["render", "--filename", str(out1)])
    cli.main(common[:1] + ["--devices", "0"] + common[1:] + ["render", "--filename", str(outn)])
    from PIL import Image

    a = np.asarray(Image.open(out1))
    b = np.asarray(Image.open(outn))
    np.testing.assert_array_equal(a, b)


def test_blackbody_spectrum_smoke(tmp_path):
    """blackbody-spectrum writes a T (x-axis) × z (y-axis) image
    (cli/blackbody.rs:30-95): hotter columns shift toward blue, so the
    blue/red balance must grow left → right along a row."""
    out = tmp_path / "spec.png"
    cli.main(
        [
            "--f64",
            "blackbody-spectrum",
            "--width", "8", "--height", "6",
            "--min-temperature", "1000", "--max-temperature", "10000",
            "--min-redshift", "0.5", "--max-redshift", "2.0",
            "-f", str(out),
        ]
    )
    from PIL import Image

    img = np.asarray(Image.open(out)).astype(np.int32)
    assert img.shape[:2] == (6, 8)
    row = img[3]
    assert row[0, 0] > row[0, 2]  # cool end: red over blue
    assert (row[-1, 2] - row[-1, 0]) > (row[0, 2] - row[0, 0])  # hotter -> bluer


def test_render_checkpoint_flag(tmp_path):
    """--checkpoint writes resumable chunk files during the render, produces
    the same image, and removes them after a successful save."""
    scene_file = tmp_path / "s.toml"
    scene_file.write_text(SCENE)
    common = [
        "--f64",
        "--width", "6", "--height", "6",
        "--max-steps", "300", "--max-radius", "30", "--step-size", "0.1",
        "--camera-position", "10,0,0",
        "-c", str(scene_file),
    ]
    plain = tmp_path / "plain.png"
    ck = tmp_path / "ck.png"
    cli.main(common + ["render", "--filename", str(plain)])
    cli.main(common + ["render", "--filename", str(ck), "--checkpoint"])
    from PIL import Image

    np.testing.assert_array_equal(np.asarray(Image.open(plain)), np.asarray(Image.open(ck)))
    assert not (tmp_path / "ck.png.pass1.npz").exists()
    assert not (tmp_path / "ck.png.aa.npz").exists()


def test_render_profile_flag(tmp_path):
    """--profile DIR captures a jax.profiler trace of the render."""
    scene_file = tmp_path / "s.toml"
    scene_file.write_text(SCENE)
    prof = tmp_path / "trace"
    cli.main(
        [
            "--f64",
            "--width", "4", "--height", "4",
            "--max-steps", "100", "--max-radius", "30", "--step-size", "0.1",
            "--camera-position", "10,0,0",
            "--profile", str(prof),
            "-c", str(scene_file),
            "render", "--filename", str(tmp_path / "out.png"),
        ]
    )
    traces = list(prof.rglob("*.trace.json.gz")) + list(prof.rglob("*.xplane.pb"))
    assert traces, f"no profiler artifacts under {prof}"


NO_AA_SCENE = SCENE + """
[adaptive_sampling]
enabled = false
"""


def test_raw_section_stitch_matches_full_render(tmp_path):
    """Two half-frame --raw-section renders stitched equal the full render
    bit-for-bit — including under the frame-GLOBAL global-linear tone map,
    which the reference's external PNG-crop stitching cannot reproduce
    (cli/cli.rs:66-73, configuration.rs:30-36 seam caveat). AA is disabled:
    its 8-neighbor stencil needs a halo at section seams (same documented
    seam behavior as the reference)."""
    scene_file = tmp_path / "s.toml"
    scene_file.write_text(NO_AA_SCENE)
    common = [
        "--f64",
        "--width", "8", "--height", "8",
        "--max-steps", "300", "--max-radius", "30", "--step-size", "0.1",
        "--camera-position", "10,0,0",
        "--tone-mapping", "global-linear",
        "-c", str(scene_file),
    ]
    full = tmp_path / "full.png"
    cli.main(common + ["render", "--filename", str(full)])

    top = tmp_path / "top.npz"
    bottom = tmp_path / "bottom.npz"
    cli.main(common + ["render", "--to-row", "4", "--raw-section", str(top)])
    cli.main(common + ["render", "--from-row", "4", "--raw-section", str(bottom)])

    stitched = tmp_path / "stitched.png"
    cli.main(common + ["stitch", str(top), str(bottom), "--filename", str(stitched)])

    from PIL import Image

    np.testing.assert_array_equal(
        np.asarray(Image.open(full)), np.asarray(Image.open(stitched))
    )


def test_stitch_warns_on_gaps(tmp_path, capsys):
    scene_file = tmp_path / "s.toml"
    scene_file.write_text(NO_AA_SCENE)
    common = [
        "--f64",
        "--width", "8", "--height", "8",
        "--max-steps", "200", "--max-radius", "30", "--step-size", "0.1",
        "--camera-position", "10,0,0",
        "-c", str(scene_file),
    ]
    top = tmp_path / "top.npz"
    cli.main(common + ["render", "--to-row", "4", "--raw-section", str(top)])
    out = tmp_path / "partial.png"
    cli.main(common + ["stitch", str(top), "--filename", str(out)])
    err = capsys.readouterr().err
    assert "32 pixels uncovered" in err
    assert out.exists()
