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
