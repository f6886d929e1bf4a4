"""Native runtime library: build, and parity of every entry point with the
pure-Python fallbacks (jitter bit-exact; PNG decodes; RGBE matches; CSV
schema)."""

import io

import numpy as np
import pytest

from gr_raytracer_tpu import native
from gr_raytracer_tpu.rendering import raytracer as rt


@pytest.fixture(scope="module", autouse=True)
def require_native():
    assert native.available(), "native library failed to build (g++/zlib missing?)"


def test_stratified_offsets_bit_exact_vs_python():
    rows = np.array([17, 3, 250], np.int64)
    cols = np.array([23, 99, 0], np.int64)
    dx_n, dy_n = native.stratified_offsets(rows, cols, 4)
    dx_p, dy_p = rt.stratified_sample_offsets(rows, cols, 4)
    np.testing.assert_array_equal(dx_n, dx_p)
    np.testing.assert_array_equal(dy_n, dy_p)


def test_png_encode_roundtrip():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, size=(13, 17, 3), dtype=np.uint8)
    data = native.png_encode(img)
    assert data is not None and data[:8] == b"\x89PNG\r\n\x1a\n"
    from PIL import Image

    decoded = np.asarray(Image.open(io.BytesIO(data)))
    np.testing.assert_array_equal(decoded, img)


def test_rgbe_encode_matches_decode():
    rgb = np.array(
        [[[0.5, 1.0, 2.0], [0.0, 0.0, 0.0]], [[100.0, 10.0, 1.0], [1e-38, 0.0, 0.0]]],
        np.float32,
    )
    rgbe = native.rgbe_encode(rgb)
    exp = rgbe[..., 3].astype(np.int32) - 128
    scale = np.where(rgbe[..., 3] > 0, np.ldexp(1.0, exp - 8), 0.0)
    decoded = rgbe[..., :3] * scale[..., None]
    np.testing.assert_allclose(decoded[0, 0], rgb[0, 0], rtol=0.01)
    np.testing.assert_allclose(decoded[1, 0], rgb[1, 0], rtol=0.01)
    assert (decoded[0, 1] == 0).all() and (decoded[1, 1] == 0).all()


def test_trajectory_csv_schema():
    steps = np.arange(3, dtype=np.int64)
    affine = np.array([0.0, 0.5, 1.0])
    cart = np.arange(12, dtype=np.float64).reshape(3, 4)
    text = native.trajectory_csv(steps, affine, cart)
    lines = text.strip().split("\n")
    assert lines[0] == "i,t,tau,x,y,z"
    assert len(lines) == 4
    parts = lines[2].split(",")
    assert int(parts[0]) == 1
    np.testing.assert_allclose([float(v) for v in parts[1:]], [0.5, 4.0, 5.0, 6.0, 7.0])


def test_write_image_png_via_native(tmp_path):
    color = np.random.RandomState(1).uniform(0, 2, size=(9, 7, 4))
    path = str(tmp_path / "out.png")
    rt.write_image(path, color)
    from PIL import Image

    img = np.asarray(Image.open(path))
    assert img.shape == (9, 7, 3)


def test_png_decode_matches_pil_and_roundtrip(tmp_path):
    """The native PNG decoder (the data-loader side of the native runtime)
    is byte-exact vs PIL on every reference texture format (8-bit RGB/RGBA/
    gray/palette/gray+alpha, interlace 0) and round-trips our own encoder."""
    import glob
    import io

    from PIL import Image

    if not native.available():
        pytest.skip("native toolchain unavailable")
    from gr_raytracer_tpu.utils import assets

    paths = sorted(glob.glob(assets.resources_dir() + "/*.png"))
    assert len(paths) >= 9, f"resource assets missing: {assets.resources_dir()}"
    for path in paths[:4]:  # keep the big 2048x2048 scans bounded
        with open(path, "rb") as f:
            data = f.read()
        got = native.png_decode(data)
        assert got is not None
        np.testing.assert_array_equal(got, np.asarray(Image.open(path).convert("RGBA")))

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (37, 53, 3), np.uint8)
    back = native.png_decode(native.png_encode(img))
    np.testing.assert_array_equal(back[..., :3], img)
    assert (back[..., 3] == 255).all()

    for mode in ("L", "P", "LA"):
        im = Image.fromarray(rng.integers(0, 256, (16, 16, 3), np.uint8)).convert(mode)
        buf = io.BytesIO()
        im.save(buf, "PNG")
        got = native.png_decode(buf.getvalue())
        np.testing.assert_array_equal(got, np.asarray(im.convert("RGBA")))
