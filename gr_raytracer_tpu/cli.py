"""Command-line interface mirroring the reference binary.

Subcommands (reference: src/cli/cli.rs, dispatch src/main.rs:29-177):
  render              full-frame / section render to PNG or Radiance .hdr
  render-ray          integrate the camera ray of pixel (row, col) -> CSV
  render-ray-at       integrate a ray from an arbitrary position/direction -> CSV
  blackbody           print a blackbody color swatch for (T, z)
  blackbody-spectrum  render the (T × z) blackbody color chart to an image

CSV schema matches ray.rs:35-54: header "i,t,tau,x,y,z" with i the step
index, t the affine parameter, and (tau, x, y, z) the Cartesian 4-position.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _build_parser():
    p = argparse.ArgumentParser(prog="gr-raytracer-tpu", description=__doc__)
    p.add_argument("--width", type=int, default=500)
    p.add_argument("--height", type=int, default=500)
    p.add_argument("--step-size", type=float, default=0.01)
    p.add_argument("--max-steps", type=int, default=20000)
    p.add_argument("--max-radius", type=float, default=15000.0)
    p.add_argument("--epsilon", type=float, default=1e-5)
    p.add_argument(
        "--camera-position", type=str, default="18.0,0.0,0.8", help="Cartesian x,y,z"
    )
    p.add_argument("--phi", type=float, default=0.0, help="camera pre-roll (radians)")
    p.add_argument("--theta", type=float, default=0.0, help="camera tilt (radians)")
    p.add_argument("--psi", type=float, default=0.0, help="camera roll (radians)")
    p.add_argument(
        "--tone-mapping", choices=["reinhard", "global-linear"], default="reinhard"
    )
    p.add_argument("--show-sampling-mask", action="store_true")
    p.add_argument("--sampling-mask-color", type=str, default="255,0,255")
    p.add_argument("-c", "--config-file", type=str, default=None)
    p.add_argument("--f64", action="store_true", help="force float64 (CPU only)")
    p.add_argument(
        "--chunk-size", type=int, default=65536, help="rays per device dispatch"
    )
    p.add_argument(
        "--profile",
        type=str,
        default=None,
        metavar="DIR",
        help="write a jax.profiler trace of the render to DIR "
        "(view in Perfetto / TensorBoard)",
    )
    p.add_argument(
        "--devices",
        type=int,
        default=1,
        help="shard each ray chunk over the first N local devices (0 = all); "
        "the multi-chip analog of the reference's RAYON_NUM_THREADS "
        "(docs/example-render-commands.md:59-63)",
    )
    p.add_argument(
        "--coordinator",
        type=str,
        default=None,
        metavar="HOST:PORT",
        help="jax.distributed coordinator address: initialize this process as "
        "one member of a multi-process run (pair with --num-processes / "
        "--process-id; each process renders its own section, e.g. via "
        "render --raw-section, and one host stitches)",
    )
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)

    sub = p.add_subparsers(dest="action", required=True)

    r = sub.add_parser("render")
    r.add_argument("--filename", type=str, default="render.png")
    r.add_argument(
        "--raw-section",
        type=str,
        default=None,
        metavar="PATH.npz",
        help="instead of an image, save the section's raw XYZA radiance + "
        "bounds for later assembly with the `stitch` subcommand (lets a "
        "frame be split across processes/hosts and tone-mapped GLOBALLY "
        "after assembly — the reference's external PNG stitching "
        "(cli/cli.rs:66-73) cannot do that)",
    )
    r.add_argument(
        "--checkpoint",
        nargs="?",
        const="",
        default=None,
        help="checkpoint completed ray chunks to PATH(.pass1/.aa).npz and "
        "resume an interrupted render from them (default PATH: the output "
        "filename); removed after a successful save",
    )
    r.add_argument(
        "--halo",
        action="store_true",
        help="seam-free sectioned adaptive sampling: trace a 1-px halo ring "
        "around the section so the AA contrast stencil sees across the crop "
        "edge (the reference documents a 1-px seam instead, "
        "raytracer.rs:413-421); with an explicit adaptive_sampling."
        "minimum_luminance, stitched sections match the single-frame render "
        "bit for bit",
    )
    r.add_argument("--from-row", type=int, default=None)
    r.add_argument("--from-col", type=int, default=None)
    r.add_argument("--to-row", type=int, default=None)
    r.add_argument("--to-col", type=int, default=None)

    rr = sub.add_parser("render-ray")
    rr.add_argument("-r", "--row", type=int, required=True)
    rr.add_argument("-c", "--col", type=int, required=True)
    rr.add_argument("--filename", type=str, default="rendered-ray.csv")

    ra = sub.add_parser("render-ray-at")
    ra.add_argument("-p", "--position", type=str, required=True, help="Cartesian x,y,z")
    ra.add_argument("-d", "--direction", type=str, required=True, help="Cartesian dx,dy,dz")
    ra.add_argument("--filename", type=str, default="rendered-ray-at.csv")

    b = sub.add_parser("blackbody")
    b.add_argument("-t", "--temperature", type=float, required=True)
    b.add_argument("-r", "--redshift", type=float, default=1.0)

    bs = sub.add_parser("blackbody-spectrum")
    bs.add_argument("--min-temperature", type=float, default=1000.0)
    bs.add_argument("--max-temperature", type=float, default=10000.0)
    bs.add_argument("--min-redshift", type=float, default=0.5)
    bs.add_argument("--max-redshift", type=float, default=2.0)
    bs.add_argument("--width", type=int, default=1000)
    bs.add_argument("--height", type=int, default=1000)
    bs.add_argument("-f", "--filename", type=str, default="blackbody_spectrum.png")

    st = sub.add_parser(
        "stitch", help="assemble raw sections (render --raw-section) into one image"
    )
    st.add_argument("inputs", nargs="+", help="section .npz files")
    st.add_argument("--filename", type=str, default="render.png")
    return p


def _floats(s: str, n: int, what: str):
    parts = [float(v) for v in s.split(",")]
    if len(parts) != n:
        raise SystemExit(f"error: {what} expects {n} comma-separated values, got {len(parts)}")
    return tuple(parts)


def _setup_dtype(args):
    import jax

    # Persistent compile cache: a full render compiles a handful of >30 s
    # kernels (geo pass, compact wire, raymarch batches); without a disk
    # cache every CLI invocation repays them. GR_JAX_CACHE=0 disables;
    # any other value overrides the location.
    cache = os.environ.get(
        "GR_JAX_CACHE", os.path.expanduser("~/.cache/gr_raytracer_tpu/jax")
    )
    if cache != "0":
        try:
            os.makedirs(cache, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass

    if args.f64:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_enable_x64", True)
        import jax.numpy as jnp

        return jnp.float64
    from gr_raytracer_tpu import config as cfgmod

    cfgmod.enable_host_cpu_platform()
    import jax.numpy as jnp

    return jnp.float32


def _load_scene(args, dtype):
    from gr_raytracer_tpu import config as cfgmod

    if args.config_file is None:
        raise SystemExit("error: --config-file is required for this action")
    cfg = cfgmod.load_config(args.config_file)
    opts = cfgmod.RenderOptions(
        width=args.width,
        height=args.height,
        step_size=args.step_size,
        max_steps=args.max_steps,
        max_radius=args.max_radius,
        epsilon=args.epsilon,
        camera_position=_floats(args.camera_position, 3, "--camera-position"),
        phi=args.phi,
        theta=args.theta,
        psi=args.psi,
        tone_mapping=args.tone_mapping,
        show_sampling_mask=args.show_sampling_mask,
        sampling_mask_color=_floats(args.sampling_mask_color, 3, "--sampling-mask-color"),
    )
    scene = cfgmod.create_scene_host(cfg, opts, dtype)
    return cfg, opts, scene


def _save_trajectory_csv(path, states, affine, valid, chart, spin):
    """CSV export in Cartesian (ray.rs:35-54). states: [S, 8] f64 numpy."""
    from gr_raytracer_tpu import native
    from gr_raytracer_tpu.geometry import chart as charts
    import jax.numpy as jnp

    n_valid = int(valid.sum())
    cart = np.asarray(charts.to_cartesian(jnp.asarray(states[..., :4]), chart, spin))
    text = native.trajectory_csv(
        np.arange(n_valid, dtype=np.int64), np.asarray(affine[:n_valid], np.float64),
        np.asarray(cart[:n_valid], np.float64),
    )
    if text is None:
        lines = ["i,t,tau,x,y,z\n"]
        for i in range(n_valid):
            t = affine[i]
            lines.append(f"{i},{t},{cart[i, 0]},{cart[i, 1]},{cart[i, 2]},{cart[i, 3]}\n")
        text = "".join(lines)
    with open(path, "w") as f:
        f.write(text)
    print(f"saved ray to {path}")


def _integrate_and_save(scene, position, momentum, args, path):
    import jax.numpy as jnp

    from gr_raytracer_tpu.rendering import integrator as integ

    geometry = scene.geometry
    solver = geometry.make_solver(position[None], momentum[None])
    y0 = solver.initial_state(position[None], momentum[None])
    states, affine, valid, stop = integ.integrate_trajectory(
        geometry, solver, scene.integration, y0, max_record=args.max_steps
    )
    states = np.asarray(states[:, 0])
    affine = np.asarray(affine[:, 0])
    valid = np.asarray(valid[:, 0])
    print(f"stop reason code: {int(stop[0])}")
    # Compact to accepted steps only (the scan records every attempt slot).
    states = states[valid]
    affine = affine[valid]
    _save_trajectory_csv(
        path, states, affine, np.ones(len(states), bool), solver.chart, geometry.spin
    )


def cmd_render(args, dtype):
    from gr_raytracer_tpu.rendering import raytracer as rt
    from gr_raytracer_tpu.rendering.color import srgb8_to_xyza

    _, opts, scene = _load_scene(args, dtype)
    mask_color = None
    if args.show_sampling_mask:
        mask_color = tuple(np.asarray(srgb8_to_xyza(np.asarray(opts.sampling_mask_color))))
    mesh = None
    if args.devices != 1:
        import jax

        from gr_raytracer_tpu.parallel.mesh import ray_mesh

        # Multi-process runs shard over THIS process's devices only (each
        # process renders its own section; a global mesh would need every
        # process to address every shard).
        devs = jax.local_devices() if jax.process_count() > 1 else jax.devices()
        want = len(devs) if args.devices <= 0 else min(args.devices, len(devs))
        if want > 1:
            mesh = ray_mesh(devs[:want])
            print(f"sharding rays over {want} devices", file=sys.stderr)
    ckpt_path = None
    ckpt_key = ""
    if args.checkpoint is not None:
        import hashlib

        ckpt_path = args.checkpoint or args.filename
        # The key pins everything that determines the ray stream; any change
        # invalidates a stale checkpoint instead of corrupting the frame.
        cfg_text = ""
        if args.config_file:
            with open(args.config_file) as f:
                cfg_text = f.read()
        fields = (
            cfg_text, args.width, args.height, args.camera_position, args.phi,
            args.theta, args.psi, args.max_steps, args.max_radius,
            args.step_size, args.epsilon, args.from_row, args.from_col,
            args.to_row, args.to_col, args.chunk_size, args.f64,
        )
        ckpt_key = hashlib.sha256(repr(fields).encode()).hexdigest()
    t0 = time.time()
    import contextlib

    profile_ctx = contextlib.nullcontext()
    if args.profile:
        from gr_raytracer_tpu.utils import profiling

        profile_ctx = profiling.trace(args.profile)
    with profile_ctx:
        out = rt.render_section(
            scene,
            from_row=args.from_row or 0,
            from_col=args.from_col or 0,
            to_row=args.to_row,
            to_col=args.to_col,
            chunk_size=args.chunk_size,
            sampling_mask_color=mask_color,
            progress=True,
            mesh=mesh,
            checkpoint_path=ckpt_path,
            checkpoint_key=ckpt_key,
            halo=args.halo,
        )
    if args.raw_section:
        h, w = out.color.shape[:2]
        from_row = args.from_row or 0
        from_col = args.from_col or 0
        with open(args.raw_section, "wb") as f:
            np.savez_compressed(
                f,
                color=out.color,
                ray_class=out.ray_class,
                from_row=from_row,
                from_col=from_col,
                to_row=from_row + h,
                to_col=from_col + w,
                width=args.width,
                height=args.height,
            )
        print(f"saved raw section to {args.raw_section} ({time.time() - t0:.1f}s)")
    else:
        rt.write_image(args.filename, out.color, tone_mapping=args.tone_mapping)
        print(f"saved image to {args.filename} ({time.time() - t0:.1f}s)")
    if ckpt_path:
        for stage in ("pass1", "aa"):
            rt.ChunkCheckpoint(f"{ckpt_path}.{stage}.npz", "").remove()


def cmd_stitch(args, dtype):
    """Assemble raw sections into one frame and tone-map GLOBALLY. The
    reference splits frames by stitching tone-mapped PNG crops externally
    (cli/cli.rs:66-73); that breaks any frame-global operator (global-linear
    max, the AA luminance percentile — configuration.rs:30-36 documents the
    caveat). Stitching raw radiance first makes the split exact for
    per-pixel tone maps and correct for global ones."""
    from gr_raytracer_tpu.rendering import raytracer as rt

    sections = []
    width = height = None
    for path in args.inputs:
        d = np.load(path, allow_pickle=False)
        if width is None:
            width, height = int(d["width"]), int(d["height"])
        elif (int(d["width"]), int(d["height"])) != (width, height):
            raise SystemExit(f"error: {path} belongs to a different frame size")
        sections.append(d)
    frame = np.zeros((height, width, 4), sections[0]["color"].dtype)
    covered = np.zeros((height, width), bool)
    for d in sections:
        r0, c0, r1, c1 = (int(d[k]) for k in ("from_row", "from_col", "to_row", "to_col"))
        frame[r0:r1, c0:c1] = d["color"]
        covered[r0:r1, c0:c1] = True
    if not covered.all():
        print(
            f"warning: {int((~covered).sum())} pixels uncovered by the given "
            "sections (left black)",
            file=sys.stderr,
        )
    rt.write_image(args.filename, frame, tone_mapping=args.tone_mapping)
    print(f"saved stitched image to {args.filename}")


def cmd_render_ray(args, dtype):
    import jax.numpy as jnp

    from gr_raytracer_tpu.rendering import camera as cam

    _, _, scene = _load_scene(args, dtype)
    x, p = cam.pixel_rays(
        scene.camera, jnp.asarray([float(args.row)], dtype), jnp.asarray([float(args.col)], dtype)
    )
    _integrate_and_save(scene, x[0], p[0], args, args.filename)


def cmd_render_ray_at(args, dtype):
    """Future-directed ray from an arbitrary Cartesian position/direction
    (per-geometry adapters, e.g. cli/kerr.rs:77-100: direction components are
    coefficients on the spatial tetrad axes, normalized)."""
    import jax.numpy as jnp

    from gr_raytracer_tpu import config as cfgmod
    from gr_raytracer_tpu.geometry import chart as charts

    _, _, scene = _load_scene(args, dtype)
    geometry = scene.geometry
    px, py, pz = _floats(args.position, 3, "--position")
    dx, dy, dz = _floats(args.direction, 3, "--direction")
    cart = jnp.asarray([0.0, px, py, pz], dtype)
    position = charts.from_cartesian(cart, geometry.chart, geometry.spin)

    tet = geometry.tetrad(position)
    if geometry.chart != charts.SPHERICAL:
        # Cartesian charts AND Boyer-Lindquist take the direction components
        # as raw coefficients on the spatial tetrad axes — the reference's
        # KerrBL adapter performs no Cartesian projection (cli/kerr.rs:84-98,
        # cli/kerr_bl.rs:88-107), so for BL "x,y,z" mean (φ̂, θ̂, r̂)-aligned
        # frame axes, not world Cartesian directions.
        coeffs = jnp.asarray([dx, dy, dz], dtype)
    else:
        # Spherical-chart adapters project the Cartesian direction onto the
        # local (r̂, θ̂, φ̂) frame and map to tetrad axes (x, y, z) =
        # (φ̂, −θ̂, −r̂) (cli/schwarzschild.rs:96-112).
        sph = charts.cartesian_to_spherical(cart)
        th, ph = float(sph[2]), float(sph[3])
        st, ct = np.sin(th), np.cos(th)
        sp, cp = np.sin(ph), np.cos(ph)
        r_d = st * cp * dx + st * sp * dy + ct * dz
        theta_d = ct * cp * dx + ct * sp * dy - st * dz
        phi_d = -sp * dx + cp * dy
        coeffs = jnp.asarray([phi_d, -theta_d, -r_d], dtype)

    space = (
        coeffs[0] * tet[..., 1, :] + coeffs[1] * tet[..., 2, :] + coeffs[2] * tet[..., 3, :]
    )
    norm_sq = geometry.inner_product(position, space, space)
    norm = float(np.sqrt(abs(float(norm_sq))))
    if not (np.isfinite(norm) and norm > 0.0):
        raise SystemExit("error: direction must have a non-zero finite spatial part")
    momentum = tet[..., 0, :] + space / norm
    cfgmod.assert_future_directed("render_ray_at momentum", geometry, position, momentum)
    _integrate_and_save(scene, position, momentum, args, args.filename)


def cmd_blackbody(args, dtype):
    import jax.numpy as jnp

    from gr_raytracer_tpu.rendering.blackbody import blackbody_xyz
    from gr_raytracer_tpu.rendering.color import xyz_to_srgb8

    xyz = np.asarray(
        blackbody_xyz(jnp.asarray(args.temperature, dtype), jnp.asarray(args.redshift, dtype))
    )
    rgb = np.asarray(xyz_to_srgb8(jnp.asarray(xyz[:3])))
    print(f"Blackbody color at T={args.temperature}K (redshift={args.redshift}):")
    print(f"XYZ:  {xyz[0]:.4f}, {xyz[1]:.4f}, {xyz[2]:.4f}")
    print(f"sRGB: R={rgb[0]}, G={rgb[1]}, B={rgb[2]}")
    print(f"sRGB: R={rgb[0]/255:.4f}, G={rgb[1]/255:.4f}, B={rgb[2]/255:.4f}")
    print(f"Color block: \x1b[48;2;{rgb[0]};{rgb[1]};{rgb[2]}m      \x1b[0m")


def cmd_blackbody_spectrum(args, dtype):
    import jax
    import jax.numpy as jnp

    from gr_raytracer_tpu.rendering.blackbody import blackbody_xyz
    from gr_raytracer_tpu.rendering.color import xyza_buffer_to_srgb8

    w, h = args.width, args.height
    t = jnp.linspace(args.min_temperature, args.max_temperature, w, dtype=dtype)
    z = jnp.linspace(args.min_redshift, args.max_redshift, h, dtype=dtype)
    tt, zz = jnp.meshgrid(t, z, indexing="xy")
    xyz = jax.jit(blackbody_xyz)(tt, zz)
    img = np.asarray(xyza_buffer_to_srgb8(xyz, method=args.tone_mapping))
    from PIL import Image

    Image.fromarray(img).save(args.filename)
    print(f"Saved blackbody spectrum to {args.filename}")


def main(argv=None):
    args = _build_parser().parse_args(argv)
    dtype = _setup_dtype(args)
    if args.coordinator is not None:
        from gr_raytracer_tpu.parallel import distributed

        n, idx = distributed.initialize(
            coordinator_address=args.coordinator,
            num_processes=args.num_processes,
            process_id=args.process_id,
        )
        print(f"distributed: process {idx}/{n}", file=sys.stderr)
    t0 = time.time()
    dispatch = {
        "render": cmd_render,
        "render-ray": cmd_render_ray,
        "render-ray-at": cmd_render_ray_at,
        "blackbody": cmd_blackbody,
        "blackbody-spectrum": cmd_blackbody_spectrum,
        "stitch": cmd_stitch,
    }
    dispatch[args.action](args, dtype)
    print(f"elapsed: {time.time() - t0:.2f}s", file=sys.stderr)
    if os.environ.get("GR_SPLIT_TIMING") == "1":
        from gr_raytracer_tpu.rendering import raytracer as rt

        if rt.SPLIT_TIMING:
            print(f"[split-timing] {rt.SPLIT_TIMING}", file=sys.stderr)


if __name__ == "__main__":
    main()
