"""TPU-native differentiable general-relativity raytracer.

Quick start:

    from gr_raytracer_tpu import config, presets
    from gr_raytracer_tpu.rendering import raytracer

    scene = config.create_scene(config.load_config("scene.toml"),
                                config.RenderOptions(width=512, height=512))
    out = raytracer.render_section(scene)
    raytracer.write_image("render.png", out.color)
"""

__version__ = "0.1.0"
