from gr_raytracer_tpu.cli import main

main()
