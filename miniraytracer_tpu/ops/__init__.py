from miniraytracer_tpu.ops import vecmath, rng, intersect  # noqa: F401
