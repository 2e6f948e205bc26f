from miniraytracer_tpu.utils import tonemap, image  # noqa: F401
