from miniraytracer_tpu.models import textures, materials, pdfs, camera, integrator  # noqa: F401
