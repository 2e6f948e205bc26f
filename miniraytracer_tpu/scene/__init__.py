from miniraytracer_tpu.scene.types import SceneData, Camera  # noqa: F401
from miniraytracer_tpu.scene.builder import SceneBuilder  # noqa: F401
