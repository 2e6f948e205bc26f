"""miniraytracer_tpu — a TPU-native differentiable path tracer in JAX/Pallas.

A from-scratch reimplementation of the capability set of the reference CPU
renderer Maraneshi/MiniRayTracer (see SURVEY.md), redesigned TPU-first:

- SoA scene tables + tagged dispatch instead of C++ virtual classes
- an iterative wavefront bounce loop (`lax.scan`/`lax.while_loop`) instead of
  recursion (reference: main.cpp:66-118)
- counter-based stateless RNG instead of thread-local PCG32 (pcg.cpp:40-46)
- pixel sharding over a `jax.sharding.Mesh` instead of a pthread tile queue
  (work_queue.cpp)
- differentiable forward pass with gradients w.r.t. material albedo, emission
  and geometry.
"""

__version__ = "0.1.0"

from miniraytracer_tpu.scene.types import SceneData, Camera  # noqa: F401
