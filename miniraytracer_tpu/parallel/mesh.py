"""Device mesh construction.

The renderer's two parallel axes (SURVEY.md section 2.2):
- `dp`: data-parallel over pixels (the reference's tile scheduler axis,
  work_queue.cpp:133-149)
- `sp`: sample-parallel over progressive passes (the reference's dynamic
  per-sample passes, work_queue.cpp:158-175)

Rays are embarrassingly parallel and the scene is replicated, so both axes
are pure data parallelism; `sp` additionally carries a mean-reduction
(`psum`) when averaging passes on-device.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def auto_mesh_shape(n_devices: int) -> tuple[int, int]:
    """Factor n_devices into (dp, sp) with sp in {1, 2} — pixels dominate."""
    if n_devices % 2 == 0 and n_devices > 2:
        return n_devices // 2, 2
    return n_devices, 1


def make_mesh(n_dp: int | None = None, n_sp: int = 1, devices=None) -> Mesh:
    """Build a (dp, sp) mesh. Defaults to all devices on the dp axis."""
    if devices is None:
        devices = jax.devices()
    if n_dp is None:
        n_dp = len(devices) // n_sp
    devs = np.asarray(devices[: n_dp * n_sp]).reshape(n_dp, n_sp)
    return Mesh(devs, ("dp", "sp"))


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> Mesh:
    """Multi-host initialization (the reference has no multi-process story;
    this is the pod-slice path, SURVEY.md section 2.3).

    Call once per host before any jax op. With no arguments, JAX
    auto-detects TPU pod topology from the environment; explicit args
    support manual bring-up. Returns the global (dp, sp) mesh over ALL
    chips in the slice — intra-slice collectives (the pass psums and the
    gradient all-reduce in parallel/train.py) ride ICI automatically
    because `dp` spans the slice's device order.
    """
    kwargs = {}
    if coordinator is not None:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)
    n_dp, n_sp = auto_mesh_shape(len(jax.devices()))
    return make_mesh(n_dp, n_sp)
