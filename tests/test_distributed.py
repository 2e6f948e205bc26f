"""True multi-process jax.distributed execution on CPU.

`dryrun_multichip` and the sharding suite run ONE process with 8 virtual
devices; this test runs TWO OS processes x 4 devices through
`jax.distributed.initialize` (parallel/mesh.init_distributed's underlying
path — SURVEY 2.3's DCN/multi-host layer) and asserts the sharded render
pass + train step produce the same replicated loss/ray counts as the
single-process 8-device mesh. Real pods are unavailable in this
environment; multi-process-on-CPU is the standard stand-in evidence."""

import json
import os
import socket
import subprocess
import sys

import jax
import jax.numpy as jnp
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_matches_single_process(tmp_path):
    port = _free_port()
    outs = [tmp_path / f"proc{i}.json" for i in range(2)]
    env = dict(os.environ, PYTHONPATH=REPO + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests",
                                          "_distributed_worker.py"),
             str(i), "2", str(port), str(outs[i])],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    logs = [p.communicate(timeout=600)[0] for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"
    results = [json.loads(out.read_text()) for out in outs]

    # both processes saw the same replicated loss/ray count
    assert results[0]["devices"] == 8
    assert results[0]["grads_finite"] and results[1]["grads_finite"]
    assert results[0]["rays"] == results[1]["rays"] > 0
    assert results[0]["loss"] == pytest.approx(results[1]["loss"], rel=0,
                                               abs=0)

    # and they match the single-process 8-device mesh (this very process)
    from miniraytracer_tpu.models import integrator as integ
    from miniraytracer_tpu.models.scenes import cornell_box
    from miniraytracer_tpu.parallel import (
        auto_mesh_shape, extract_params, make_mesh, make_train_step,
    )
    from miniraytracer_tpu.parallel.render import (
        make_frame, render_pass_sharded,
    )

    n_dp, n_sp = auto_mesh_shape(8)
    mesh = make_mesh(n_dp, n_sp, jax.devices()[:8])
    width = height = 16
    scene = cornell_box(width / height)
    offs, _ = integ.sample_offsets(4)
    frame = make_frame(width, height, mesh)
    frame, rays = render_pass_sharded(
        scene, frame, jnp.int32(0), offs, jnp.float32(1000.0),
        width=width, height=height, max_bounces=2, mesh=mesh,
    )
    step = make_train_step(mesh, width=width, height=height, max_bounces=2)
    params = extract_params(scene)
    target = make_frame(width, height, mesh)
    _, loss, _ = step(params, scene, target, jnp.int32(0), offs,
                      jnp.float32(1e-3))
    assert float(rays) == results[0]["rays"]
    # bitwise-identical program on an identical device topology; allow only
    # reduction-order noise across the process boundary
    assert float(loss) == pytest.approx(results[0]["loss"], rel=1e-6)
