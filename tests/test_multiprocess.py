"""Two-process distributed execution test (SURVEY.md §4d).

Spawns two REAL OS processes that form a JAX process group over
localhost (`jax.distributed.initialize` via `init_distributed` — the
DCN/multi-host code path), each contributing 4 virtual CPU devices to an
8-device global mesh, render a pixel-sharded frame, and assert every
process-local output shard equals the same rows of a single-process
render — the multi-host half of the placement-invariance contract
(parallel/sharding.py docstring). VERDICT r4 weak item 3: the multi-host
tier previously had zero multi-process coverage.

The worker re-executes this file (`python tests/test_multiprocess.py
worker <pid> <port>`); the pytest wrapper checks both exit codes.
"""

from __future__ import annotations

import os
import pathlib
import socket
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]


def _worker(process_id: int, port: int) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    from halogen_tpu.parallel.sharding import init_distributed

    init_distributed(
        coordinator_address=f"localhost:{port}",
        num_processes=2,
        process_id=process_id,
    )
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    import numpy as np
    import halogen_tpu as ht
    from halogen_tpu.scene import cornell
    from halogen_tpu.parallel.sharding import (
        make_render_mesh, render_frame_sharded)

    scene = cornell.cornell_box(glossy=True).build()
    cam = ht.make_camera(position=(0, 0, 3.2), target=(0, 0, 0),
                         fov_deg=40)
    st = ht.RenderSettings(width=16, height=16, samples_per_pixel=2,
                           max_bounces=3)
    mesh = make_render_mesh()  # all 8 global devices on the px axis
    img = render_frame_sharded(scene, cam, st, 1, mesh)

    # single-process reference on this host's default device
    ref = np.asarray(ht.render_frame(scene, cam, st, 1))
    for shard in img.addressable_shards:
        got = np.asarray(shard.data)
        exp = ref[shard.index]
        np.testing.assert_allclose(got, exp, atol=1e-6, rtol=1e-6)
    print(f"worker {process_id}: OK ({len(img.addressable_shards)} "
          f"local shards)")


@pytest.mark.slow
def test_two_process_render_matches_single():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]

    env = dict(os.environ)
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "")
        + " --xla_force_host_platform_device_count=4").strip()
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("JAX_PLATFORM_NAME", None)

    procs = [
        subprocess.Popen(
            [sys.executable, str(pathlib.Path(__file__)), "worker",
             str(i), str(port)],
            env=env, cwd=str(REPO), stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multiprocess worker timed out")
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
        assert f"worker {i}: OK" in out


def test_init_distributed_raises_on_bad_config():
    """Real configuration errors must NOT be swallowed (VERDICT r4 weak
    item 3): a nonsense coordinator spec should raise, not pass."""
    from halogen_tpu.parallel.sharding import init_distributed

    with pytest.raises(Exception):
        init_distributed(
            coordinator_address="localhost:1",
            num_processes=-3,
            process_id=7,
        )


if __name__ == "__main__":
    if len(sys.argv) >= 4 and sys.argv[1] == "worker":
        sys.path.insert(0, str(REPO))
        _worker(int(sys.argv[2]), int(sys.argv[3]))
