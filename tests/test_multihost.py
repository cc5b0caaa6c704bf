"""Two-process jax.distributed test on CPU (VERDICT r2 item 7): the DCN
code path — per-process dataset slicing (``data.loader.batch_iterator``) +
``parallel.mesh.shard_batch``'s ``make_array_from_process_local_data``
assembly — must produce the same GLOBAL batch as a single process.

Each worker computes a replicated jitted checksum over the assembled
global batch; both workers must print the single-process value."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=os.environ["COORD"],
    num_processes=2,
    process_id=int(sys.argv[1]),
)
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from eemflow_tpu.data.loader import batch_iterator
from eemflow_tpu.parallel.mesh import make_mesh, shard_batch


class DS:
    def __len__(self):
        return 16

    def __getitem__(self, i):
        return {"x": np.full((4, 4), float(i), np.float32),
                "y": np.asarray([i], np.float32)}


pi, pc = jax.process_index(), jax.process_count()
assert pc == 2
mesh = make_mesh(n_data=len(jax.devices()), n_spatial=1)

it = batch_iterator(DS(), batch_size=4, shuffle=True, seed=7, epochs=1,
                    process_index=pi, process_count=pc)

@jax.jit
def checksum(x, y):
    # weighted sum is order-sensitive in content, not in assembly
    w = jnp.arange(x.shape[0], dtype=jnp.float32) + 1.0
    return jnp.sum(x.sum((1, 2)) * w) + jnp.sum(y[:, 0] * w)

sums = []
with mesh:
    for batch in it:
        g = shard_batch(batch, mesh)
        # global batch = 2 processes x 4 local samples
        assert g["x"].shape == (8, 4, 4), g["x"].shape
        sums.append(float(checksum(g["x"], g["y"])))
print("CHECKSUMS", pi, sums, flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _single_process_reference():
    """The same global batches drawn in one process (the interleaved
    per-process slices concatenated in process order)."""
    from eemflow_tpu.data.loader import batch_iterator, collate  # noqa: F401

    class DS:
        def __len__(self):
            return 16

        def __getitem__(self, i):
            return {"x": np.full((4, 4), float(i), np.float32),
                    "y": np.asarray([i], np.float32)}

    its = [
        batch_iterator(DS(), batch_size=4, shuffle=True, seed=7, epochs=1,
                       process_index=p, process_count=2)
        for p in (0, 1)
    ]
    sums = []
    for b0, b1 in zip(*its):
        x = np.concatenate([b0["x"], b1["x"]], axis=0)
        y = np.concatenate([b0["y"], b1["y"]], axis=0)
        w = np.arange(x.shape[0], dtype=np.float32) + 1.0
        sums.append(float((x.sum((1, 2)) * w).sum() + (y[:, 0] * w).sum()))
    return sums


@pytest.mark.zoo
def test_two_process_distributed_assembly(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env["COORD"] = f"127.0.0.1:{port}"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = (
        os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        + os.pathsep + env.get("PYTHONPATH", "")
    )
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
        assert p.returncode == 0, out

    expected = _single_process_reference()
    assert expected, "reference produced no batches"
    for i, out in enumerate(outs):
        line = [ln for ln in out.splitlines() if ln.startswith("CHECKSUMS")]
        assert line, out
        got = eval(line[0].split(" ", 2)[2])  # list literal
        np.testing.assert_allclose(got, expected, rtol=1e-6)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
