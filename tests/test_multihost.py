"""Multi-host (multi-process) evidence: BASELINE config 5 / VERDICT
round-2 missing #3.

Two real OS processes form a jax.distributed cluster over CPU
(coordinator + worker), then exercise exactly the pod-run path:
`initialize_from_env`, host-striped data loading, a global-mesh psum,
and `allreduce_metrics`.  The reference has no distributed machinery at
all (SURVEY.md §2.9); this is the TPU-native pod bring-up contract.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import json, os, sys
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.environ["REPO"])

from progressivecodec_tpu.parallel.distributed import initialize_from_env, allreduce_metrics

pid, n = initialize_from_env()
assert n == 2, f"expected 2 processes, got {n}"
assert len(jax.devices()) == 4, f"expected 4 global devices, got {len(jax.devices())}"

# host-striped loading: each process sees a disjoint file shard
from progressivecodec_tpu.data.datasets import ImageFolderDataset
ds = ImageFolderDataset(os.environ["DATA_ROOT"], "train", 8, host_index=pid, host_count=n)
local = [os.path.basename(f) for f in ds.files]

# global psum over all processes' devices
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map
import numpy as np

mesh = Mesh(np.array(jax.devices()).reshape(4), ("d",))
sharding = jax.sharding.NamedSharding(mesh, P("d"))
# each process contributes its LOCAL rows of the global array
x = jax.make_array_from_process_local_data(
    sharding, np.full((2,), float(pid + 1), np.float32), (4,)
)

def f(x):
    return jax.lax.psum(x, "d")

y = jax.jit(shard_map(f, mesh=mesh, in_specs=P("d"), out_specs=P("d")))(x)
psum_val = float(np.asarray(y.addressable_shards[0].data)[0])

# cross-process metric reduction
m = allreduce_metrics({"loss": float(10 * (pid + 1))})

print(json.dumps({
    "process": pid, "count": n, "local_indices": local,
    "psum": psum_val, "loss_mean": float(m["loss"]),
}))
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.timeout(600)
def test_two_process_cluster(tmp_path):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # a shared on-disk dataset in the reference's root/split/data layout
    from PIL import Image
    import numpy as np
    data_dir = tmp_path / "train" / "data"
    data_dir.mkdir(parents=True)
    for i in range(8):
        Image.fromarray(
            (np.full((8, 8, 3), i * 30)).astype("uint8")
        ).save(data_dir / f"img{i}.png")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("XLA_FLAGS", None)
        env.update(
            REPO=repo,
            DATA_ROOT=str(tmp_path),
            COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            PROCESS_COUNT="2",
            PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", _WORKER],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        stdout, stderr = p.communicate(timeout=540)
        assert p.returncode == 0, f"worker failed:\n{stderr[-3000:]}"
        # runtime banners can interleave on stdout under load — take the
        # last line that parses as the worker's JSON report
        for line in reversed(stdout.strip().splitlines()):
            try:
                outs.append(json.loads(line))
                break
            except json.JSONDecodeError:
                continue
        else:
            raise AssertionError(
                f"no JSON report on worker stdout:\n{stdout[-2000:]}\n"
                f"stderr:\n{stderr[-2000:]}"
            )

    assert {o["process"] for o in outs} == {0, 1}
    for o in outs:
        assert o["count"] == 2
        # psum over (1,1,2,2) across both processes' device rows = 6
        assert o["psum"] == 6.0
        # mean of 10 and 20
        assert o["loss_mean"] == 15.0
    # host striping: disjoint and covering
    s0, s1 = (set(o["local_indices"]) for o in outs)
    assert s0.isdisjoint(s1)
    assert len(s0) + len(s1) == 8
