"""Worker for the 2-process multi-host CPU test (run via subprocess).

Each process owns 4 virtual CPU devices; together they form a real
multi-controller JAX world of 8 devices. The worker shards the global
dataset by ``host_shard()`` (the DistributedSampler replacement), builds
global arrays from its local shard, runs the jitted DP loss over the global
mesh, and prints the (replicated) loss — which the parent compares across
hosts and against the single-process value.

Usage: python multihost_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.local_devices()) == 4
assert len(jax.devices()) == 4 * nproc

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodalsum_tpu.core.config import TINY_CONFIG as cfg  # noqa: E402
from multimodalsum_tpu.data.text import shard_order  # noqa: E402
from multimodalsum_tpu.models.bart import BartModel  # noqa: E402
from multimodalsum_tpu.parallel.comm import host_shard  # noqa: E402
from multimodalsum_tpu.parallel.mesh import batch_sharding, make_mesh, replicated  # noqa: E402
from multimodalsum_tpu.train.stages import enc_conditional_loss  # noqa: E402

model = BartModel(cfg)
params = model.init(jax.random.PRNGKey(0), method=BartModel.init_all)["params"]

# global synthetic dataset; every host derives the SAME full set, then keeps
# only its shard — exactly the production loader contract
rng = np.random.default_rng(0)
B = 8
data = dict(
    h=rng.normal(size=(B, 2, 6, cfg.d_model)).astype(np.float32),
    m=np.ones((B, 2, 6), bool),
    labels=rng.integers(3, cfg.vocab_size, (B, 7)),
)
si, sc = host_shard()
assert (si, sc) == (pid, nproc), (si, sc)
order = shard_order(np.arange(B), si, sc)
local = {k: v[order] for k, v in data.items()}

mesh = make_mesh(data=4 * nproc, model=1)  # global mesh over both hosts
bs = batch_sharding(mesh)
gbatch = {k: jax.make_array_from_process_local_data(bs, v)
          for k, v in local.items()}

import jax.numpy as jnp  # noqa: E402


def loss_fn(params, batch):
    return enc_conditional_loss(model, params, batch["h"], batch["m"],
                                batch["labels"], rng=None)


loss = jax.jit(loss_fn, in_shardings=(replicated(mesh), bs),
               out_shardings=replicated(mesh))(params, gbatch)
print(f"MULTIHOST_LOSS {pid} {float(loss):.8f}", flush=True)

# ---- the CLI-path helpers in the same multi-controller world -------------
# mesh_for_batch must build a global process-major mesh from the PER-HOST
# batch, and prefetch_to_device must assemble global arrays from each
# host's local rows — the exact chain every training CLI uses under
# --multihost. The loss must equal the hand-built global-mesh value above.
from multimodalsum_tpu.cli.common import host_data_shard, mesh_for_batch  # noqa: E402
from multimodalsum_tpu.data.prefetch import prefetch_to_device  # noqa: E402

si2, sc2, steps = host_data_shard(B, batch_size=4)
assert (si2, sc2, steps) == (pid, nproc, 1), (si2, sc2, steps)
mesh2 = mesh_for_batch(4)
assert mesh2.devices.size == 4 * nproc, mesh2.devices.shape
assert [d.process_index for d in mesh2.devices.flat] == sorted(
    d.process_index for d in mesh2.devices.flat), "mesh not process-major"
bs2 = batch_sharding(mesh2)
gbatch2 = next(prefetch_to_device(iter([local]), sharding=bs2))
loss2 = jax.jit(loss_fn, in_shardings=(replicated(mesh2), bs2),
                out_shardings=replicated(mesh2))(params, gbatch2)
print(f"MULTIHOST_CLI_LOSS {pid} {float(loss2):.8f}", flush=True)
jax.distributed.shutdown()
