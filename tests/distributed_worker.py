"""Worker process for tests/test_distributed_multiprocess.py.

Run as: python distributed_worker.py <coordinator_addr> <process_id> <npz>

Forces the CPU backend with 4 local virtual devices, joins a 2-process
jax.distributed runtime (8 global devices), assembles its host-local batch
shard into a globally-sharded array via
parallel.distributed.host_local_batch_to_global, runs the tiny LSTM encoder
under jit over the global data-parallel mesh, gathers the result with
process_allgather, and checks it against the single-process reference in the
npz.  Prints ``DIST_OK`` on success.
"""

import os
import sys

os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
flags = " ".join(
    f for f in flags.split() if "xla_force_host_platform_device_count" not in f
)
os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=4").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from k2transducerasr_tpu.models import lstm  # noqa: E402
from k2transducerasr_tpu.parallel import distributed, sharding as sh  # noqa: E402


def main():
    addr, pid, npz_path = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    assert distributed.initialize(
        coordinator_address=addr, num_processes=2, process_id=pid
    ), "multi-process initialize returned False"
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 8, jax.device_count()
    assert len(jax.local_devices()) == 4

    data = np.load(npz_path)
    x, lens, want = data["x"], data["lens"], data["want"]
    b = x.shape[0]
    local = slice(pid * (b // 2), (pid + 1) * (b // 2))

    cfg = lstm.LstmConfig(
        feature_dim=80, d_model=32, rnn_hidden_size=48, num_layers=2, ff_dim=64,
        chunk_size=4,
    )
    params = lstm.init_params(jax.random.PRNGKey(0), cfg)  # same on both hosts

    mesh = sh.make_mesh(8, 1)  # over GLOBAL devices
    gx = distributed.host_local_batch_to_global(mesh, x[local])
    glens = distributed.host_local_batch_to_global(mesh, lens[local])
    assert gx.shape == x.shape, (gx.shape, x.shape)

    out, _ = jax.jit(lambda p, a, n: lstm.forward(p, cfg, a, n))(params, gx, glens)
    from jax.experimental import multihost_utils

    full = np.asarray(multihost_utils.process_allgather(out, tiled=True))
    np.testing.assert_allclose(full, want, rtol=1e-5, atol=1e-5)
    print(f"DIST_OK pid={pid}", flush=True)


if __name__ == "__main__":
    main()
