"""Subprocess worker for the REAL 2-process multi-host integration test
(tests/test_multihost.py::test_two_process_train_step_integration).

Runs ONE dp train step through the production path — Trainer +
multihost.local_batch_slice + global_batch_from_local — on a deterministic
synthetic batch, and prints the loss + a param fingerprint as JSON. The
test launches two of these against a shared Gloo coordinator (and one
single-process reference with the same GLOBAL device count) and asserts
the numbers match: the per-process slicing + global assembly must be
invisible to the math.
"""

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]
    # identical GLOBAL device count (2) either way, so the compiled SPMD
    # program — and therefore the float reduction order — is identical.
    # (2 devices, not 4: the SPMD compile dominates this test's wall time
    # on the 1-CPU box — 96 s cold at 4 devices, and three processes each
    # pay it; 2 devices still exercises the real cross-process feed.)
    local_devices = 1 if nproc > 1 else 2
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={local_devices}"
    )
    os.environ.setdefault("VCRNET_OFFLINE", "1")
    os.environ.setdefault("VCRNET_SKIP_TPU_PROBE", "1")

    import jax

    jax.config.update("jax_platforms", "cpu")
    # same persistent CPU compile cache as conftest.py: the three worker
    # launches compile the SAME 4-device SPMD program, so only the first
    # run ever pays the XLA compile (this test was the suite's slowest at
    # 96 s cold)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache_tests")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    if nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{port}",
            num_processes=nproc,
            process_id=pid,
        )

    import numpy as np

    from vcrnet_tpu.config import Config
    from vcrnet_tpu.train.engine import Trainer

    assert jax.device_count() == 2
    cfg = Config(num_points=32, emb_dims=32, ff_dims=64, batch_size=8)

    b, n = 8, cfg.num_points
    rng = np.random.RandomState(0)
    eye = np.tile(np.eye(3, dtype=np.float32), (b, 1, 1))
    zeros = np.zeros((b, 3), np.float32)
    batch = {
        "src": rng.rand(b, n, 3).astype(np.float32) - 0.5,
        "tgt": rng.rand(b, n, 3).astype(np.float32) - 0.5,
        "R_ab": eye, "t_ab": zeros, "R_ba": eye, "t_ba": zeros,
        "euler_ab": zeros, "euler_ba": zeros,
        "valid": np.ones(b, np.float32),
    }

    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    # init lands on the local default device; re-place on the global
    # replicated sharding (each process supplies identical host values)
    state = jax.device_put(
        jax.tree_util.tree_map(np.asarray, jax.device_get(state)),
        trainer._rep,
    )
    dev = trainer._to_device(batch)  # multihost branch when nproc > 1
    state2, sums = trainer._train_step(state, dev)

    def fetch(x):
        try:
            return np.asarray(x)
        except Exception:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x))

    leaf = jax.tree_util.tree_leaves(state2.params)[0]
    out = {
        "pid": pid,
        "process_count": jax.process_count(),
        "loss": float(fetch(sums["loss"])),
        "count": float(fetch(sums["count"])),
        "param_fingerprint": float(np.abs(fetch(leaf)).sum()),
    }
    print("RESULT " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
