"""Dump optimized HLO for the loss-live vs loss-dead scan variants.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/opt_hlo_dump.py
Writes /tmp/hlo_c.txt (loss dead) and /tmp/hlo_c2.txt (loss live).
"""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vcrnet_tpu.config import Config
from vcrnet_tpu.train import Trainer


def main():
    B = 64
    cfg = Config(num_points=1024, emb_dims=512, batch_size=B,
                 compute_dtype="bfloat16")
    trainer = Trainer(cfg)
    rng = np.random.RandomState(0)
    n = cfg.n_cropped
    eye = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    zeros = np.zeros((B, 3), np.float32)
    batch = {
        "src": rng.rand(B, n, 3).astype(np.float32) - 0.5,
        "tgt": rng.rand(B, n, 3).astype(np.float32) - 0.5,
        "R_ab": eye, "t_ab": zeros, "R_ba": eye, "t_ba": zeros,
        "euler_ab": zeros, "euler_ba": zeros,
        "valid": np.ones(B, np.float32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    dev = trainer._to_device(batch)
    valid = dev["valid"]

    def loss_only(params):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out, _ = trainer._apply(
            variables, dev["src"], dev["tgt"], train=True, rngs=None
        )
        loss, _ = trainer._vcrnet_loss_and_sums(out, dev, valid)
        return loss

    def body(st, _):
        loss, g = jax.value_and_grad(loss_only)(st.params)
        updates, opt_state = trainer.tx.update(g, st.opt_state, st.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, st.params, updates)
        return st.replace(params=params, opt_state=opt_state,
                          step=st.step + 1), loss

    def c_dead(s):
        st, _ = jax.lax.scan(body, s, None, length=5)
        return jax.tree_util.tree_leaves(st.params)[0].sum()

    def c2_live(s):
        st, losses = jax.lax.scan(body, s, None, length=5)
        return losses[-1]

    for name, fn in (("c", c_dead), ("c2", c2_live)):
        txt = jax.jit(fn).lower(state).compile().as_text()
        path = f"/tmp/hlo_{name}.txt"
        with open(path, "w") as f:
            f.write(txt)
        print(name, len(txt.splitlines()), "lines ->", path, flush=True)


if __name__ == "__main__":
    main()
