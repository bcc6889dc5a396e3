"""Isolate the ~17 ms gap between (fwd+bwd) and the full train step.

Candidate costs: the has_aux sums plumbing, the optimizer composed with
the grad graph (vs alone), and TrainState threading through scan.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/step_glue_probe.py [B]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vcrnet_tpu.config import Config
from vcrnet_tpu.train import Trainer


def chain(fn, init, T2=5, reps=5):
    fs = {}
    for T in (1, T2):
        fs[T] = jax.jit(lambda s, TT=T: fn(s, TT))
        np.asarray(fs[T](init))
    ds = []
    for _ in range(reps):
        out = {}
        for T in (1, T2):
            t0 = time.perf_counter()
            np.asarray(fs[T](init))
            out[T] = time.perf_counter() - t0
        ds.append((out[T2] - out[1]) / (T2 - 1))
    return float(np.median(ds))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = Config(
        num_points=1024, emb_dims=512, batch_size=B,
        compute_dtype="bfloat16",
    )
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

    def loss_aux(params):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out, _ = trainer._apply(
            variables, dev["src"], dev["tgt"], train=True, rngs=None
        )
        loss, sums = trainer._vcrnet_loss_and_sums(out, dev, valid)
        return loss, sums

    def grad_opt_chain(s, T):
        """grad + optimizer + state threading, NO sums aux."""
        def body(st, _):
            loss, g = jax.value_and_grad(loss_only)(st.params)
            updates, opt_state = trainer.tx.update(g, st.opt_state, st.params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u, st.params, updates
            )
            return st.replace(
                params=params, opt_state=opt_state, step=st.step + 1
            ), loss
        st, losses = jax.lax.scan(body, s, None, length=T)
        return losses[-1]

    def grad_aux_chain(s, T):
        """grad with has_aux sums, NO optimizer (perturb params)."""
        def body(p, _):
            (loss, sums), g = jax.value_and_grad(loss_aux, has_aux=True)(p)
            eps = (1e-30 * (loss + sums["loss"])).astype(jnp.float32)
            p2 = jax.tree_util.tree_map(
                lambda a, b: a + eps.astype(a.dtype) - 1e-30 * b, p, g
            )
            return p2, None
        p, _ = jax.lax.scan(body, s.params, None, length=T)
        return jax.tree_util.tree_leaves(p)[0].sum()

    def full_chain(s, T):
        def body(st, _):
            st2, sums = trainer._train_step_impl(st, dev)
            return st2, sums["loss"]
        st, losses = jax.lax.scan(body, s, None, length=T)
        return losses[-1]

    for name, fn, init in (
        ("grad+opt (no sums)", grad_opt_chain, state),
        ("grad+sums (no opt)", grad_aux_chain, state),
        ("full step", full_chain, state),
    ):
        dt = chain(fn, init)
        print(f"{name:22s} {dt*1000:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
