"""Why does composing the optimizer with the grad graph cost ~17 ms?

Compares, all carrying the same pytrees through a lax.scan:
  a) grad only (params carry)                      -- baseline ~140 ms
  b) grad + hand-rolled adam (params+mu+nu carry)  -- isolates optax
  c) grad + optax tx (full TrainState carry)       -- the shipped step
  d) grad only but with mu/nu dead weight in carry -- isolates carry size

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/opt_compose_probe.py [B]
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

    zero_m = jax.tree_util.tree_map(jnp.zeros_like, state.params)

    def a_grad_only(s, T):
        def body(p, _):
            loss, g = jax.value_and_grad(loss_only)(p)
            p2 = jax.tree_util.tree_map(
                lambda a, b: a - 1e-30 * b - 1e-30 * loss.astype(a.dtype),
                p, g)
            return p2, None
        p, _ = jax.lax.scan(body, s.params, None, length=T)
        return jax.tree_util.tree_leaves(p)[0].sum()

    def b_manual_adam(s, T):
        lr, b1, b2, eps, wd = 1e-3, 0.9, 0.999, 1e-8, 1e-4

        def body(carry, _):
            p, mu, nu, t = carry
            loss, g = jax.value_and_grad(loss_only)(p)
            g = jax.tree_util.tree_map(lambda gi, pi: gi + wd * pi, g, p)
            t = t + 1
            mu = jax.tree_util.tree_map(
                lambda m, gi: b1 * m + (1 - b1) * gi, mu, g)
            nu = jax.tree_util.tree_map(
                lambda v, gi: b2 * v + (1 - b2) * gi * gi, nu, g)
            bc1 = 1 - b1 ** t.astype(jnp.float32)
            bc2 = 1 - b2 ** t.astype(jnp.float32)
            p = jax.tree_util.tree_map(
                lambda pi, m, v: pi - lr * (m / bc1)
                / (jnp.sqrt(v / bc2) + eps),
                p, mu, nu)
            return (p, mu, nu, t), None
        (p, _, _, _), _ = jax.lax.scan(
            body, (s.params, zero_m, zero_m, jnp.zeros((), jnp.int32)),
            None, length=T)
        return jax.tree_util.tree_leaves(p)[0].sum()

    def c_optax(s, T):
        def body(st, _):
            loss, g = jax.value_and_grad(loss_only)(st.params)
            updates, opt_state = trainer.tx.update(g, st.opt_state, st.params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u, st.params, updates)
            return st.replace(params=params, opt_state=opt_state,
                              step=st.step + 1), None
        st, _ = jax.lax.scan(body, s, None, length=T)
        return jax.tree_util.tree_leaves(st.params)[0].sum()

    def c2_optax_loss_out(s, T):
        """Same as c but scan emits per-iter loss and returns losses[-1]
        (the glue probe's shape, which measured ~17 ms slower)."""
        def body(st, _):
            loss, g = jax.value_and_grad(loss_only)(st.params)
            updates, opt_state = trainer.tx.update(g, st.opt_state, st.params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u, st.params, updates)
            return st.replace(params=params, opt_state=opt_state,
                              step=st.step + 1), loss
        st, losses = jax.lax.scan(body, s, None, length=T)
        return losses[-1]

    def d_dead_carry(s, T):
        def body(carry, _):
            p, mu, nu = carry
            loss, g = jax.value_and_grad(loss_only)(p)
            p2 = jax.tree_util.tree_map(
                lambda a, b: a - 1e-30 * b - 1e-30 * loss.astype(a.dtype),
                p, g)
            return (p2, mu, nu), None
        (p, _, _), _ = jax.lax.scan(
            body, (s.params, zero_m, zero_m), None, length=T)
        return jax.tree_util.tree_leaves(p)[0].sum()

    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    for name, fn, init in (
        ("a grad only", a_grad_only, state),
        ("b grad+manual adam", b_manual_adam, state),
        ("c grad+optax tx", c_optax, state),
        ("c2 optax, loss out", c2_optax_loss_out, state),
        ("d grad+dead mu/nu carry", d_dead_carry, state),
    ):
        if only is not None and name.split()[0] not in only:
            continue
        dt = chain(fn, init)
        print(f"{name:26s} {dt*1000:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
