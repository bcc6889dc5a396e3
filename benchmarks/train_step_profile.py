"""Attribute the train step's device time: forward-only loss, forward +
backward, and the full step (fwd + bwd + Adam + metric sums), all measured
with the chained-scan trick so the tunnel's ~30 ms host-fetch latency
cancels. Differences attribute cost to backward vs optimizer/metrics glue.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/train_step_profile.py [B]
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
    """Median of ((T2 steps) - (1 step)) / (T2 - 1) wall times."""
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
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.params)
    )
    print(f"B={B}, n={n}, params={n_params/1e6:.2f}M", flush=True)

    def loss_of(params):
        variables = {"params": params}
        if state.batch_stats:
            variables["batch_stats"] = state.batch_stats
        out, _ = trainer._apply(
            variables, dev["src"], dev["tgt"], train=True, rngs=None
        )
        loss, _ = trainer._vcrnet_loss_and_sums(out, dev, valid)
        return loss

    def perturb(params, loss):
        # tiny data dependence so scan can't collapse the chain
        eps = (1e-30 * loss).astype(jnp.float32)
        return jax.tree_util.tree_map(lambda p: p + eps.astype(p.dtype), params)

    def fwd_chain(s, T):
        def body(p, _):
            return perturb(p, loss_of(p)), None
        p, _ = jax.lax.scan(body, s.params, None, length=T)
        return jax.tree_util.tree_leaves(p)[0].sum()

    def grad_chain(s, T):
        def body(p, _):
            loss, g = jax.value_and_grad(loss_of)(p)
            p2 = jax.tree_util.tree_map(
                lambda a, b: a - 1e-30 * b, perturb(p, loss), g
            )
            return p2, None
        p, _ = jax.lax.scan(body, s.params, None, length=T)
        return jax.tree_util.tree_leaves(p)[0].sum()

    def full_chain(s, T):
        def body(st, _):
            st2, sums = trainer._train_step_impl(st, dev)
            return st2, sums["loss"]
        st, losses = jax.lax.scan(body, s, None, length=T)
        # keep the updated state LIVE in the output: returning only
        # losses[-1] lets XLA DCE the backward+optimizer on the T=1 leg
        # (the loss needs only the forward), inflating the slope ~17 ms
        # (see CLAUDE.md "chained-timing artifact")
        return losses[-1] + jax.tree_util.tree_leaves(st.params)[0].ravel()[0]

    # --- component fwd+bwd: embedding only, pointer only -----------------
    variables0 = {"params": state.params}
    if state.batch_stats:
        variables0["batch_stats"] = state.batch_stats
    model = trainer.model

    def embed_loss(params):
        variables = dict(variables0, params=params)
        from vcrnet_tpu.models.vcrnet import VCRNet
        e = model.apply(variables, dev["src"], train=True, method=VCRNet.embed)
        return (e.astype(jnp.float32) ** 2).mean()

    emb0 = model.apply(variables0, dev["src"], method=lambda m, s: m.embed(s))
    emb0 = jax.device_put(np.asarray(emb0, np.float32))

    def pointer_loss(params):
        variables = dict(variables0, params=params)
        sd, td = model.apply(
            variables, emb0, emb0,
            method=lambda m, a, b: m.pointer(a, b, train=True),
        )
        return (sd.astype(jnp.float32) ** 2).mean() + (
            td.astype(jnp.float32) ** 2
        ).mean()

    def comp_chain(loss_f):
        def chain_fn(s, T):
            def body(p, _):
                loss, g = jax.value_and_grad(loss_f)(p)
                p2 = jax.tree_util.tree_map(
                    lambda a, b: a - 1e-30 * b, perturb(p, loss), g
                )
                return p2, None
            p, _ = jax.lax.scan(body, s.params, None, length=T)
            return jax.tree_util.tree_leaves(p)[0].sum()
        return chain_fn

    # --- optimizer + metric sums in isolation ----------------------------
    grads0 = jax.jit(jax.grad(lambda p: loss_of(p)))(state.params)

    def opt_chain(s, T):
        def body(st, _):
            updates, opt_state = trainer.tx.update(
                grads0, st.opt_state, st.params
            )
            params = jax.tree_util.tree_map(
                lambda p, u: p + u, st.params, updates
            )
            return st.replace(params=params, opt_state=opt_state,
                              step=st.step + 1), None
        st, _ = jax.lax.scan(body, s, None, length=T)
        return jax.tree_util.tree_leaves(st.params)[0].sum()

    def sums_chain(s, T):
        def body(p, _):
            variables = dict(variables0, params=p)
            out, _ = trainer._apply(
                variables, dev["src"], dev["tgt"], train=True, rngs=None
            )
            loss, sums = trainer._vcrnet_loss_and_sums(out, dev, valid)
            total = sum(jnp.sum(v) for v in sums.values()) + loss
            return perturb(p, total), None
        p, _ = jax.lax.scan(body, s.params, None, length=T)
        return jax.tree_util.tree_leaves(p)[0].sum()

    t_f = chain(fwd_chain, state)
    print(f"forward-only loss:      {t_f*1000:8.1f} ms", flush=True)
    t_fs = chain(sums_chain, state)
    print(f"forward + metric sums:  {t_fs*1000:8.1f} ms "
          f"(sums ~{(t_fs-t_f)*1000:.1f})", flush=True)
    t_g = chain(grad_chain, state)
    print(f"forward+backward:       {t_g*1000:8.1f} ms "
          f"(backward ~{(t_g-t_f)*1000:.1f})", flush=True)
    t_e = chain(comp_chain(embed_loss), state)
    print(f"embed fwd+bwd (1 cloud):{t_e*1000:8.1f} ms", flush=True)
    t_p = chain(comp_chain(pointer_loss), state)
    print(f"pointer fwd+bwd:        {t_p*1000:8.1f} ms", flush=True)
    t_o = chain(opt_chain, state)
    print(f"optimizer update alone: {t_o*1000:8.1f} ms", flush=True)
    t_s = chain(full_chain, state)
    print(f"full train step:        {t_s*1000:8.1f} ms "
          f"(optimizer/sums ~{(t_s-t_g)*1000:.1f})", flush=True)
    print(f"-> {B/t_s:.1f} pairs/s/chip", flush=True)


if __name__ == "__main__":
    main()
