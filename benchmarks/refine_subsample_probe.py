"""Offline accuracy probe for Config.refine_subsample (CPU, exact f32).

Runs the whole-whole --iter 3 protocol with a TRAINED checkpoint and
compares the predicted rotations of the subsampled-refinement variants
against the exact cached path, isolating the subsample approximation
from the bf16/packed-select fast-profile noise. Reports per-variant:
  * geodesic deviation (deg) from the exact path's prediction (max/mean),
  * rot RMSE (deg) vs ground truth.

Counterpart of the feature-graph-reuse probe methodology (docs/KERNELS.md
"Feature-graph reuse"). Throughput side: benchmarks/reuse_ab.py [B] sub.

Usage: python benchmarks/refine_subsample_probe.py [n_items] [ckpt]
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")  # exact-arithmetic probe

import jax.numpy as jnp  # noqa: E402

from vcrnet_tpu.config import Config  # noqa: E402
from vcrnet_tpu.data import SyntheticDataset, Loader  # noqa: E402
from vcrnet_tpu.models import VCRNet  # noqa: E402
from vcrnet_tpu.models.vcrnet import vcrnet_iter  # noqa: E402
from vcrnet_tpu.train import Trainer  # noqa: E402
from vcrnet_tpu.train.checkpoint import load_checkpoint  # noqa: E402

CKPT = (
    "/root/repo/checkpoints/train/vcrnet-lpdnet-17-04-40-22-vm/"
    "models/model.best.msgpack"
)


def geodesic_deg(Ra, Rb):
    """Rotation angle of Ra @ Rb^T, degrees, batched."""
    tr = np.einsum("bij,bij->b", Ra, Rb)  # trace(Ra Rb^T)
    c = np.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    return np.degrees(np.arccos(c))


def main():
    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    ckpt = sys.argv[2] if len(sys.argv) > 2 else CKPT
    n_pts = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    base = Config(
        num_points=n_pts, emb_dims=512, test_batch_size=4, iter=3
    )
    trainer = Trainer(base)
    ds = SyntheticDataset(base, "test", n_items=n_items, cloud_points=2048)
    loader = Loader(ds, base.test_batch_size, shuffle=False, drop_last=False)
    state = trainer.init_state(jax.random.PRNGKey(base.seed), next(iter(loader)))
    state = load_checkpoint(ckpt, state)
    variables = state.variables()

    subs = [n_pts // 2, n_pts * 3 // 8, n_pts // 4]
    variants = [("exact", 0)] + [(f"sub{m}", m) for m in subs]
    preds = {name: [] for name, _ in variants}
    gts = []
    fns = {}
    for name, sub in variants:
        model = VCRNet(cfg=base.replace(refine_subsample=sub))
        fns[name] = jax.jit(
            lambda v, s, t, m=model: vcrnet_iter(
                lambda vv, a, b: m.apply(vv, a, b), v, s, t, 3, model=m
            )[2]
        )
    for batch in loader:
        src = jnp.asarray(batch["src"])
        tgt = jnp.asarray(batch["tgt"])
        gts.append(np.asarray(batch["R_ab"]))
        for name, _ in variants:
            preds[name].append(np.asarray(fns[name](variables, src, tgt)))
        print(f"batch done ({len(gts)})", flush=True)

    gt = np.concatenate(gts)
    exact = np.concatenate(preds["exact"])
    print(f"\n{'variant':10s} {'dev_max':>8s} {'dev_mean':>9s} {'rotRMSE':>8s}")
    for name, _ in variants:
        p = np.concatenate(preds[name])
        dev = geodesic_deg(p, exact)
        err = geodesic_deg(p, gt)
        print(
            f"{name:10s} {dev.max():8.3f} {dev.mean():9.3f} "
            f"{np.sqrt((err ** 2).mean()):8.3f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
