"""Accuracy parity reports.

Two modes:

DEFAULT (fast-profile parity): runs the full VCR-Net eval (pretrained
LPDNet embedding, deterministic synthetic eval set) under the exact-f32
and fast TPU profiles and reports rot/trans RMSE side by side. The fast
profile must not move the metrics — this is the evidence behind bench.py's
"at reference RMSE" claim for the speed knobs.

--reference (END-TASK parity vs the reference stack): runs the IDENTICAL
weights and IDENTICAL eval batches through two completely separate stacks —
our JAX pipeline and the torch mirror of the reference eval
(benchmarks/torch_mirror.py: reference forward vcrnet_model.py:495-518,
vcrnetIter :21-43, test_one_epoch/testVCRNet metric math :521-649/:768-806,
scipy euler) — for all three reference protocols:

    whole_iter1    whole-whole, single forward
    whole_iter3    whole-whole, --iter 3
    partial_iter3  part-part, --overlap 0.575 --iter 3

and prints the side-by-side rot/trans RMSE table plus deltas. Agreement
proves the rebuilt eval (model + refinement + metrics) is end-task
equivalent to the reference given the same weights — settling questions
like "is the partial-protocol RMSE reference behavior or a rebuild
regression" without reference hardware.

Weights for --reference: the shipped pretrained LPDNet .t7 + a seeded
random reference-layout transformer by default; pass --ckpt to instead
export a TRAINED checkpoint's params through
train/checkpoint.py::export_vcrnet_state_dict into the torch mirror.

Usage:
    python benchmarks/parity_report.py [n_items]
    python benchmarks/parity_report.py --reference [--n_items 48]
        [--num_points 1024] [--partial_only] [--ckpt path.msgpack]
"""

import argparse
import json
import os
import sys

# runnable both as `python benchmarks/parity_report.py` (script dir on
# path) and with PYTHONPATH=/root/repo (repo root on path)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

from vcrnet_tpu.config import Config
from vcrnet_tpu.data import SyntheticDataset, Loader
from vcrnet_tpu.train import Trainer
from vcrnet_tpu.train.checkpoint import load_t7_lpdnet, merge_pretrained_embedding

T7 = "/root/reference/pretrained/lpd-pretrained.t7"


def run(profile: str, n_items: int):
    kw = dict(num_points=1024, emb_dims=512, test_batch_size=24, iter=1)
    if profile == "fast":
        kw.update(compute_dtype="bfloat16")
    cfg = Config(**kw)
    trainer = Trainer(cfg)
    ds = SyntheticDataset(cfg, "test", n_items=n_items, cloud_points=2048)
    loader = Loader(ds, cfg.test_batch_size, shuffle=False, drop_last=False)
    state = trainer.init_state(
        jax.random.PRNGKey(cfg.seed), next(iter(loader))
    )
    state = state.replace(
        params=merge_pretrained_embedding(state.params, load_t7_lpdnet(T7))
    )
    return trainer.eval_epoch(state, loader)


def fastpath_report(n_items: int = 96) -> None:
    report = {}
    for profile in ("exact", "fast"):
        s = run(profile, n_items)
        report[profile] = {
            k: round(float(v), 6)
            for k, v in s.items()
            if k.startswith(("rot_", "trans_"))
        }
        print(f"[{profile}] " + json.dumps(report[profile]), flush=True)
    drot = abs(
        report["fast"]["rot_ab_RMSE"] - report["exact"]["rot_ab_RMSE"]
    )
    dtr = abs(
        report["fast"]["trans_ab_RMSE"] - report["exact"]["trans_ab_RMSE"]
    )
    print(
        json.dumps(
            {
                "rot_RMSE_delta_deg": round(drot, 4),
                "trans_RMSE_delta": round(dtr, 6),
                "fast_profile_parity": bool(drot < 0.5 and dtr < 0.01),
            }
        )
    )


# ---------------------------------------------------------------------------
# --reference mode
# ---------------------------------------------------------------------------


def build_params(cfg: Config, model, example, ckpt: str):
    """Identical weights for both stacks: trained checkpoint if given, else
    shipped .t7 LPDNet + seeded reference-layout transformer."""
    import jax.numpy as jnp

    variables = model.init(
        jax.random.PRNGKey(cfg.seed),
        jnp.asarray(example["src"][:1]), jnp.asarray(example["tgt"][:1]),
    )
    params = variables["params"]
    if ckpt:
        from flax import serialization

        with open(ckpt, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        from vcrnet_tpu.train.checkpoint import merge_params

        return merge_params(
            serialization.to_state_dict(params), raw.get("params", raw)
        )
    from benchmarks.torch_mirror import make_reference_state_dict
    from vcrnet_tpu.train.checkpoint import (
        convert_transformer_state_dict,
        merge_params,
    )

    rng = np.random.RandomState(cfg.seed)
    sd_tr = make_reference_state_dict(rng, d=cfg.emb_dims, ff=cfg.ff_dims)
    sd_np = {k: v.numpy() for k, v in sd_tr.items()}
    return merge_params(
        params,
        {
            "emb_nn": load_t7_lpdnet(T7),
            "pointer": convert_transformer_state_dict(sd_np),
        },
    )


def reference_parity(
    protocol: str, n_items: int, num_points: int, ckpt: str
) -> dict:
    """One protocol through both stacks on identical batches."""
    import torch

    from benchmarks import torch_mirror as tm
    from vcrnet_tpu.models import VCRNet
    from vcrnet_tpu.train.checkpoint import export_vcrnet_state_dict

    partial = protocol.startswith("partial")
    n_iter = int(protocol.rsplit("iter", 1)[1])
    cfg = Config(
        num_points=num_points, emb_dims=512, ff_dims=1024, n_heads=4,
        test_batch_size=24, iter=n_iter, partial=partial,
        overlap=0.575 if partial else 0.75,
    )
    ds = SyntheticDataset(cfg, "test", n_items=n_items, cloud_points=2048)
    loader = Loader(ds, cfg.test_batch_size, shuffle=False, drop_last=False)
    batches = list(loader)  # materialize ONCE; both stacks see these bytes

    model = VCRNet(cfg=cfg)
    params = build_params(cfg, model, batches[0], ckpt)

    # --- JAX stack ---
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed), batches[0])
    state = state.replace(params=jax.device_put(params))
    ours = trainer.eval_epoch(state, batches)

    # --- torch mirror of the reference stack ---
    sd = {
        k: torch.tensor(np.asarray(v))
        for k, v in export_vcrnet_state_dict(params).items()
    }
    net = tm.TorchVCRNet(
        sd, d=cfg.emb_dims, h=cfg.n_heads,
        overlap2=cfg.overlap2 if partial else None,
    )
    theirs = tm.eval_protocol(net, batches, n_iter=n_iter)

    keys = (
        "rot_ab_RMSE", "rot_ab_MAE", "trans_ab_RMSE", "trans_ab_MAE",
        "rot_ba_RMSE", "trans_ba_RMSE",
    )
    row = {
        "jax": {k: round(float(ours[k]), 6) for k in keys},
        "torch_reference": {k: round(float(theirs[k]), 6) for k in keys},
    }
    row["delta"] = {
        k: round(abs(row["jax"][k] - row["torch_reference"][k]), 6)
        for k in keys
    }
    row["parity"] = bool(
        row["delta"]["rot_ab_RMSE"] < 0.05
        and row["delta"]["trans_ab_RMSE"] < 1e-3
    )
    return row


def reference_report(args) -> None:
    protocols = (
        ("partial_iter3",)
        if args.partial_only
        else ("whole_iter1", "whole_iter3", "partial_iter3")
    )
    report = {}
    for p in protocols:
        report[p] = reference_parity(
            p, args.n_items, args.num_points, args.ckpt
        )
        print(f"[{p}] " + json.dumps(report[p]), flush=True)
    print(
        json.dumps(
            {
                "end_task_reference_parity": bool(
                    all(r["parity"] for r in report.values())
                ),
                "weights": args.ckpt or "t7-lpdnet + seeded pointer",
                "n_items": args.n_items,
                "num_points": args.num_points,
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_items_pos", nargs="?", type=int, default=96)
    ap.add_argument("--reference", action="store_true")
    ap.add_argument("--n_items", type=int, default=48)
    ap.add_argument("--num_points", type=int, default=1024)
    ap.add_argument("--partial_only", action="store_true")
    ap.add_argument("--ckpt", type=str, default="")
    args = ap.parse_args()
    if args.reference:
        reference_report(args)
    else:
        fastpath_report(args.n_items_pos)


if __name__ == "__main__":
    main()
