"""Reference-protocol runner: the exact recipes from the reference README
(reference README.md:21-42), producing the rot/trans RMSE table the
reference never published.

Recipes (reference README.md:25-41):
  whole-whole:  lpd pretrain -> vcrnet train (warm-started embedding)
                -> eval (--iter as configured; reference tests at iter=1,
                the paper protocol uses 3)
  part-part:    eval the whole-trained checkpoint under
                --partial --overlap 0.575 --iter 3. (Direct partial-mode
                training has zero parameter gradients by construction — in
                the reference too; its recipe fine-tunes FROM
                vcrnet-whole.t7. See STATUS.md "Notes on partial-protocol
                training".)

Data: real ModelNet40 when it resolves (cfg.data_dir / $VCRNET_DATA /
<repo>/dataset, incl. the auto-download attempt, data/modelnet40.py);
otherwise the synthetic-shapes fallback so the harness runs offline.

Writes <out>/protocol_report.json and prints a markdown table.

Usage:
  python benchmarks/reference_protocol.py            # full (slow) run
  python benchmarks/reference_protocol.py --quick    # smoke shapes/epochs
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vcrnet_tpu.config import Config
from vcrnet_tpu.data.pipeline import make_loaders
from vcrnet_tpu.data.modelnet40 import resolve_data_dir
from vcrnet_tpu.train import Trainer
from vcrnet_tpu.train.checkpoint import merge_pretrained_embedding


def _summary_row(name: str, summary: dict) -> dict:
    keys = (
        "rot_ab_MSE", "rot_ab_RMSE", "rot_ab_MAE",
        "trans_ab_MSE", "trans_ab_RMSE", "trans_ab_MAE",
    )
    return {"protocol": name, **{k: summary.get(k) for k in summary if k in keys}}


def run(args) -> dict:
    base = dict(
        num_points=args.num_points,
        emb_dims=args.emb_dims,
        ff_dims=args.ff_dims,
        batch_size=args.batch_size,
        test_batch_size=args.test_batch_size,
        dataset=args.dataset,
        compute_dtype=args.compute_dtype,
        seed=1234,
    )
    on_real_data = (
        args.dataset == "modelnet40"
        and resolve_data_dir(Config(**base)) is not None
    )
    if args.dataset == "modelnet40" and not on_real_data:
        print("# ModelNet40 not found (and download failed); "
              "running the synthetic-shapes fallback")
        base["dataset"] = "synthetic_shapes"

    report = {
        "data": "modelnet40" if on_real_data else base["dataset"],
        "config": dict(base),
        "rows": [],
    }

    # ---- stage 1: LPD pretrain (reference README.md:25) ----------------
    t0 = time.time()
    lpd_cfg = Config(model="lpd", epochs=args.lpd_epochs, **base)
    lpd_trainer = Trainer(lpd_cfg)
    train_loader, test_loader = make_loaders(lpd_cfg)
    example = next(iter(train_loader))
    lpd_state = lpd_trainer.init_state(jax.random.PRNGKey(1234), example)
    lpd_state, _ = lpd_trainer.fit(
        lpd_state, train_loader, test_loader, epochs=args.lpd_epochs
    )
    print(f"# lpd pretrain: {args.lpd_epochs} epochs, {time.time()-t0:.0f}s")

    # ---- stage 2: VCRNet whole-mode train, warm-started ----------------
    t0 = time.time()
    cfg = Config(model="vcrnet", epochs=args.epochs, **base)
    trainer = Trainer(cfg)
    train_loader, test_loader = make_loaders(cfg)
    example = next(iter(train_loader))
    state = trainer.init_state(jax.random.PRNGKey(1234), example)
    state = state.replace(
        params=merge_pretrained_embedding(
            state.params, lpd_state.params["emb_nn"]
        )
    )
    state, history = trainer.fit(
        state, train_loader, test_loader, epochs=args.epochs
    )
    print(f"# vcrnet train: {args.epochs} epochs, {time.time()-t0:.0f}s")

    # ---- stage 3: whole-whole eval (README.md:30-31) -------------------
    for n_iter in sorted({1, args.iter}):
        ecfg = dataclasses.replace(cfg, iter=n_iter, eval=True)
        etrainer = Trainer(ecfg)
        _, test_loader_e = make_loaders(ecfg)
        summary = etrainer.eval_epoch(state, test_loader_e)
        row = _summary_row(f"whole-whole iter={n_iter}", summary)
        report["rows"].append(row)
        print("#", json.dumps(row, default=float))

    # ---- stage 4: part-part eval (README.md:40-41) ---------------------
    pcfg = dataclasses.replace(
        cfg, partial=True, overlap=0.575, iter=3, eval=True
    )
    ptrainer = Trainer(pcfg)
    _, ptest_loader = make_loaders(pcfg)
    summary = ptrainer.eval_epoch(state, ptest_loader)
    row = _summary_row("part-part overlap=0.575 iter=3", summary)
    report["rows"].append(row)
    print("#", json.dumps(row, default=float))

    return report


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--lpd_epochs", type=int, default=10)
    p.add_argument("--iter", type=int, default=3)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--emb_dims", type=int, default=512)
    p.add_argument("--ff_dims", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--test_batch_size", type=int, default=24)
    p.add_argument("--dataset", type=str, default="modelnet40")
    p.add_argument("--compute_dtype", type=str, default="bfloat16")
    p.add_argument("--out", type=str, default="checkpoints/protocol")
    p.add_argument("--quick", action="store_true",
                   help="tiny shapes/epochs smoke run")
    args = p.parse_args()
    if args.quick:
        args.epochs, args.lpd_epochs = 2, 1
        args.num_points, args.emb_dims, args.ff_dims = 64, 64, 128
        args.batch_size, args.test_batch_size = 8, 8

    report = run(args)
    os.makedirs(args.out, exist_ok=True)
    path = os.path.join(args.out, "protocol_report.json")
    with open(path, "w") as f:
        json.dump(report, f, indent=2, default=float)

    print(f"\n| protocol | rot RMSE (deg) | rot MAE | trans RMSE |")
    print(f"|---|---|---|---|")
    for r in report["rows"]:
        print(
            f"| {r['protocol']} | {r.get('rot_ab_RMSE', float('nan')):.3f} "
            f"| {r.get('rot_ab_MAE', float('nan')):.3f} "
            f"| {r.get('trans_ab_RMSE', float('nan')):.4f} |"
        )
    print(f"\nreport: {path}")


if __name__ == "__main__":
    main()
