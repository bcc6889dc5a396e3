"""Accuracy parity report: exact-f32 path vs fast TPU profile.

Runs the full VCR-Net eval (pretrained LPDNet embedding, deterministic
synthetic eval set built by the reference-parity data pipeline) under both
precision profiles and reports rot/trans RMSE side by side. The fast profile
must not move the metrics — this is the evidence behind bench.py's "at
reference RMSE" claim for the speed knobs.

(The end-task reference numbers themselves require the real ModelNet40 h5
files and a trained head — neither ships with the reference repo; see
BASELINE.md. Everything downstream of the data — augmentation RNG, model
semantics, metric math — is golden-tested against torch in tests/.)

Usage: python benchmarks/parity_report.py [n_items]
"""

import json
import sys

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


def main():
    n_items = int(sys.argv[1]) if len(sys.argv) > 1 else 96
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


if __name__ == "__main__":
    main()
