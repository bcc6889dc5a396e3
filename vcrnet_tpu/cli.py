"""Argparse CLI with the reference's flag surface (util/initPara.py:129-199)
and dispatch semantics (main.py:13-40): (model, eval) -> train/test.

Differences from the reference, deliberate:
  * --gaussian_noise/--unseen/--cycle are real store_true flags (the
    reference used type=bool, the classic argparse gotcha where any
    non-empty string parses True);
  * run artifacts land under checkpoints/{train,test}/<model>-<emb>-<ts>,
    with full TrainState checkpoints (resume keeps optimizer + LR state);
  * extra TPU flags: --compute_dtype, --mesh_shape, --data_dir.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import socket
from datetime import datetime

from vcrnet_tpu.config import Config
from vcrnet_tpu.utils import IOStream


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Point Cloud Registration (TPU)")
    p.add_argument("--iter", type=int, default=1)
    p.add_argument("--overlap", type=float, default=0.75)
    p.add_argument("--model", type=str, default="vcrnet",
                   choices=["dcp", "lpd", "vcrnet", "icp"])
    p.add_argument("--gaussian_noise", action="store_true", default=False)
    p.add_argument("--unseen", action="store_true", default=False)
    p.add_argument("--factor", type=float, default=4,
                   help="rotations drawn from [0, pi/factor]")
    # NOTE deliberate divergence: the reference also accepts
    # --emb_nn lpdnetorigin (initPara.py:141) but has no handler for it —
    # selecting it raises at vcrnet_model.py:475. We drop the dead choice.
    p.add_argument("--emb_nn", type=str, default="lpdnet",
                   choices=["pointnet", "dgcnn", "lpdnet"])
    p.add_argument("--vcp_nn", type=str, default="topK",
                   choices=["topK", "att", "dist"])
    p.add_argument("--emb_dims", type=int, default=512)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--test_batch_size", type=int, default=24)
    p.add_argument("--lr", type=float, default=0.001)
    p.add_argument("--num_points", type=int, default=1024)
    p.add_argument("--max_iterations", type=int, default=50)
    p.add_argument("--ff_dims", type=int, default=1024)
    p.add_argument("--eval", action="store_true", default=False)
    p.add_argument("--partial", action="store_true", default=False)
    p.add_argument("--t3d", action="store_true", default=False)
    p.add_argument("--tfea", action="store_true", default=False)
    p.add_argument("--loss", type=str, default="point",
                   choices=["pose", "point", "mixed"])
    p.add_argument("--cycle", action="store_true", default=False)
    p.add_argument("--model_path", type=str, default="")
    p.add_argument("--dataset", type=str, default="modelnet40",
                   choices=["modelnet40", "kitti", "synthetic", "synthetic_shapes"])
    p.add_argument("--n_blocks", type=int, default=1)
    p.add_argument("--n_heads", type=int, default=4)
    p.add_argument("--dropout", type=float, default=0.0)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--use_sgd", action="store_true", default=False)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--exp_name", type=str, default="exp")
    p.add_argument("--pointer", type=str, default="transformer",
                   choices=["identity", "transformer"])
    p.add_argument("--head", type=str, default="svd", choices=["mlp", "svd"])
    # TPU-specific
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "tpu"],
                   help="force a jax backend: 'cpu' escapes a wedged TPU "
                        "tunnel; default uses whatever jax picks")
    p.add_argument("--tpu_probe_timeout", type=float,
                   default=float(
                       os.environ.get("VCRNET_TPU_PROBE_TIMEOUT_S", "120")
                   ),
                   help="seconds before a TPU-responsiveness probe declares "
                        "the backend wedged and exits (0 disables the probe; "
                        "default 120 — the live tunnel has been observed to "
                        "take >60 s for a trivial matmul while still healthy; "
                        "env VCRNET_TPU_PROBE_TIMEOUT_S overrides)")
    p.add_argument("--tpu_probe_window", type=float,
                   default=float(
                       os.environ.get("VCRNET_TPU_PROBE_WINDOW_S", "0")
                   ),
                   help="seconds to keep retrying a failed TPU probe before "
                        "giving up (0 = single-shot fail-fast; set to e.g. "
                        "1800 for unattended runs that should survive a "
                        "transient tunnel flap; env VCRNET_TPU_PROBE_WINDOW_S "
                        "overrides)")
    p.add_argument("--compute_dtype", type=str, default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--mesh_shape", type=int, default=None)
    p.add_argument("--data_dir", type=str, default=None)
    p.add_argument("--int8_train_gathers", action=argparse.BooleanOptionalAction,
                   default=True,
                   help="int8 one-hot gathers in the TRAINING fused kernels "
                        "(straight-through backward; +9.5%% step throughput, "
                        "default ON since round 4 — see Config/KERNELS.md); "
                        "--no-int8_train_gathers restores exact-bf16 gathers")
    p.add_argument("--reuse_feature_knn", action="store_true", default=False,
                   help="eval refinement: reuse an earlier iteration's "
                        "feature-graph kNN in later ones (approximate)")
    p.add_argument("--feature_knn_refresh", type=int, default=1,
                   help="with --reuse_feature_knn: leading iterations that "
                        "compute a fresh feature graph (see Config)")
    p.add_argument("--remat", action="store_true", default=False,
                   help="rematerialize the training forward (exact; trades "
                        "~1 extra forward of FLOPs for activation HBM — "
                        "lever for larger --batch_size / --num_points)")
    p.add_argument("--pretrained_t7", type=str, default="",
                   help="optional LPDNet .t7 to warm-start the embedding")
    p.add_argument("--show_worst", type=int, default=0,
                   help="after eval, report the K worst rot/trans cases "
                        "(reference showBad, dcp_model.py:506-556)")
    return p


def config_from_args(args) -> Config:
    fields = {f.name for f in dataclasses.fields(Config) if f.init}
    kw = {k: v for k, v in vars(args).items() if k in fields}
    return Config(**kw)


def make_run_dir(cfg: Config) -> str:
    sub = "test" if cfg.eval else "train"
    stamp = datetime.now().strftime("%d-%H-%M-%S")
    host = socket.gethostname()[:3]
    name = f"{cfg.model}-{cfg.emb_nn}-{stamp}-{host}"
    run_dir = os.path.join("checkpoints", sub, name)
    os.makedirs(os.path.join(run_dir, "models"), exist_ok=True)
    return run_dir


def main(argv=None):
    import jax
    import numpy as np

    # parse BEFORE touching the backend: jax.default_backend() forces full
    # TPU client init, which must not gate --help / argparse errors (on the
    # tunnel backend it can block for a long round-trip, or hang outright
    # during an outage)
    args = build_parser().parse_args(argv)

    if args.platform:
        # env vars are not enough in this container (sitecustomize
        # force-registers the tunnel TPU platform); the config update
        # after import is the reliable escape hatch.
        jax.config.update("jax_platforms", args.platform)

    if args.platform != "cpu" and args.tpu_probe_timeout > 0:
        # Fail fast instead of hanging when the tunnel TPU is wedged —
        # jax.default_backend() below would otherwise block indefinitely.
        from vcrnet_tpu.utils.tpu_probe import TPUUnresponsiveError, probe_tpu

        try:
            probe_tpu(
                timeout_s=args.tpu_probe_timeout,
                window_s=args.tpu_probe_window,
            )
        except TPUUnresponsiveError as e:
            raise SystemExit(f"FATAL: {e}")

    try:
        if jax.default_backend() == "tpu":
            # persistent compile cache: CLI reruns skip the cold XLA/Mosaic
            # compile. TPU-only — the cached executables are AOT artifacts
            # that crash the CPU backend with a libtpu version mismatch.
            jax.config.update(
                "jax_compilation_cache_dir", "/tmp/jax_comp_cache"
            )
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", 1.0
            )
    except RuntimeError:
        pass  # no backend at all (e.g. doc builds); nothing to cache

    cfg = config_from_args(args)
    np.random.seed(cfg.seed)

    run_dir = make_run_dir(cfg)
    textio = IOStream(os.path.join(run_dir, "run.log"))
    textio.cprint(str(cfg))

    from vcrnet_tpu.data.pipeline import make_loaders
    from vcrnet_tpu.train import Trainer
    from vcrnet_tpu.train.checkpoint import (
        load_checkpoint,
        load_t7_vcrnet,
        merge_params,
    )

    train_loader, test_loader = make_loaders(cfg)
    trainer = Trainer(cfg)
    textio.cprint(f"devices: {jax.devices()}")

    if cfg.model == "icp":
        if not cfg.eval:
            textio.cprint("icp can't be trained")  # reference main.py:33
            return
        from vcrnet_tpu.train.engine import TrainState
        import jax.numpy as jnp

        state = TrainState(params={}, batch_stats={}, opt_state=None,
                           step=jnp.asarray(0, jnp.int32))
    else:
        example = next(iter(test_loader if cfg.eval else train_loader))
        state = trainer.init_state(jax.random.PRNGKey(cfg.seed), example)
        n_params = sum(
            int(np.prod(np.shape(x)))
            for x in jax.tree_util.tree_leaves(state.params)
        )
        textio.cprint(f"Model {cfg.model}: params: {n_params * 4 / 1e6:4f}M")

        if args.model_path:
            state = load_checkpoint(args.model_path, state)
            textio.cprint(f"loaded checkpoint {args.model_path}")
        if args.pretrained_t7:
            converted = load_t7_vcrnet(args.pretrained_t7, n_blocks=cfg.n_blocks)
            state = state.replace(
                params=merge_params(state.params, converted)
            )
            textio.cprint(
                f"loaded .t7 (components: {sorted(converted)}) "
                f"from {args.pretrained_t7}"
            )

    from vcrnet_tpu.utils import MetricsWriter

    boardio = MetricsWriter(run_dir)
    if cfg.eval:
        summary = trainer.eval_epoch(state, test_loader)
        textio.cprint("==FINAL TEST==")
        textio.cprint("A--------->B")
        textio.cprint(json.dumps(summary, indent=2, default=float))
        if args.show_worst > 0 and cfg.model != "lpd":
            worst = trainer.worst_cases(state, test_loader, k=args.show_worst)
            textio.cprint(
                f"worst rotation cases (dataset idx): {worst['worst_rot_idx']}"
            )
            textio.cprint(
                f"worst translation cases: {worst['worst_trans_idx']}"
            )
    else:
        ckpt_dir = os.path.join(run_dir, "models")
        state, history = trainer.fit(
            state, train_loader, test_loader,
            log=textio.cprint, checkpoint_dir=ckpt_dir,
            metrics_writer=boardio,
        )
        with open(os.path.join(run_dir, "history.json"), "w") as f:
            json.dump(history, f, default=float)

    textio.cprint("FINISH")
    boardio.close()
    textio.close()


if __name__ == "__main__":
    main()
