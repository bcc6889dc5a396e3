"""CLI surface tests: flag parsing matches the reference semantics."""

import numpy as np

from vcrnet_tpu.cli import build_parser, config_from_args


def parse(argv):
    return config_from_args(build_parser().parse_args(argv))


def test_defaults_match_reference():
    # reference util/initPara.py:129-199 defaults
    cfg = parse([])
    assert cfg.model == "vcrnet"
    assert cfg.emb_nn == "lpdnet"
    assert cfg.vcp_nn == "topK"
    assert cfg.emb_dims == 512
    assert cfg.num_points == 1024
    assert cfg.ff_dims == 1024
    assert cfg.n_blocks == 1 and cfg.n_heads == 4
    assert cfg.lr == 0.001
    assert cfg.loss == "point"
    assert cfg.iter == 1
    assert cfg.seed == 1234
    assert not cfg.partial and not cfg.eval and not cfg.cycle


def test_partial_protocol_flags():
    # reference README partial-partial eval command (README.md:37-41)
    cfg = parse(
        ["--partial", "--overlap", "0.575", "--iter", "3", "--eval",
         "--test_batch_size", "24"]
    )
    assert cfg.partial and cfg.eval
    assert cfg.iter == 3
    assert abs(cfg.reserve - 0.7506812782552477) < 1e-9
    assert cfg.n_cropped == int(1024 * cfg.reserve)


def test_bool_flags_are_store_true():
    # the reference's type=bool flags treat ANY string as True; ours are
    # real flags
    cfg = parse(["--gaussian_noise", "--unseen", "--cycle"])
    assert cfg.gaussian_noise and cfg.unseen and cfg.cycle
    cfg = parse([])
    assert not (cfg.gaussian_noise or cfg.unseen or cfg.cycle)


def test_tpu_flags():
    cfg = parse(["--compute_dtype", "bfloat16", "--mesh_shape", "4"])
    assert cfg.compute_dtype == "bfloat16"
    assert cfg.mesh_shape == 4
