"""Utility tests: params table, memory probe, metrics writer, step timer."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from vcrnet_tpu.utils import (
    save_params_table,
    count_params,
    device_memory_mb,
    MetricsWriter,
    StepTimer,
)


def test_params_table_and_count(tmp_path):
    params = {"layer": {"kernel": jnp.ones((3, 4)), "bias": jnp.zeros(4)}}
    assert count_params(params) == 16
    path = save_params_table(params, str(tmp_path / "net.csv"))
    import pandas as pd

    df = pd.read_csv(path)
    assert set(df["name"]) == {"layer/kernel", "layer/bias"}
    assert df["params"].sum() == 16

    # values=True dumps the full flattened weights (reference
    # saveNetAsExcel's (name, tensor) sheet, util/initPara.py:68-74)
    vpath = save_params_table(
        params, str(tmp_path / "net_vals.csv"), values=True
    )
    vdf = pd.read_csv(vpath)
    row = vdf[vdf["name"] == "layer/bias"].iloc[0]
    assert [float(v) for v in row["values"].strip("[]").split()] == [0.0] * 4


def test_memory_probe_runs():
    mb = device_memory_mb()
    assert mb is None or mb >= 0


def test_metrics_writer(tmp_path):
    w = MetricsWriter(str(tmp_path))
    w.scalar("a/b", 1.0, 0)
    w.scalars("pre", {"x": 1.0, "y": 2, "skip": "str"}, 1)
    w.close()
    assert any(f.startswith("events") for f in os.listdir(tmp_path))


def test_step_timer():
    t = StepTimer()
    assert t.tick() is None
    assert t.tick() is not None
    assert t.rate(10) > 0


def test_attention_capture():
    from vcrnet_tpu.models.transformer import MultiHeadAttention

    m = MultiHeadAttention(n_heads=2, d_model=8, capture_attention=True)
    x = jnp.ones((1, 4, 8))
    variables = m.init(jax.random.PRNGKey(0), x, x, x)
    out, inter = m.apply(variables, x, x, x, mutable=["intermediates"])
    attn = inter["intermediates"]["attn"][0]
    assert attn.shape == (1, 4, 4)  # summed over heads
    np.testing.assert_allclose(
        np.asarray(attn.sum(-1)), 2.0, atol=1e-5
    )  # rows sum to n_heads


def test_progress_counts_and_respects_off_switch(monkeypatch, capsys):
    from vcrnet_tpu.utils.logging import Progress

    monkeypatch.setenv("VCRNET_PROGRESS", "0")
    prog = Progress(desc="train")
    seen = list(prog.wrap(iter(range(5)), total=5))
    assert seen == list(range(5))
    assert prog.n == 5 and prog.total == 5
    assert capsys.readouterr().err == ""  # disabled -> no terminal noise

    monkeypatch.setenv("VCRNET_PROGRESS", "1")
    prog = Progress(desc="eval")
    list(prog.wrap([1, 2, 3]))
    err = capsys.readouterr().err
    assert "3/3" in err and "eval" in err
