"""Capture a jax.profiler device trace of the FULL whole_iter3 eval step
(the reference flagship protocol) so per-op time attribution comes from
the hardware timeline instead of component-level chained timings.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/iter3_trace.py [B] [n_iter]
Writes the trace under /tmp/iter3_trace/; summarize with
    python benchmarks/iter3_trace.py --summarize
which prints the top ops by self time from the .xplane.pb protobuf.
"""

import sys

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os
import sys as _sys

_sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

TRACE_DIR = "/tmp/iter3_trace"


def summarize():
    """Top ops by self time from the newest .xplane.pb under TRACE_DIR,
    via xprof's framework_op_stats converter (the same aggregation the
    TensorBoard profile plugin shows)."""
    import glob
    import json

    from xprof.convert import raw_to_tool_data as rtd

    paths = sorted(
        glob.glob(os.path.join(TRACE_DIR, "**", "*.xplane.pb"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not paths:
        print("no xplane.pb found under", TRACE_DIR)
        return
    path = paths[-1]
    print("summarizing", path)
    for tool in ("framework_op_stats", "hlo_stats"):
        try:
            data, _ = rtd.xspace_to_tool_data([path], tool, {})
        except Exception as e:
            print(tool, "failed:", e)
            continue
        if isinstance(data, bytes):
            data = data.decode("utf-8", "replace")
        out = f"/tmp/iter3_trace_{tool}.json"
        with open(out, "w") as f:
            f.write(data if isinstance(data, str) else json.dumps(data))
        tab = json.loads(data)
        tab = tab[0] if isinstance(tab, list) else tab
        cols = [c["id"] for c in tab["cols"]]
        rows = []
        for r in tab["rows"]:
            d = dict(zip(cols, [c.get("v") for c in r["c"]]))
            rows.append(d)
        tkey = (
            "total_self_time" if "total_self_time" in cols
            else "total_self_time_us" if "total_self_time_us" in cols
            else None
        )
        nkey = "operation" if "operation" in cols else (
            "hlo_op_expression" if "hlo_op_expression" in cols
            else "hlo_op_name" if "hlo_op_name" in cols else cols[0]
        )
        dev = [
            r for r in rows
            if str(r.get("host_or_device", "Device")).lower() != "host"
        ]
        if not dev:  # CPU-only trace: fall back to host rows
            dev = rows
        if tkey:
            dev.sort(key=lambda r: -(r.get(tkey) or 0.0))
        print(f"\n== {tool}: top device ops by self time ==")
        for r in dev[:30]:
            t_us = r.get(tkey) or 0.0
            extra = ""
            if "bound_by" in r:
                extra = f" bound_by={r['bound_by']}"
            if "occurrences" in r:
                extra += f" x{r['occurrences']}"
            print(f"{t_us/1000.0:9.3f} ms  {str(r.get(nkey))[:100]}{extra}")


def main():
    if "--summarize" in sys.argv:
        summarize()
        return
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    B = int(args[0]) if args else 64
    n_iter = int(args[1]) if len(args) > 1 else 3

    from vcrnet_tpu.config import Config
    from vcrnet_tpu.models import VCRNet
    from vcrnet_tpu.models.vcrnet import vcrnet_iter

    cfg = Config(num_points=1024, emb_dims=512, compute_dtype="bfloat16")
    N = cfg.num_points
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    src = jax.device_put(rng.rand(B, N, 3).astype(np.float32) - 0.5)
    tgt = jax.device_put(rng.rand(B, N, 3).astype(np.float32) - 0.5)
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])
    apply_fn = lambda v, a, b: model.apply(v, a, b)

    @jax.jit
    def step(s, t):
        out = vcrnet_iter(apply_fn, variables, s, t, n_iter, model=model)
        return out[2], out[3]

    # compile + settle outside the trace window
    R, t = step(src, tgt)
    np.asarray(R)
    print("compiled; tracing", flush=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(4):
            R, t = step(src, tgt)
        np.asarray(R)
    print("trace written to", TRACE_DIR, flush=True)


if __name__ == "__main__":
    main()
