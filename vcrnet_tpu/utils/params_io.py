"""Parameter introspection utilities.

Parity with reference util/initPara.py helpers:
  save_params_table — saveNetAsExcel (initPara.py:68-74): dump named params
                      to a table (CSV by default; xlsx when openpyxl exists)
  count_params      — the param-count banner (initPara.py:256-258)
  device_memory_mb  — print_gpu (util/util.py:13-28), via JAX memory stats
                      instead of pynvml (and without the reference's
                      import-time nvmlInit side effect)
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def _flatten(tree, prefix=""):
    import jax

    out = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        name = "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in path
        )
        out.append((name, np.asarray(leaf)))
    return out


def count_params(params) -> int:
    import jax

    return sum(
        int(np.prod(np.shape(x))) for x in jax.tree_util.tree_leaves(params)
    )


def save_params_table(params, path: str, values: bool = False) -> str:
    """Write a name/shape/stats table of all parameters to CSV/XLSX.

    ``values=True`` dumps the FULL flattened weight values per row instead
    of summary stats — the reference saveNetAsExcel's (name, tensor) sheet
    (util/initPara.py:68-74), for eyeballing/diffing small nets."""
    import pandas as pd

    rows = []
    for name, arr in _flatten(params):
        row = {"name": name, "shape": str(arr.shape), "params": int(arr.size)}
        if values:
            row["values"] = np.array2string(
                arr.ravel(), precision=5, separator=" ",
                threshold=np.inf, max_line_width=np.inf,
            )
        else:
            row.update(
                mean=float(arr.mean()), std=float(arr.std()),
                min=float(arr.min()), max=float(arr.max()),
            )
        rows.append(row)
    df = pd.DataFrame(rows)
    if path.endswith(".xlsx"):
        try:
            df.to_excel(path, index=False)
            return path
        except Exception:
            path = path[:-5] + ".csv"
    df.to_csv(path, index=False)
    return path


def device_memory_mb(device=None) -> Optional[float]:
    """Bytes in use on a device, in MB (None if the backend has no stats)."""
    import jax

    dev = device or jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        return None
    return stats.get("bytes_in_use", 0) / 1024 / 1024
