"""Production inference surface: serve registration requests of varying
batch size (and point count) from one process without recompiling.

The reference has no serving story (its eval loop is tied to a DataLoader,
reference model/vcrnet_model.py:521-649); this is the deployment-facing
upgrade: a `Registrar` that

  * pads ragged request batches up to a small ladder of STATIC bucket
    sizes — one XLA compile per bucket, cached for the process lifetime
    (under jit every distinct shape is a fresh compile; unbucketed
    serving would compile per request);
  * subsamples oversized clouds to the model's static ``num_points``
    (deterministically, matching the pipeline's permute+take semantics,
    reference util/data.py:289);
  * runs the full eval path — iterative refinement with the cached
    iteration-invariants (vcrnet_iter) or net+ICP when ``cfg.iter == 0``;
  * takes and returns plain numpy, so callers need no JAX knowledge;
  * optionally serves over a device ``Mesh`` (``mesh=``): parameters are
    replicated once at construction, each request batch is sharded over
    the mesh's 'data' axis, and jit's partitioner runs the pairs in
    parallel across chips — the serving-side analogue of the train
    engine's data parallelism (buckets round up to mesh multiples so the
    sharded batch axis always divides evenly).


Padding rows are real compute but never contaminate results: each
request's outputs are sliced back to its true batch size (registration
is per-pair; there is no cross-pair coupling in eval).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from vcrnet_tpu.config import Config
from vcrnet_tpu.models import VCRNet
from vcrnet_tpu.models.vcrnet import vcrnet_icp, vcrnet_iter


class Registrar:
    """Batch-bucketed registration server around a trained VCRNet.

    >>> reg = Registrar(cfg, variables)
    >>> out = reg.register(src, tgt)     # numpy [b, n, 3] x2
    >>> out["R"], out["t"]               # numpy [b, 3, 3], [b, 3]
    """

    def __init__(
        self,
        cfg: Config,
        variables,
        buckets: Sequence[int] = (1, 2, 4, 8, 16, 32, 64),
        mesh=None,
    ):
        if not buckets or list(buckets) != sorted(set(buckets)):
            raise ValueError("buckets must be sorted, unique, non-empty")
        self.cfg = cfg
        self.model = VCRNet(cfg=cfg)
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from vcrnet_tpu.parallel.mesh import (
                batch_sharding,
                replicated_sharding,
            )

            if "data" not in mesh.shape:
                raise ValueError("mesh must have a 'data' axis")
            n = mesh.shape["data"]
            # every compiled bucket's batch axis must divide the mesh
            buckets = sorted({-(-int(b) // n) * n for b in buckets})
            self._batch_sharding = batch_sharding(mesh)
            variables = jax.device_put(variables, replicated_sharding(mesh))
        self._variables = variables
        self._buckets = tuple(int(b) for b in buckets)
        self._fns = {}  # bucket -> jitted forward
        self.n_points = cfg.n_cropped

    # -- shape management ---------------------------------------------

    def _bucket_for(self, b: int) -> int:
        for cap in self._buckets:
            if b <= cap:
                return cap
        # larger than the top bucket: pad to a multiple of it and let the
        # caller's batch split below handle it
        return self._buckets[-1]

    def _fit_points(self, cloud: np.ndarray, seed: int) -> np.ndarray:
        """[b, n, 3] -> [b, n_points, 3] by deterministic subsample
        (permute+take, like the data pipeline). Rejects undersized clouds
        (the model's neighborhood sizes are static functions of config)."""
        n = cloud.shape[1]
        if n < self.n_points:
            raise ValueError(
                f"got {n} points; the model needs >= {self.n_points} "
                "(re-create the Registrar with a smaller cfg.num_points)"
            )
        if n == self.n_points:
            return cloud
        perm = np.random.RandomState(seed).permutation(n)[: self.n_points]
        return cloud[:, perm]

    # -- compiled forward ---------------------------------------------

    def _forward(self, bucket: int):
        if bucket in self._fns:
            return self._fns[bucket]
        cfg = self.cfg
        model = self.model

        def fn(variables, src, tgt):
            apply_fn = lambda v, s, t: model.apply(v, s, t)
            if cfg.iter > 0:
                out = vcrnet_iter(
                    apply_fn, variables, src, tgt, cfg.iter, model=model
                )
            else:
                out = vcrnet_icp(
                    apply_fn, variables, src, tgt, cfg.max_iterations
                )
            _, _, R_ab, t_ab, R_ba, t_ba = out
            return R_ab, t_ab, R_ba, t_ba

        self._fns[bucket] = jax.jit(fn)
        return self._fns[bucket]

    @property
    def compiled_buckets(self):
        return sorted(self._fns)

    def warmup(self, buckets: Sequence[int] | None = None) -> None:
        """Eagerly compile (and run once) the given buckets — default all —
        so the first real request pays no compile latency."""
        for bucket in buckets if buckets is not None else self._buckets:
            if bucket not in self._buckets:
                raise ValueError(f"{bucket} is not one of {self._buckets}")
            cloud = np.random.RandomState(0).rand(
                bucket, self.n_points, 3
            ).astype(np.float32) - 0.5
            self._run_chunk(cloud, cloud)

    def export_bucket(self, bucket: int, path: str | None = None) -> bytes:
        """Serialize one bucket's forward as a self-contained
        ``jax.export`` artifact (StableHLO with the weights embedded as
        constants): compile once here, ship the blob to serving fleets,
        reload with :func:`load_exported` — no model code, config, or
        checkpoint needed at the destination. The artifact is lowered for
        THIS process's default platform (TPU in production, CPU in tests);
        loading on another platform fails loudly rather than silently
        recompiling."""
        from jax import export as jax_export

        if bucket not in self._buckets:
            raise ValueError(f"{bucket} is not one of {self._buckets}")
        inner = self._forward(bucket)
        # a mesh-backed Registrar holds mesh-committed variables; baking
        # that sharding into the artifact would pin it to this host's
        # device count — pull the weights to host so the export lowers
        # single-device (portable) regardless of how THIS process serves
        variables = (
            jax.device_get(self._variables)
            if self.mesh is not None
            else self._variables
        )

        spec = jax.ShapeDtypeStruct(
            (bucket, self.n_points, 3), jnp.float32
        )
        fn = jax.jit(lambda src, tgt: inner(variables, src, tgt))
        blob = jax_export.export(fn)(spec, spec).serialize()
        if path is not None:
            with open(path, "wb") as fh:
                fh.write(blob)
        return blob


    # -- public API -----------------------------------------------------

    def register(
        self, src: np.ndarray, tgt: np.ndarray, seed: int = 0
    ) -> dict:
        """Register src onto tgt: returns {"R", "t", "R_inv", "t_inv"}
        as numpy, where tgt ~= R @ src + t per pair.

        src/tgt: [b, n, 3] (or a single [n, 3] pair) float32, n >= the
        model's num_points. Batches above the top bucket are split.
        """
        src = np.asarray(src, np.float32)
        tgt = np.asarray(tgt, np.float32)
        single = src.ndim == 2
        if single:
            src, tgt = src[None], tgt[None]
        if src.shape != tgt.shape or src.ndim != 3 or src.shape[-1] != 3:
            raise ValueError(f"bad shapes {src.shape} vs {tgt.shape}")

        src = self._fit_points(src, seed)
        tgt = self._fit_points(tgt, seed + 1)

        b = src.shape[0]
        top = self._buckets[-1]
        outs = []
        for lo in range(0, b, top):
            outs.append(self._run_chunk(src[lo:lo + top], tgt[lo:lo + top]))
        result = {
            key: np.concatenate([o[key] for o in outs], axis=0)
            for key in outs[0]
        }
        if single:
            result = {key: val[0] for key, val in result.items()}
        return result

    def _run_chunk(self, src: np.ndarray, tgt: np.ndarray) -> dict:
        b = src.shape[0]
        bucket = self._bucket_for(b)
        if b < bucket:  # pad by repeating the first pair (never NaNs)
            pad = np.repeat(src[:1], bucket - b, axis=0)
            src = np.concatenate([src, pad], axis=0)
            tgt = np.concatenate([tgt, np.repeat(tgt[:1], bucket - b, 0)], 0)
        if self._batch_sharding is not None:
            src = jax.device_put(src, self._batch_sharding)
            tgt = jax.device_put(tgt, self._batch_sharding)
        R_ab, t_ab, R_ba, t_ba = jax.device_get(
            self._forward(bucket)(
                self._variables, jnp.asarray(src), jnp.asarray(tgt)
            )
        )  # one batched host transfer, not four sequential fetches —
        # on a tunnel-backed device each separate np.asarray pays its
        # own round trip
        return {
            "R": np.asarray(R_ab)[:b],
            "t": np.asarray(t_ab)[:b],
            "R_inv": np.asarray(R_ba)[:b],
            "t_inv": np.asarray(t_ba)[:b],
        }


def load_exported(blob_or_path) -> "ExportedRegistrar":
    """Rehydrate an :meth:`Registrar.export_bucket` artifact (raw bytes,
    or a path to one) into a callable that registers fixed-size numpy
    batches."""
    import os

    if isinstance(blob_or_path, (str, os.PathLike)):
        with open(blob_or_path, "rb") as fh:
            blob = fh.read()
    else:
        blob = bytes(blob_or_path)
    from jax import export as jax_export

    return ExportedRegistrar(jax_export.deserialize(blob))


class ExportedRegistrar:
    """Minimal numpy-in/out wrapper over a deserialized export artifact.
    The batch and point counts are baked in (``.batch``, ``.n_points``)."""

    def __init__(self, exported):
        self._exported = exported
        self.batch, self.n_points, _ = exported.in_avals[0].shape

    def register(self, src: np.ndarray, tgt: np.ndarray) -> dict:
        src = np.asarray(src, np.float32)
        tgt = np.asarray(tgt, np.float32)
        want = (self.batch, self.n_points, 3)
        if src.shape != want or tgt.shape != want:
            raise ValueError(
                f"exported artifact takes exactly {want}, got "
                f"{src.shape} / {tgt.shape}"
            )
        R_ab, t_ab, R_ba, t_ba = self._exported.call(src, tgt)
        return {
            "R": np.asarray(R_ab), "t": np.asarray(t_ab),
            "R_inv": np.asarray(R_ba), "t_inv": np.asarray(t_ba),
        }
