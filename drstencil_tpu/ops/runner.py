"""Run protocol: init → warmup → timed ping-pong → correctness check.

The TPU analogue of the generated program's ``main()``
(codegen.hpp:547-635): random input buffer, zero output buffer, 10 warmup
launches, ``ceil(Iterations / 2·step)`` timed launch pairs (in→out,
out→in), wall-clock timing with ``block_until_ready``, and an optional
differential check against the fp64 NumPy golden model (the reference's
``--check`` gold kernel + checkError, promoted to an assertable API).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from drstencil_tpu.ir import golden
from drstencil_tpu.ir.passes import Analysis, analyze
from drstencil_tpu.ir.spec import StencilSpec
from drstencil_tpu.ops import stream as stream_mod
from drstencil_tpu.ops import xla_ref
from drstencil_tpu.ops.config import KernelConfig


@dataclass
class RunResult:
    label: str
    seconds_per_pair: float
    pairs: int
    warmup_pairs: int
    max_error: Optional[float] = None
    rms_error: Optional[float] = None
    # derived metrics (see tune.metrics for the roofline model)
    gstencil_per_s: float = 0.0
    achieved_gbps: float = 0.0


@jax.jit
def _sync_probe(x):
    return jnp.sum(x[:1, :8].astype(jnp.float32))


def device_sync(x) -> float:
    """Force execution of everything ``x`` depends on.

    ``jax.block_until_ready`` is a no-op on tunneled/experimental
    platforms (observed on the axon TPU relay), so we fetch a tiny
    on-device reduction as a host scalar — an 8-byte D2H that cannot
    complete before the producing computation does.
    """
    return float(_sync_probe(x))


class StencilProgram:
    """A compiled stencil program for one (spec, config) pair — the
    analogue of one generated ``out.cu`` binary (reference §C7)."""

    def __init__(self, spec: StencilSpec, cfg: KernelConfig = KernelConfig()):
        self.spec = spec
        self.cfg = cfg
        self.an: Analysis = analyze(
            spec, step=cfg.step, distance=cfg.distance,
            merge_forward=cfg.merge_forward,
        )
        self.dtype = np.dtype(cfg.dtype)
        self._build()

    # -- construction ---------------------------------------------------
    def _build(self):
        cfg = self.cfg
        if cfg.variant == "xla":
            self.geom = None
            apply_fn = xla_ref.apply_interior(self.an)

            def pair(a, b):
                b = apply_fn(a, b)
                a = apply_fn(b, a)
                return a, b

            self._pair = jax.jit(pair, donate_argnums=(0, 1))
        elif cfg.variant in ("stream", "strip2d", "stream3d"):
            f, geom = stream_mod.build_stream_kernel(self.an, cfg)
            self.geom = geom

            def pair(a, b, slabs_a, slabs_b):
                b = f(a, slabs_b)
                a = f(b, slabs_a)
                return a, b

            self._pair = jax.jit(pair, donate_argnums=(0, 1))
        else:
            raise ValueError(f"unknown variant {cfg.variant!r}")

    # -- state ----------------------------------------------------------
    def init_state(self, seed: int = 0):
        a0, b0 = golden.random_state(self.spec, seed, dtype=np.float64)
        a0 = a0.astype(self.dtype)
        b0 = b0.astype(self.dtype)
        if self.geom is None:
            return {"a": jnp.asarray(a0), "b": jnp.asarray(b0)}
        g = self.geom
        return {
            "a": jnp.asarray(stream_mod.pad_state(a0, g)),
            "b": jnp.asarray(stream_mod.pad_state(b0, g)),
            "slabs_a": tuple(map(jnp.asarray, stream_mod.make_slabs(a0, g))),
            "slabs_b": tuple(map(jnp.asarray, stream_mod.make_slabs(b0, g))),
        }

    def run_pairs(self, state, pairs: int):
        a, b = state["a"], state["b"]
        for _ in range(pairs):
            if self.geom is None:
                a, b = self._pair(a, b)
            else:
                a, b = self._pair(a, b, state["slabs_a"], state["slabs_b"])
        state = dict(state)
        state["a"], state["b"] = a, b
        return state

    def final_a(self, state) -> np.ndarray:
        a = state["a"]
        if self.geom is not None:
            a = stream_mod.unpad_state(a, self.geom)
        return np.asarray(jax.device_get(a))

    # -- protocol --------------------------------------------------------
    def num_pairs(self) -> int:
        return golden.num_launch_pairs(self.spec.iterations, self.an.step)

    def check(self, seed: int = 0, pairs: Optional[int] = None):
        """Differential check vs the fp64 golden model.  Returns
        (max_error, rms_error) over the interior — the reference's
        '[Test] RMS Error' (codegen.hpp:620-621) as data, not stdout."""
        n = pairs if pairs is not None else self.num_pairs()
        state = self.init_state(seed)
        state = self.run_pairs(state, n)
        got = self.final_a(state)

        # golden on the same fp32-cast initial state
        a0, b0 = golden.random_state(self.spec, seed, dtype=np.float64)
        a = a0.astype(self.dtype).astype(np.float64)
        b = b0.astype(self.dtype).astype(np.float64)
        for _ in range(n):
            b = golden.apply_interior(a, b, self.an.fused, self.an.halo)
            a = golden.apply_interior(b, a, self.an.fused, self.an.halo)
        return golden.check_error(got, a, self.an.halo)

    def time(self, warmup_pairs: int = 5, pairs: Optional[int] = None,
             seed: int = 0) -> RunResult:
        """Timed protocol: warmup launches, then wall-clock over the timed
        ping-pong (reference: 10 warmups + gettimeofday loop,
        codegen.hpp:575-589)."""
        n = pairs if pairs is not None else max(self.num_pairs(), 1)
        state = self.init_state(seed)
        state = self.run_pairs(state, warmup_pairs)
        device_sync(state["a"])
        t0 = time.perf_counter()
        state = self.run_pairs(state, n)
        device_sync(state["a"])
        dt = time.perf_counter() - t0
        cells = float(np.prod(self.spec.dims))
        sec_per_pair = dt / n
        # one pair = 2 launches = 2·step timesteps of the plain stencil
        steps = 2 * self.an.step
        res = RunResult(
            label=f"{self.spec.name}:{self.cfg.label()}",
            seconds_per_pair=sec_per_pair,
            pairs=n,
            warmup_pairs=warmup_pairs,
            gstencil_per_s=cells * steps / sec_per_pair / 1e9,
            achieved_gbps=2 * 2 * cells * self.dtype.itemsize / sec_per_pair / 1e9,
        )
        return res
