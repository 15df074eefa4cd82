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
from dataclasses import dataclass
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


_GOLD_CACHE: dict = {}


def _gold_cache_get(spec, cfg):
    """XLA gold programs keyed by the full operator (dims + taps + step +
    dtype) — a tuning sweep re-checks many configs against the same gold;
    compile it once.  Taps are part of the key: same-named specs with
    edited coefficients must not share a gold."""
    key = (spec.dims, tuple(spec.sorted_taps()), cfg.step, cfg.dtype)
    if key not in _GOLD_CACHE:
        _GOLD_CACHE[key] = StencilProgram(spec, cfg.replace_variant("xla"))
    return _GOLD_CACHE[key]


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
            # The XLA variant applies the fused operator whole — no
            # streaming partition required.  This keeps the deep-fusion
            # device_check gold constructible for pure-diagonal stencils,
            # whose step-1 operator has no reuse at any distance (the
            # config's distance belongs to the deep streaming kernel).
            require_partition=(cfg.variant != "xla"),
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

            self._pair_core = pair
            self._pair = jax.jit(pair, donate_argnums=(0, 1))
        elif cfg.variant in ("stream", "strip2d", "stream3d"):
            f, geom = stream_mod.build_stream_kernel(self.an, cfg)
            self.geom = geom

            def pair(a, b, slabs_a, slabs_b):
                b = f(a, slabs_b)
                a = f(b, slabs_a)
                return a, b

            self._pair_core = pair
            self._pair = jax.jit(pair, donate_argnums=(0, 1))
        else:
            raise ValueError(f"unknown variant {cfg.variant!r}")

    # -- public API ------------------------------------------------------
    def pair_fn(self):
        """The unjitted ping-pong pair function — the public export /
        driver contract (jit it yourself, e.g. with donate_argnums).

        Signature depends on the variant: ``(a, b) -> (a', b')`` for
        ``xla``; ``(a, b, slabs_a, slabs_b) -> (a', b')`` for the
        streaming variants (args match ``init_state()`` keys).
        """
        return self._pair_core

    # -- state ----------------------------------------------------------
    def init_state(self, seed: int = 0, on_device: bool = False):
        """Initial ping-pong state (random a, zero b, frame slabs).

        ``on_device=True`` generates the state with jax.random on the
        accelerator — mandatory at benchmark sizes on tunneled platforms
        where H2D runs at ~3 MB/s (a 256 MB upload costs ~90 s).
        """
        if on_device:
            return self._init_state_device(seed)
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

    def _init_state_device(self, seed: int):
        spec, dt = self.spec, jnp.dtype(self.dtype)

        @jax.jit
        def mk():
            key = jax.random.PRNGKey(seed)
            a0 = jax.random.uniform(
                key, spec.dims, dtype=jnp.float32, maxval=100.0
            ).astype(dt)
            b0 = jnp.zeros(spec.dims, dt)
            return a0, b0

        a0, b0 = mk()
        if self.geom is None:
            return {"a": a0, "b": b0}
        g = self.geom
        h, N, pc, fr = g.halo, g.lanes, g.pc, g.frame_rows

        def pad(x):
            buf = jnp.zeros((g.rows_padded, g.wb), dt)
            return jax.lax.dynamic_update_slice(
                buf, x.reshape(g.rows, N), (g.pr, pc)
            )

        def slabs(xp):
            r0 = g.pr
            real = xp[:, pc : pc + N]
            face = jnp.concatenate([real[:, :h], real[:, N - h:]], axis=1)
            if len(g.dims) == 3:
                # transposed per-strip face slab — see stream.make_slabs
                face = (
                    face[: g.n_strips * g.tm]
                    .reshape(g.n_strips, g.tm, 2 * h)
                    .transpose(0, 2, 1)
                )
            out = [xp[r0 : r0 + fr],
                   xp[r0 + g.rows - fr : r0 + g.rows],
                   face]
            if len(g.dims) == 3:
                m = g.mid
                v = xp.reshape(g.rows_padded // m, m, g.wb)
                out.append(
                    jnp.concatenate([v[:, :h, :], v[:, m - h:, :]], axis=1)
                )
            return tuple(out)

        @jax.jit
        def mk_padded(a0, b0):
            ap, bp = pad(a0), pad(b0)
            return ap, bp, slabs(ap), slabs(bp)

        ap, bp, sa, sb = mk_padded(a0, b0)
        return {"a": ap, "b": bp, "slabs_a": sa, "slabs_b": sb}

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

    def time(self, warmup_pairs: int = 3, pairs: Optional[int] = None,
             seed: int = 0, on_device: bool = True) -> RunResult:
        """Timed protocol: warmup, then wall-clock over the timed
        ping-pong (reference: 10 warmups + gettimeofday loop,
        codegen.hpp:575-589).

        On tunneled platforms a sync costs a ~25 ms relay round-trip, so
        a single measurement over-reports.  We measure T(n1) and T(n2)
        and report the slope (T(n2)-T(n1))/(n2-n1) — pure per-pair device
        time with the fixed dispatch/sync cost cancelled.
        """
        n1 = pairs if pairs is not None else max(self.num_pairs(), 8)
        n2 = 3 * n1
        state = self.init_state(seed, on_device=on_device)
        state = self.run_pairs(state, warmup_pairs)
        device_sync(state["a"])

        def timed(k, state):
            t0 = time.perf_counter()
            state = self.run_pairs(state, k)
            device_sync(state["a"])
            return time.perf_counter() - t0, state

        # median of 3 slope measurements — the sync round-trip through
        # the device tunnel has ~ms jitter that a single slope inherits
        slopes = []
        for _ in range(3):
            t1, state = timed(n1, state)
            t2, state = timed(n2, state)
            slopes.append((t2 - t1) / (n2 - n1))
        sec_per_pair = max(sorted(slopes)[1], 1e-9)
        cells = float(np.prod(self.spec.dims))
        steps = 2 * self.an.step
        return RunResult(
            label=f"{self.spec.name}:{self.cfg.label()}",
            seconds_per_pair=sec_per_pair,
            pairs=3 * (n1 + n2),  # three slope repetitions actually run
            warmup_pairs=warmup_pairs,
            gstencil_per_s=cells * steps / sec_per_pair / 1e9,
            achieved_gbps=2 * 2 * cells * self.dtype.itemsize / sec_per_pair / 1e9,
        )

    def device_check(self, seed: int = 0, pairs: int = 1) -> float:
        """On-device differential check vs the XLA reference variant at
        full size; only a scalar crosses the wire.  Returns the max
        RELATIVE error (|diff| / max|gold|) — non-normalized operators
        grow values by sum(coeffs) each timestep, so an absolute
        tolerance would false-fail deep fusion.  The TPU analogue of the
        reference's on-GPU gold kernel + checkError (codegen.hpp:591-626),
        avoiding the ~3 MB/s D2H path."""
        if self.cfg.variant == "xla":
            raise ValueError("device_check compares against the xla variant")
        # Deep fusion: the fused XLA gold is infeasible (step-6 2d25pt_box
        # is a 625-tap operator — XLA's temp explosion OOMs 16G of HBM).
        # Check against the step-1 gold composed step× instead; boundary
        # semantics differ in a band that creeps inward base-halo rows per
        # application, so compare an interior inset past it.
        deep_gold = self.an.step >= stream_mod.DEEP_LEVELS
        if deep_gold:
            gold = _gold_cache_get(self.spec, self.cfg.replace(step=1))
            gpairs = pairs * self.an.step
            base_h = self.an.halo // self.an.step
            h = self.an.halo + 2 * gpairs * base_h
        else:
            gold = _gold_cache_get(self.spec, self.cfg)
            gpairs = pairs
            h = self.an.halo
        s_me = self.init_state(seed, on_device=True)
        s_gd = gold.init_state(seed, on_device=True)
        s_me = self.run_pairs(s_me, pairs)
        s_gd = gold.run_pairs(s_gd, gpairs)
        mine = s_me["a"]
        if self.geom is not None:
            mine = stream_mod.unpad_state(mine, self.geom)

        @jax.jit
        def maxdiff(x, y):
            idx = tuple(slice(h, s - h) for s in x.shape)
            xi = x[idx].astype(jnp.float32)
            yi = y[idx].astype(jnp.float32)
            scale = jnp.maximum(jnp.max(jnp.abs(yi)), 1.0)
            return jnp.max(jnp.abs(xi - yi)) / scale

        return float(maxdiff(mine, s_gd["a"]))
