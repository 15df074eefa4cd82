"""Property-based differential fuzzing: random stencils, random configs,
stream kernel (interpret) vs the fp64 golden model."""

import numpy as np
import pytest

from drstencil_tpu.ir.passes import AnalysisError
from drstencil_tpu.ir.spec import StencilSpec
from drstencil_tpu.ops.config import KernelConfig
from drstencil_tpu.ops.runner import StencilProgram


def random_spec(rng, ndim, dims):
    """Random stencil whose off-axis radius <= axis-0 order (the kernel's
    validity domain) and with axis-0 reuse at step 1."""
    r = int(rng.integers(1, 3))
    taps = {(0,) * ndim: 0.5}
    # pin the axis-0 extent to +-r so order == r
    for sign in (-r, r):
        taps[(sign,) + (0,) * (ndim - 1)] = float(rng.uniform(0.05, 0.3))
    n_extra = int(rng.integers(2, 7))
    for _ in range(n_extra):
        off = tuple(int(rng.integers(-r, r + 1)) for _ in range(ndim))
        taps[off] = taps.get(off, 0.0) + float(rng.uniform(-0.2, 0.3))
    return StencilSpec(name="fuzz", dims=dims, iterations=4, taps=taps)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_2d(seed):
    rng = np.random.default_rng(100 + seed)
    spec = random_spec(rng, 2, (48, 256))
    # steps up to 6 so the hybrid block granularity (needs step % block
    # == 0, block < step) and the deep fori path get fuzz coverage
    step = int(rng.integers(1, 7))
    trap = bool(rng.integers(0, 2)) and step > 1
    tm = int(rng.choice([16, 24, 32]))
    lane = str(rng.choice(["roll", "slice"]))
    # value-fused trapezoid rides the same validity domain (roll, levels<5)
    vf = bool(rng.integers(0, 2)) and trap and lane == "roll"
    # hybrid level granularity: block-fused levels where step allows
    blk = 1
    if trap and bool(rng.integers(0, 2)):
        cands = [b for b in (2, 3) if step % b == 0 and b < step]
        if cands:
            blk = int(rng.choice(cands))
    cfg = KernelConfig(variant="stream", step=step, tm=tm, trapezoid=trap,
                       lane_mode=lane, vfuse=vf, block=blk, interpret=True)
    try:
        prog = StencilProgram(spec, cfg)
    except (AnalysisError, ValueError):
        return  # invalid (no reuse / halo too wide) — rejection is correct
    max_err, _ = prog.check(seed=seed, pairs=1)
    scale = max(1.0, abs(sum(spec.taps.values()))) ** (2 * step) * 100
    assert max_err < 1e-5 * scale, f"{cfg.label()}: max_err={max_err}"


def ratio_spec(rng, dims):
    """Random stencil whose coefficient COLUMNS are scalar multiples of
    each other plus a sparse perturbation — the structure that triggers
    affine column chains (stream._chain_columns).  Random tables almost
    never hit exact ratios, so chains need their own fuzz corpus."""
    r = 2
    base_col = [float(rng.uniform(0.05, 0.3)) for _ in range(2 * r + 1)]
    taps = {}
    for si, s in enumerate(range(-r, r + 1)):
        alpha = float(rng.choice([0.5, 1.0, 2.0, 4.0]))
        for di, d in enumerate(range(-r, r + 1)):
            taps[(d, s)] = alpha * base_col[di]
    # sparse perturbation on the center column (keeps chains profitable)
    taps[(0, 0)] += float(rng.uniform(0.05, 0.2))
    return StencilSpec(name="ratio", dims=dims, iterations=4, taps=taps)


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_column_chains(seed):
    from drstencil_tpu.ops.stream import plan_taps

    rng = np.random.default_rng(300 + seed)
    spec = ratio_spec(rng, (48, 256))
    tl = sorted((off[0], off[1], c) for off, c in spec.taps.items())
    _, _, chains = plan_taps(tl)
    assert any(c is not None for c in chains), "corpus must trigger chains"
    step = int(rng.integers(1, 3))
    cfg = KernelConfig(variant="stream", step=step, tm=24,
                       trapezoid=step > 1, lane_mode="roll", interpret=True)
    prog = StencilProgram(spec, cfg)
    max_err, _ = prog.check(seed=seed, pairs=1)
    scale = max(1.0, abs(sum(spec.taps.values()))) ** (2 * step) * 100
    assert max_err < 1e-5 * scale, f"{cfg.label()}: max_err={max_err}"


@pytest.mark.parametrize("seed", range(4))
def test_fuzz_3d(seed):
    rng = np.random.default_rng(200 + seed)
    spec = random_spec(rng, 3, (24, 16, 128))
    step = int(rng.integers(1, 3))
    trap = bool(rng.integers(0, 2)) and step > 1
    vf = bool(rng.integers(0, 2)) and trap
    cfg = KernelConfig(variant="stream", step=step, tm=8 * (2 + 4 * step),
                       trapezoid=trap, vfuse=vf, interpret=True)
    try:
        prog = StencilProgram(spec, cfg)
    except (AnalysisError, ValueError):
        return
    max_err, _ = prog.check(seed=seed, pairs=1)
    scale = max(1.0, abs(sum(spec.taps.values()))) ** (2 * step) * 100
    assert max_err < 1e-5 * scale, f"{cfg.label()}: max_err={max_err}"
