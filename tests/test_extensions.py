"""Extension benchmark stencils (beyond the upstream 8-fixture suite).

The upstream DRStencil repo ships exactly eight .stc fixtures
(/root/reference/benchmarks).  These three exercise regions of the
operator space the upstream suite never touches — a radius-3 2D star
(deepest per-step halo), a radius-2 3D star, and the dense 27-point 3D
box (9 row-groups x 3 lane shifts) — through the SAME pipeline:
.stc -> IR/analysis (Python and native differentially) -> tuning space
-> streaming Pallas kernel vs the fp64 golden model.
"""

import os
import subprocess

import numpy as np
import pytest

from drstencil_tpu import native_bridge
from drstencil_tpu.ir.passes import analyze
from drstencil_tpu.ir.spec import load_stc
from drstencil_tpu.ops.config import KernelConfig
from drstencil_tpu.ops.runner import StencilProgram
from drstencil_tpu.tune.space import default_space

from conftest import BENCH_DIR, small_spec

EXT_STENCILS = ["2d13pt_star", "3d13pt_star", "3d27pt_box"]
# tall 3D layout: tm must exceed the fused row halo step*h*(M+1)
EXT_TM = {"2d13pt_star": 24, "3d13pt_star": 200, "3d27pt_box": 120}

MAX_TOL = 5e-3
RMS_TOL = 1e-3

NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")


@pytest.fixture(scope="module", autouse=True)
def built():
    subprocess.run(["make", "-C", NATIVE_DIR], check=True, capture_output=True)


@pytest.mark.parametrize("name", EXT_STENCILS)
@pytest.mark.parametrize("step,trapezoid", [(1, False), (2, False), (2, True)])
def test_extension_stream_matches_golden(name, step, trapezoid):
    spec = small_spec(name)
    cfg = KernelConfig(
        variant="stream", step=step, tm=EXT_TM[name], trapezoid=trapezoid,
        interpret=True,
    )
    max_err, rms = StencilProgram(spec, cfg).check(seed=0)
    assert max_err < MAX_TOL, f"max_err={max_err}"
    assert rms < RMS_TOL


@pytest.mark.parametrize("name", EXT_STENCILS)
def test_extension_native_analysis_matches_python(name):
    spec = load_stc(os.path.join(BENCH_DIR, name + ".stc"))
    with open(os.path.join(BENCH_DIR, name + ".stc")) as f:
        text = f.read()
    py = analyze(spec, step=2)
    nat = native_bridge.analyze(text, name, step=2)
    assert nat["order"] == py.order
    assert nat["distance"] == py.distance
    assert nat["window"] == py.part.window
    py_fused = sorted((list(k), v) for k, v in py.fused.items())
    nat_fused = sorted((k, v) for k, v in nat["fused"])
    assert [k for k, _ in nat_fused] == [k for k, _ in py_fused]
    # BIT-exact: plan_taps groups rows/columns by exact coefficient
    # equality, so any ULP drift between the native and Python fuse
    # changes the plan structure (and the summation order) of emitted
    # vs library kernels.  compose() iterates sorted on both sides.
    np.testing.assert_array_equal(
        [v for _, v in nat_fused], [v for _, v in py_fused]
    )


@pytest.mark.parametrize("name", EXT_STENCILS)
def test_extension_tuning_space_nonempty(name):
    spec = load_stc(os.path.join(BENCH_DIR, name + ".stc"))
    cands = list(default_space(spec))
    assert len(cands) > 10
    # every candidate must at least pass analysis (the FilterParams gate)
    from drstencil_tpu.ir.passes import AnalysisError

    bad = []
    for c in cands[:25]:
        try:
            analyze(spec, step=c.cfg.step)
        except AnalysisError as e:
            bad.append((c.cfg.label(), str(e)))
    assert not bad, bad


def test_extension_emitted_program_matches_golden(tmp_path):
    """Native-emitted program for the 27pt box EXECUTES bit-identically to
    the library kernel (the CLAUDE.md emitter invariant, extended to the
    9-row-group tap table), and both match the fp64 golden model."""
    import jax
    import jax.numpy as jnp
    from drstencil_tpu.ir import golden as gold_mod

    name = "3d27pt_box"
    spec = small_spec(name, dims=(16, 16, 256))
    taps = "".join(
        " ".join(map(str, off)) + f" {c}\n" for off, c in sorted(spec.taps.items())
    )
    text = native_bridge.emit(
        "L 16\nM 16\nN 256\niterations 4\nstencil\n" + taps,
        "ext27", step=2, tm=120,
    )
    g = {"__name__": "gen"}
    exec(compile(text, "gen_ext27.py", "exec"), g)
    assert g["FLAT3D"] and not g["JFK"]

    prog = StencilProgram(
        spec, KernelConfig(variant="stream", step=2, tm=120, interpret=True)
    )
    state = prog.init_state(3)
    state = prog.run_pairs(state, 1)
    lib_out = prog.final_a(state)

    # run the emitted kernel on the identical fp32 state (one pair)
    a0, b0 = gold_mod.random_state(spec, 3, dtype=np.float64)
    a0, b0 = a0.astype(np.float32), b0.astype(np.float32)
    call = g["build_call"](True)
    MID, H, RP, WB = g["MID"], g["H"], g["ROWS_PADDED"], g["WB"]

    def apply_fn(src, slabs):
        lo, hi, face, jframe = slabs
        out = call(src, lo, hi, face)
        v = out.reshape(RP // MID, MID, WB)
        v = jax.lax.dynamic_update_slice(v, jframe[:, :H, :], (0, 0, 0))
        v = jax.lax.dynamic_update_slice(v, jframe[:, H:, :],
                                         (0, MID - H, 0))
        return v.reshape(RP, WB)

    a = g["pad_state"](a0)
    sa = tuple(map(jnp.asarray, g["make_slabs"](a0)))
    sb = tuple(map(jnp.asarray, g["make_slabs"](b0)))
    b = apply_fn(jnp.asarray(a), sb)
    a = apply_fn(b, sa)
    gen_out = np.asarray(a)[
        g["PR"] : g["PR"] + g["R"], g["PC"] : g["PC"] + g["N"]
    ].reshape(spec.dims)
    np.testing.assert_array_equal(gen_out, lib_out)

    # and the shared result matches the fp64 golden model
    gold = gold_mod.run_golden(spec, step=2, seed=3, pairs=1)
    h = int(gold["halo"])
    sl = tuple(slice(h, -h) for _ in range(spec.ndim))
    err = np.abs(lib_out[sl].astype(np.float64) - gold["a"][sl]).max()
    assert err < MAX_TOL, err
