"""dist is analysis-only on TPU: the emitted program must be IDENTICAL
across the whole valid distance window.

The reference sweeps ``--dist`` because a CUDA block banks forward
contributions ``Dist`` planes ahead through shared memory and the
prologue/steady/epilogue restructure around it (reference
codegen.hpp:269-540, tuning.py:124-139 with the validity window
(step-1)*order <= dist <= step*order from tuning.py:24-25).  On TPU the
VMEM window holds the whole haloed strip, so every valid dist yields the
same program (PARITY.md "Known gaps").  This test converts that design
argument into a regression: for each benchmark x step, emit the program
at every dist in the window and assert bit-identical text (only the two
provenance comment lines — the echoed command and the analysis summary,
which record dist itself — are normalized away).
"""

import os
import subprocess

import pytest

from drstencil_tpu import native_bridge
from drstencil_tpu.ir.passes import analyze, order_of
from drstencil_tpu.ir.spec import load_stc

from conftest import ALL_STENCILS, BENCH_DIR

NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")


@pytest.fixture(scope="module", autouse=True)
def built():
    subprocess.run(["make", "-C", NATIVE_DIR], check=True, capture_output=True)


def stc_text(name):
    with open(os.path.join(BENCH_DIR, name + ".stc")) as f:
        return f.read()


def normalize(text: str) -> str:
    """Drop the provenance comments that echo dist back verbatim."""
    return "\n".join(
        ln for ln in text.splitlines()
        if not ln.startswith(("#   command :", "#   analysis:"))
    )


def valid_dists(name: str, step: int):
    """The reference's validity window, intersected with dists the
    analysis actually accepts (dist must be positive and reuse data)."""
    spec = load_stc(os.path.join(BENCH_DIR, name + ".stc"))
    order = order_of(spec.taps)
    lo, hi = (step - 1) * order, step * order
    out = []
    for dist in range(max(lo, 1), hi + 1):
        try:
            analyze(spec, step=step, distance=dist)
        except Exception:
            continue
        out.append(dist)
    return out


@pytest.mark.parametrize("step", [1, 2, 3])
@pytest.mark.parametrize("name", ALL_STENCILS)
def test_emitted_program_invariant_across_dist(name, step):
    dists = valid_dists(name, step)
    if len(dists) < 2:
        pytest.skip(f"{name} step={step}: <2 valid dists ({dists})")
    texts = {
        dist: normalize(
            native_bridge.emit(stc_text(name), name, step=step,
                               distance=dist)
        )
        for dist in dists
    }
    base_dist = dists[0]
    base = texts[base_dist]
    for dist, text in texts.items():
        assert text == base, (
            f"{name} step={step}: emitted program differs between "
            f"dist={base_dist} and dist={dist} — dist is supposed to be "
            "analysis-only on TPU (PARITY.md)"
        )
    # the default (dist=0 -> (high-low)>>1) also falls in the window
    default = normalize(
        native_bridge.emit(stc_text(name), name, step=step, distance=0))
    assert default == base, (
        f"{name} step={step}: default-dist program differs from the "
        "explicit-dist window"
    )
