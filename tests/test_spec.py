"""Tests for the .stc front-end (drstencil_tpu.ir.spec)."""

import os

import pytest

from drstencil_tpu.ir.spec import StcError, load_stc, parse_stc

from conftest import ALL_STENCILS, BENCH_DIR


def test_parse_2d_minimal():
    spec = parse_stc(
        """
        M 64
        N 128
        iterations 4
        stencil
        0 0 0.5
        1 0 0.25
        -1 0 0.25
        """,
        name="t",
    )
    assert spec.dims == (64, 128)
    assert spec.ndim == 2
    assert spec.iterations == 4
    assert spec.taps[(0, 0)] == 0.5
    assert spec.taps[(-1, 0)] == 0.25
    assert spec.npoints == 3


def test_parse_3d():
    spec = parse_stc(
        "L 8 M 16 N 32 iterations 2 stencil 0 0 0 1.0 1 0 0 -0.5", name="t"
    )
    assert spec.dims == (8, 16, 32)
    assert spec.ndim == 3
    assert spec.taps[(1, 0, 0)] == -0.5


def test_duplicate_offsets_accumulate():
    spec = parse_stc("M 8 N 8 iterations 1 stencil 0 0 0.5 0 0 0.25", name="t")
    assert spec.taps[(0, 0)] == 0.75


def test_typo_iteratioins_is_an_error():
    # The reference ships 2d9pt_cross.stc with the typo 'iteratioins' and
    # silently generates code with uninitialized Iterations (UB).  We report it.
    with pytest.raises(StcError, match="iteratioins.*did you mean 'iterations'"):
        parse_stc("M 8 N 8 iteratioins 4 stencil 0 0 1.0", name="t")


def test_missing_iterations():
    with pytest.raises(StcError, match="missing 'iterations'"):
        parse_stc("M 8 N 8 stencil 0 0 1.0", name="t")


def test_missing_stencil():
    with pytest.raises(StcError, match="stencil"):
        parse_stc("M 8 N 8 iterations 1", name="t")


def test_ragged_stencil_table():
    with pytest.raises(StcError, match="not a multiple"):
        parse_stc("M 8 N 8 iterations 1 stencil 0 0 1.0 1 0", name="t")


def test_bad_coefficient():
    with pytest.raises(StcError):
        parse_stc("M 8 N 8 iterations 1 stencil 0 0 abc", name="t")


@pytest.mark.parametrize("name", ALL_STENCILS)
def test_all_benchmarks_parse(name):
    spec = load_stc(os.path.join(BENCH_DIR, name + ".stc"))
    assert spec.name == name
    assert spec.iterations == 4
    if name.startswith("3d"):
        assert spec.dims == (512, 512, 512)
    else:
        assert spec.dims == (8192, 8192)
    expected_points = {
        "2d5pt_star": 5,
        "2d5pt_cross": 5,
        "2d9pt_star": 9,
        "2d9pt_cross": 9,
        "2d9pt_box": 9,
        "2d25pt_box": 25,
        "3d7pt_star": 7,
        "3d9pt_cross": 9,
    }
    assert spec.npoints == expected_points[name]
    # Coefficients of a consistent smoothing stencil: center plus neighbors.
    assert spec.taps[(0,) * spec.ndim] == pytest.approx(0.3)


def test_radius():
    spec = load_stc(os.path.join(BENCH_DIR, "2d25pt_box.stc"))
    assert spec.radius() == (2, 2)
    spec3 = load_stc(os.path.join(BENCH_DIR, "3d7pt_star.stc"))
    assert spec3.radius() == (1, 1, 1)


def test_comments_stripped():
    spec = parse_stc(
        "# a header comment\nM 8  # trailing\nN 8\niterations 1\n"
        "stencil\n0 0 1.0  # center tap\n",
        name="t",
    )
    assert spec.dims == (8, 8) and spec.taps[(0, 0)] == 1.0
