"""Differential tests: native C++ compiler core vs the Python IR, and
end-to-end execution of emitted programs (interpret mode)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from drstencil_tpu import native_bridge
from drstencil_tpu.ir.passes import analyze
from drstencil_tpu.ir.spec import load_stc

from conftest import ALL_STENCILS, BENCH_DIR, small_spec

NATIVE_DIR = os.path.join(os.path.dirname(__file__), os.pardir, "native")
CLI = os.path.join(NATIVE_DIR, "drstencil")


@pytest.fixture(scope="module", autouse=True)
def built():
    subprocess.run(["make", "-C", NATIVE_DIR], check=True, capture_output=True)


def stc_text(name):
    with open(os.path.join(BENCH_DIR, name + ".stc")) as f:
        return f.read()


@pytest.mark.parametrize("name", ALL_STENCILS)
# step 6 covers the deep fused tables where 1-ULP fuse-order drift
# between native (std::map order) and Python first appeared
@pytest.mark.parametrize("step", [1, 2, 3, 6])
def test_native_analysis_matches_python(name, step):
    spec = load_stc(os.path.join(BENCH_DIR, name + ".stc"))
    try:
        py = analyze(spec, step=step)
        py_err = None
    except Exception as e:  # e.g. "No data to reuse"
        py, py_err = None, str(e)

    try:
        nat = native_bridge.analyze(stc_text(name), name, step=step)
        nat_err = None
    except native_bridge.NativeError as e:
        nat, nat_err = None, str(e)

    if py_err is not None:
        assert nat_err is not None and "No data to reuse" in nat_err
        return
    assert nat_err is None, nat_err

    assert nat["order"] == py.order
    assert nat["distance"] == py.distance
    assert nat["window"] == py.part.window
    py_fused = sorted((list(k), v) for k, v in py.fused.items())
    nat_fused = sorted((k, v) for k, v in nat["fused"])
    assert [k for k, _ in nat_fused] == [k for k, _ in py_fused]
    # bit-exact (not allclose): exact-equality grouping in plan_taps
    # means 1 ULP of fuse drift restructures the emitted plan
    np.testing.assert_array_equal(
        [v for _, v in nat_fused], [v for _, v in py_fused]
    )
    for a in range(spec.ndim):
        assert sorted(map(tuple, nat["forward"][a])) == sorted(py.part.forward[a])
    assert sorted(map(tuple, nat["backward"])) == sorted(py.part.backward)


def test_native_rejects_typo():
    with pytest.raises(native_bridge.NativeError, match="iteratioins"):
        native_bridge.analyze("M 8 N 8 iteratioins 4 stencil 0 0 1.0", "t")


def test_cli_dump_matches_bridge():
    out = subprocess.run(
        [CLI, "--step", "2", "--dump-analysis",
         os.path.join(BENCH_DIR, "2d9pt_star.stc")],
        capture_output=True, text=True, check=True,
    )
    via_cli = json.loads(out.stdout)
    via_lib = native_bridge.analyze(stc_text("2d9pt_star"), "2d9pt_star", step=2)
    assert via_cli == via_lib


def test_cli_bad_flag():
    r = subprocess.run(
        [CLI, "--wat", os.path.join(BENCH_DIR, "2d5pt_star.stc")],
        capture_output=True, text=True,
    )
    assert r.returncode != 0
    assert "unknown option" in r.stdout


def _write_small_stc(tmp_path, name, dims, body):
    p = tmp_path / f"{name}.stc"
    keys = ("L", "M", "N")[-len(dims):]
    hdr = "\n".join(f"{k} {v}" for k, v in zip(keys, dims))
    p.write_text(f"{hdr}\niterations 4\nstencil\n{body}")
    return str(p)


FIVE_PT = "0 0 0.3\n0 1 0.2\n1 0 0.2\n0 -1 0.2\n-1 0 0.2\n"
SEVEN_PT = ("0 0 0 0.3\n1 0 0 0.2\n-1 0 0 0.2\n0 1 0 0.2\n"
            "0 -1 0 0.2\n0 0 1 0.2\n0 0 -1 0.2\n")


@pytest.mark.parametrize(
    "dims,body,step,bx",
    [((64, 256), FIVE_PT, 1, 16), ((64, 256), FIVE_PT, 2, 16),
     ((24, 16, 128), SEVEN_PT, 1, 24)],  # 3D: bx must exceed h*M+h
)
def test_emitted_program_check_passes(tmp_path, dims, body, step, bx):
    """Generate a program with the native emitter, execute it in interpret
    mode with --check, and assert the golden diff is at fp32 tolerance —
    the promoted version of the reference's eyeballed RMS print."""
    stc = _write_small_stc(tmp_path, "tiny", dims, body)
    out_py = str(tmp_path / "gen.py")
    subprocess.run(
        [CLI, "--step", str(step), "--bx", str(bx), "--check", "-o", out_py, stc],
        check=True, capture_output=True,
    )
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, out_py, "--check", "--interpret",
         "--pairs", "1", "--warmup", "1"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rms = [l for l in r.stdout.splitlines() if "RMS Error" in l]
    assert rms, r.stdout
    val = float(rms[0].split(":")[1])
    assert val < 1e-3, r.stdout


def test_emitted_gold_program_runs(tmp_path):
    stc = _write_small_stc(tmp_path, "tiny", (32, 64), FIVE_PT)
    out_py = str(tmp_path / "gold.py")
    subprocess.run([CLI, "--gold", "-o", out_py, stc], check=True,
                   capture_output=True)
    r = subprocess.run(
        [sys.executable, out_py, "--pairs", "1"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "checksum" in r.stdout


def test_emitted_matches_library_runtime(tmp_path):
    """The emitted program's kernel and the library runtime must produce
    bit-identical fp32 results (same op order by construction)."""
    import jax
    from drstencil_tpu.ops.config import KernelConfig
    from drstencil_tpu.ops.runner import StencilProgram

    spec = small_spec("2d5pt_star", dims=(64, 256))
    prog = StencilProgram(
        spec, KernelConfig(variant="stream", step=2, tm=16, interpret=True)
    )
    state = prog.init_state(7)
    state = prog.run_pairs(state, 1)
    lib_out = prog.final_a(state)

    text = native_bridge.emit(
        "M 64\nN 256\niterations 4\nstencil\n" + FIVE_PT,
        "tiny", step=2, tm=16,
    )
    g = {"__name__": "gen"}
    exec(compile(text, "gen.py", "exec"), g)
    a0, b0 = g["init_state"](7, np.dtype("float32"))
    # library used golden.random_state seeding — regenerate identically
    from drstencil_tpu.ir import golden as gold_mod
    a0, b0 = gold_mod.random_state(spec, 7, dtype=np.float64)
    a0, b0 = a0.astype(np.float32), b0.astype(np.float32)
    call = g["build_call"](True)

    def apply_fn(src, slabs):
        lo, hi, *faces = slabs
        return call(src, lo, hi, *faces)

    a = g["pad_state"](a0)
    b = g["pad_state"](b0)
    sa = g["make_slabs"](a0)
    sb = g["make_slabs"](b0)
    b = apply_fn(jax.numpy.asarray(a), tuple(map(jax.numpy.asarray, sb)))
    a = apply_fn(b, tuple(map(jax.numpy.asarray, sa)))
    gen_out = np.asarray(a)[
        g["PR"] : g["PR"] + 64, g["PC"] : g["PC"] + g["N"]
    ]
    np.testing.assert_array_equal(gen_out, lib_out)


def test_emitted_matches_library_trapezoid_chained(tmp_path):
    """Bit-identical parity for the trapezoid path with affine column
    chains active (2d25pt_box's plan chains i1 and i2 — the emitter must
    reproduce _chain_columns exactly, greedy order and IEEE arithmetic)."""
    import jax
    from drstencil_tpu.ops.config import KernelConfig
    from drstencil_tpu.ops.runner import StencilProgram
    from drstencil_tpu.ops.stream import plan_taps
    from drstencil_tpu.ir import golden as gold_mod

    spec = small_spec("2d25pt_box", dims=(64, 256))
    # precondition: this table actually produces chains
    taps = sorted((d, s, c) for (d, s), c in spec.taps.items())
    _, _, chains = plan_taps(taps)
    assert any(c is not None for c in chains)

    cfg = KernelConfig(variant="stream", step=2, tm=16, ch=8,
                       trapezoid=True, lane_mode="roll", interpret=True)
    prog = StencilProgram(spec, cfg)
    state = prog.init_state(7)
    state = prog.run_pairs(state, 1)
    lib_out = prog.final_a(state)

    body = "".join(
        f"{d} {s} {c}\n" for d, s, c in sorted(
            ((off[0], off[1], c) for off, c in spec.taps.items())
        )
    )
    text = native_bridge.emit(
        "M 64\nN 256\niterations 4\nstencil\n" + body,
        "tiny25", step=2, tm=16, ch=8, trapezoid=True, lane_mode="roll",
    )
    assert "* i0" in text  # a chained inner made it into the program
    g = {"__name__": "gen"}
    exec(compile(text, "gen25.py", "exec"), g)
    a0, b0 = gold_mod.random_state(spec, 7, dtype=np.float64)
    a0, b0 = a0.astype(np.float32), b0.astype(np.float32)
    call = g["build_call"](True)

    def apply_fn(src, slabs):
        lo, hi, *faces = slabs
        return call(src, lo, hi, *faces)

    a = g["pad_state"](a0)
    sa = g["make_slabs"](a0)
    sb = g["make_slabs"](b0)
    b = apply_fn(jax.numpy.asarray(a), tuple(map(jax.numpy.asarray, sb)))
    a = apply_fn(b, tuple(map(jax.numpy.asarray, sa)))
    gen_out = np.asarray(a)[
        g["PR"] : g["PR"] + 64, g["PC"] : g["PC"] + g["N"]
    ]
    np.testing.assert_array_equal(gen_out, lib_out)


def test_chain_columns_guards():
    """_chain_columns: finds the 2d25pt chains, refuses unprofitable or
    ill-conditioned ones."""
    from drstencil_tpu.ops.stream import _chain_columns

    # the 2d25pt_box columns: i1 = 2*i0 + 0.01*p0, i2 = 2*i1 - 0.1*p2
    ch = _chain_columns([(0.02, 0.05, 0.1), (0.05, 0.1, 0.2),
                         (0.1, 0.2, 0.3)])
    assert ch[0] is None
    assert ch[1][0] == 0 and ch[1][1] == 2.0 and len(ch[1][2]) == 1
    assert ch[2][0] == 1 and ch[2][1] == 2.0 and len(ch[2][2]) == 1
    # single-entry columns: direct cost 1 can't be beaten
    assert _chain_columns([(0.2, 0.1, 0.3), (0.0, 0.0, 0.2),
                           (0.0, 0.0, 0.1)]) == [None, None, None]
    # alpha outside [1/16, 16] is rejected
    assert _chain_columns([(1.0, 2.0, 4.0), (100.0, 200.0, 400.0)])[1] is None
    # exact multiples chain with empty residual
    ch = _chain_columns([(1.0, 2.0), (2.0, 4.0)])
    assert ch[1] == (0, 2.0, [])


def test_emitted_trapezoid_check(tmp_path):
    stc = _write_small_stc(tmp_path, "tiny", (64, 256), FIVE_PT)
    out_py = str(tmp_path / "trap.py")
    subprocess.run(
        [CLI, "--step", "2", "--trapezoid", "--bx", "16", "--check",
         "-o", out_py, stc],
        check=True, capture_output=True,
    )
    env = dict(os.environ)
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, out_py, "--check", "--interpret",
         "--pairs", "1", "--warmup", "1"],
        capture_output=True, text=True, env=env, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    rms = [l for l in r.stdout.splitlines() if "RMS Error" in l]
    assert rms and float(rms[0].split(":")[1]) < 1e-3, r.stdout


def test_emitted_deep_trapezoid_matches_library(tmp_path):
    """Deep-trapezoid (fori_loop) emitted programs stay bit-identical to
    the library kernel, like the unrolled form."""
    import jax
    from drstencil_tpu.ops.config import KernelConfig
    from drstencil_tpu.ops.runner import StencilProgram

    spec = small_spec("2d5pt_star", dims=(96, 256))
    cfg = KernelConfig(variant="stream", step=6, tm=48, ch=8,
                       trapezoid=True, interpret=True)
    prog = StencilProgram(spec, cfg)
    state = prog.init_state(11)
    state = prog.run_pairs(state, 1)
    lib_out = prog.final_a(state)

    text = native_bridge.emit(
        "M 96\nN 256\niterations 4\nstencil\n" + FIVE_PT,
        "tiny", step=6, tm=48, ch=8, trapezoid=True,
    )
    g = {"__name__": "gen"}
    exec(compile(text, "gen.py", "exec"), g)
    from drstencil_tpu.ir import golden as gold_mod
    a0, b0 = gold_mod.random_state(spec, 11, dtype=np.float64)
    a0, b0 = a0.astype(np.float32), b0.astype(np.float32)
    call = g["build_call"](True)

    def apply_fn(src, slabs):
        lo, hi, *faces = slabs
        return call(src, lo, hi, *faces)

    a = g["pad_state"](a0)
    b = g["pad_state"](b0)
    sa = g["make_slabs"](a0)
    sb = g["make_slabs"](b0)
    b = apply_fn(jax.numpy.asarray(a), tuple(map(jax.numpy.asarray, sb)))
    a = apply_fn(b, tuple(map(jax.numpy.asarray, sa)))
    gen_out = np.asarray(a)[
        g["PR"] : g["PR"] + 96, g["PC"] : g["PC"] + g["N"]
    ]
    np.testing.assert_array_equal(gen_out, lib_out.reshape(96, g["N"]))


def test_emitted_matches_library_shard(tmp_path, cpu_devices):
    """Bit-identical parity for the multi-chip (shard-local, row_frame=
    False) kernel: the --shard program's shard_map pair vs
    parallel/stream_shard.sharded_stream_pair on the same 4-device CPU
    mesh (VERDICT r2 #6 — the multichip path gets the same generated-
    artifact + emitter-parity story as single-chip)."""
    import jax
    from drstencil_tpu.ir.spec import StencilSpec
    from drstencil_tpu.ops.config import KernelConfig
    from drstencil_tpu.parallel import halo, stream_shard
    from drstencil_tpu.ir import golden as gold_mod

    n = 4
    devs = list(cpu_devices)[:n]
    spec = small_spec("2d5pt_star", dims=(64, 256))
    cfg = KernelConfig(variant="stream", step=2, tm=8, trapezoid=True,
                       lane_mode="roll", interpret=True)
    mesh = halo.make_mesh(n, devices=devs)
    pair, g_lib, sh = stream_shard.sharded_stream_pair(spec, cfg, mesh)
    a0, b0 = gold_mod.random_state(spec, 7, dtype=np.float64)
    a0, b0 = a0.astype(np.float32), b0.astype(np.float32)
    sa = stream_shard.shard_state(a0, g_lib, n)
    sb = stream_shard.shard_state(b0, g_lib, n)
    a = jax.device_put(sa[0], sh)
    b = jax.device_put(sb[0], sh)
    slabs_a = tuple(jax.device_put(s, sh) for s in sa[1:])
    slabs_b = tuple(jax.device_put(s, sh) for s in sb[1:])
    a, b = pair(a, b, slabs_a, slabs_b)
    lib_out = stream_shard.unshard_state(np.asarray(a), g_lib, n)

    text = native_bridge.emit(
        "M 64\nN 256\niterations 4\nstencil\n" + FIVE_PT,
        "tiny", step=2, tm=8, trapezoid=True, lane_mode="roll", shards=n,
    )
    assert "NSHARDS = 4" in text and "ppermute" in text
    g = {"__name__": "gen"}
    exec(compile(text, "gen_shard.py", "exec"), g)
    gpair, gsh = g["build_sharded"](True, devs)
    esa = g["shard_state"](a0)
    esb = g["shard_state"](b0)
    # the emitted shard_state must equal the library's
    for e_arr, l_arr in zip(esa, sa):
        np.testing.assert_array_equal(e_arr, l_arr)
    ea = jax.device_put(esa[0], gsh)
    eb = jax.device_put(esb[0], gsh)
    eslabs_a = tuple(jax.device_put(s, gsh) for s in esa[1:])
    eslabs_b = tuple(jax.device_put(s, gsh) for s in esb[1:])
    ea, eb = gpair(ea, eb, eslabs_a, eslabs_b)
    gen_out = g["unshard_state"](np.asarray(ea))
    np.testing.assert_array_equal(gen_out, lib_out)


def test_emitted_matches_library_vfuse(tmp_path):
    """Bit-identical parity for the value-fused trapezoid: emitted --vfuse
    program vs library vfuse kernel (both chain levels through values, so
    FMA contraction applies identically)."""
    import jax
    from drstencil_tpu.ops.config import KernelConfig
    from drstencil_tpu.ops.runner import StencilProgram
    from drstencil_tpu.ir import golden as gold_mod

    spec = small_spec("2d5pt_star", dims=(64, 256))
    cfg = KernelConfig(variant="stream", step=3, tm=16, trapezoid=True,
                       vfuse=True, lane_mode="roll", interpret=True)
    prog = StencilProgram(spec, cfg)
    state = prog.init_state(7)
    state = prog.run_pairs(state, 1)
    lib_out = prog.final_a(state)

    text = native_bridge.emit(
        "M 64\nN 256\niterations 4\nstencil\n" + FIVE_PT,
        "tiny", step=3, tm=16, trapezoid=True, lane_mode="roll", vfuse=True,
    )
    assert "NSCRATCH = 0" in text and "EXT0" in text
    g = {"__name__": "gen"}
    exec(compile(text, "gen_vf.py", "exec"), g)
    a0, b0 = gold_mod.random_state(spec, 7, dtype=np.float64)
    a0, b0 = a0.astype(np.float32), b0.astype(np.float32)
    call = g["build_call"](True)

    def apply_fn(src, slabs):
        lo, hi, *faces = slabs
        return call(src, lo, hi, *faces)

    a = g["pad_state"](a0)
    sa = g["make_slabs"](a0)
    sb = g["make_slabs"](b0)
    b = apply_fn(jax.numpy.asarray(a), tuple(map(jax.numpy.asarray, sb)))
    a = apply_fn(b, tuple(map(jax.numpy.asarray, sa)))
    gen_out = np.asarray(a)[
        g["PR"] : g["PR"] + 64, g["PC"] : g["PC"] + g["N"]
    ]
    np.testing.assert_array_equal(gen_out, lib_out)


@pytest.mark.parametrize("vf", [False, True])
def test_emitted_matches_library_block(tmp_path, vf):
    """Bit-identical parity for hybrid fusion (--block 2): emitted
    program vs library kernel — same block-fused level plan, same
    schedule, scratch and value-fused variants."""
    import jax
    from drstencil_tpu.ops.config import KernelConfig
    from drstencil_tpu.ops.runner import StencilProgram
    from drstencil_tpu.ir import golden as gold_mod

    spec = small_spec("2d5pt_star", dims=(64, 256))
    cfg = KernelConfig(variant="stream", step=4, tm=16, trapezoid=True,
                       block=2, vfuse=vf, lane_mode="roll", interpret=True)
    prog = StencilProgram(spec, cfg)
    state = prog.init_state(7)
    state = prog.run_pairs(state, 1)
    lib_out = prog.final_a(state)

    text = native_bridge.emit(
        "M 64\nN 256\niterations 4\nstencil\n" + FIVE_PT,
        "tiny", step=4, tm=16, trapezoid=True, lane_mode="roll",
        vfuse=vf, block=2,
    )
    assert "NLEVELS = 2" in text
    g = {"__name__": "gen"}
    exec(compile(text, "gen_b2.py", "exec"), g)
    a0, b0 = gold_mod.random_state(spec, 7, dtype=np.float64)
    a0, b0 = a0.astype(np.float32), b0.astype(np.float32)
    call = g["build_call"](True)

    def apply_fn(src, slabs):
        lo, hi, *faces = slabs
        return call(src, lo, hi, *faces)

    a = g["pad_state"](a0)
    sa = g["make_slabs"](a0)
    sb = g["make_slabs"](b0)
    b = apply_fn(jax.numpy.asarray(a), tuple(map(jax.numpy.asarray, sb)))
    a = apply_fn(b, tuple(map(jax.numpy.asarray, sa)))
    gen_out = np.asarray(a)[
        g["PR"] : g["PR"] + 64, g["PC"] : g["PC"] + g["N"]
    ]
    np.testing.assert_array_equal(gen_out, lib_out)


def test_emitted_matches_library_shard_3d(tmp_path, cpu_devices):
    """Shard emitter parity for 3D (exercises the per-shard jframe fixup
    inside the shard_map local function)."""
    import jax
    from drstencil_tpu.ops.config import KernelConfig
    from drstencil_tpu.parallel import halo, stream_shard
    from drstencil_tpu.ir import golden as gold_mod

    n = 4
    devs = list(cpu_devices)[:n]
    spec = small_spec("3d7pt_star", dims=(32, 8, 256))
    cfg = KernelConfig(variant="stream", step=1, tm=24, lane_mode="roll",
                       interpret=True)
    mesh = halo.make_mesh(n, devices=devs)
    pair, g_lib, sh = stream_shard.sharded_stream_pair(spec, cfg, mesh)
    a0, b0 = gold_mod.random_state(spec, 5, dtype=np.float64)
    a0, b0 = a0.astype(np.float32), b0.astype(np.float32)
    sa = stream_shard.shard_state(a0, g_lib, n)
    sb = stream_shard.shard_state(b0, g_lib, n)
    args = [jax.device_put(x, sh) for x in (sa[0], sb[0])]
    slabs_a = tuple(jax.device_put(s, sh) for s in sa[1:])
    slabs_b = tuple(jax.device_put(s, sh) for s in sb[1:])
    a, b = pair(args[0], args[1], slabs_a, slabs_b)
    lib_out = stream_shard.unshard_state(np.asarray(a), g_lib, n)

    body = "".join(f"{o[0]} {o[1]} {o[2]} {c}\n"
                   for o, c in sorted(spec.taps.items()))
    text = native_bridge.emit(
        "L 32\nM 8\nN 256\niterations 4\nstencil\n" + body,
        "tiny3d", step=1, tm=24, lane_mode="roll", shards=n,
    )
    assert "FLAT3D = True" in text
    g = {"__name__": "gen"}
    exec(compile(text, "gen_shard3d.py", "exec"), g)
    gpair, gsh = g["build_sharded"](True, devs)
    esa = g["shard_state"](a0)
    esb = g["shard_state"](b0)
    for e_arr, l_arr in zip(esa, sa):
        np.testing.assert_array_equal(e_arr, l_arr)
    ea = jax.device_put(esa[0], gsh)
    eb = jax.device_put(esb[0], gsh)
    ea, eb = gpair(ea, eb,
                   tuple(jax.device_put(s, gsh) for s in esa[1:]),
                   tuple(jax.device_put(s, gsh) for s in esb[1:]))
    gen_out = g["unshard_state"](np.asarray(ea))
    np.testing.assert_array_equal(gen_out, lib_out)


def test_emitted_matches_library_vfuse_3d(tmp_path):
    """Bit-identical parity for the 3D value-fused trapezoid: emitted
    --vfuse program vs library vfuse kernel, including the out-of-kernel
    j-frame fixup (two dynamic_update_slices on the reshape view) that
    the emitted main() mirrors from ops/stream.py."""
    import jax
    from drstencil_tpu.ops.config import KernelConfig
    from drstencil_tpu.ops.runner import StencilProgram
    from drstencil_tpu.ir import golden as gold_mod

    spec = small_spec("3d7pt_star", dims=(24, 8, 256))
    cfg = KernelConfig(variant="stream", step=2, tm=24, trapezoid=True,
                       vfuse=True, lane_mode="roll", interpret=True)
    prog = StencilProgram(spec, cfg)
    state = prog.init_state(7)
    state = prog.run_pairs(state, 1)
    lib_out = prog.final_a(state)

    body = "".join(f"{o[0]} {o[1]} {o[2]} {c}\n"
                   for o, c in sorted(spec.taps.items()))
    text = native_bridge.emit(
        "L 24\nM 8\nN 256\niterations 4\nstencil\n" + body,
        "tiny3dvf", step=2, tm=24, trapezoid=True, lane_mode="roll",
        vfuse=True,
    )
    assert "NSCRATCH = 0" in text and "FLAT3D = True" in text
    g = {"__name__": "gen"}
    exec(compile(text, "gen_vf3d.py", "exec"), g)
    a0, b0 = gold_mod.random_state(spec, 7, dtype=np.float64)
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
    sa = g["make_slabs"](a0)
    sb = g["make_slabs"](b0)
    b = apply_fn(jax.numpy.asarray(a), tuple(map(jax.numpy.asarray, sb)))
    a = apply_fn(b, tuple(map(jax.numpy.asarray, sa)))
    gen_out = np.asarray(a)[
        g["PR"] : g["PR"] + g["R"], g["PC"] : g["PC"] + g["N"]
    ].reshape(spec.dims)
    np.testing.assert_array_equal(gen_out, lib_out)


def test_emitted_prefetch_depth(tmp_path):
    """--prefetch is LIVE: depth 1 emits pl.Buffered(1) on the window
    spec, runs bit-identical to the library pf1 kernel (DMA scheduling
    only — values unchanged), and the header records the depth."""
    import jax
    from drstencil_tpu.ops.config import KernelConfig
    from drstencil_tpu.ops.runner import StencilProgram

    spec = small_spec("2d5pt_star", dims=(64, 256))
    prog = StencilProgram(
        spec, KernelConfig(variant="stream", step=2, tm=16, interpret=True,
                           prefetch=1)
    )
    state = prog.init_state(7)
    state = prog.run_pairs(state, 1)
    lib_out = prog.final_a(state)

    text = native_bridge.emit(
        "M 64\nN 256\niterations 4\nstencil\n" + FIVE_PT,
        "tiny", step=2, tm=16, prefetch=1,
    )
    assert "PIPELINE_MODE = pl.Buffered(1)" in text
    assert "prefetch depth=1 (synchronous window fetch)" in text
    g = {"__name__": "gen"}
    exec(compile(text, "gen.py", "exec"), g)
    from drstencil_tpu.ir import golden as gold_mod
    a0, b0 = gold_mod.random_state(spec, 7, dtype=np.float64)
    a0, b0 = a0.astype(np.float32), b0.astype(np.float32)
    call = g["build_call"](True)
    a = g["pad_state"](a0)
    b = g["pad_state"](b0)
    sa = g["make_slabs"](a0)
    sb = g["make_slabs"](b0)
    lo, hi, *faces = tuple(map(jax.numpy.asarray, sb))
    b = call(jax.numpy.asarray(a), lo, hi, *faces)
    lo, hi, *faces = tuple(map(jax.numpy.asarray, sa))
    a = call(b, lo, hi, *faces)
    gen_out = np.asarray(a)[g["PR"] : g["PR"] + 64, g["PC"] : g["PC"] + g["N"]]
    np.testing.assert_array_equal(gen_out, lib_out)

    # default depth emits no synchronous annotation
    text2 = native_bridge.emit(
        "M 64\nN 256\niterations 4\nstencil\n" + FIVE_PT, "tiny",
        step=2, tm=16,
    )
    assert "PIPELINE_MODE = None" in text2


def test_emitted_matches_library_jfix_kernel(tmp_path):
    """Bit-identical parity for the in-kernel 3D j-frame restore
    (--jfix kernel): the emitted program's kernel must reproduce the
    library jfk kernel exactly (restore is pure copies from the same
    slab, same final-writer ordering)."""
    import jax
    from drstencil_tpu.ops.config import KernelConfig
    from drstencil_tpu.ops.runner import StencilProgram
    from drstencil_tpu.ir import golden as gold_mod

    spec = small_spec("3d7pt_star", dims=(16, 16, 256))
    stc = spec.to_stc()
    cfg = KernelConfig(variant="stream", step=2, tm=72, trapezoid=True,
                       interpret=True, jfix="kernel")
    prog = StencilProgram(spec, cfg)
    state = prog.init_state(5)
    state = prog.run_pairs(state, 1)
    lib_out = prog.final_a(state)

    text = native_bridge.emit(stc, "tiny", step=2, tm=72, trapezoid=True,
                              jfix="kernel")
    assert "jf_ref" in text and "JFK = True" in text
    g = {"__name__": "gen"}
    exec(compile(text, "gen.py", "exec"), g)
    a0, b0 = gold_mod.random_state(spec, 5, dtype=np.float64)
    a0, b0 = a0.astype(np.float32), b0.astype(np.float32)
    call = g["build_call"](True)
    import jax.numpy as jnp

    def apply_fn(src, slabs):
        lo, hi, face, jframe = slabs
        jf = jnp.pad(jframe, ((0, 0), (0, 8 - 2 * g["H"]), (0, 0))
                     ).reshape(g["NPLANES"] * 8, g["WB"])
        return call(src, lo, hi, face, jf)

    a = jnp.asarray(g["pad_state"](a0))
    b = jnp.asarray(g["pad_state"](b0))
    sa = tuple(map(jnp.asarray, g["make_slabs"](a0)))
    sb = tuple(map(jnp.asarray, g["make_slabs"](b0)))
    b = apply_fn(a, sb)
    a = apply_fn(b, sa)
    gen_out = np.asarray(a)[
        g["PR"] : g["PR"] + 16 * 16, g["PC"] : g["PC"] + g["N"]
    ]
    np.testing.assert_array_equal(gen_out, lib_out.reshape(16 * 16, g["N"]))


def test_emitted_matches_library_odd_step_distance(tmp_path):
    """Bit-identical parity for an explicit-distance config — the family
    the widened tuner space unlocks (pure-diagonal stencils have no data
    reuse at the default distance for odd steps; the space falls back to
    the largest valid distance in the reference range, which is analysis
    metadata only).  Library step=3/distance=2 vs emitted --dist 2."""
    import jax
    from drstencil_tpu.ops.config import KernelConfig
    from drstencil_tpu.ops.runner import StencilProgram
    from drstencil_tpu.ir import golden as gold_mod
    from drstencil_tpu.ir.passes import AnalysisError, analyze

    spec = small_spec("3d9pt_cross", dims=(24, 8, 256))
    # the default distance must reject (reference "No data to reuse")
    with pytest.raises(AnalysisError):
        analyze(spec, step=3)
    cfg = KernelConfig(variant="stream", step=3, distance=2, tm=32,
                       trapezoid=True, lane_mode="roll", interpret=True)
    prog = StencilProgram(spec, cfg)
    state = prog.init_state(7)
    state = prog.run_pairs(state, 1)
    lib_out = prog.final_a(state)

    body = "".join(f"{o[0]} {o[1]} {o[2]} {c}\n"
                   for o, c in sorted(spec.taps.items()))
    text = native_bridge.emit(
        "L 24\nM 8\nN 256\niterations 4\nstencil\n" + body,
        "tiny3dd2", step=3, distance=2, tm=32, trapezoid=True,
        lane_mode="roll",
    )
    g = {"__name__": "gen"}
    exec(compile(text, "gen_d2.py", "exec"), g)
    a0, b0 = gold_mod.random_state(spec, 7, dtype=np.float64)
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
    sa = g["make_slabs"](a0)
    sb = g["make_slabs"](b0)
    b = apply_fn(jax.numpy.asarray(a), tuple(map(jax.numpy.asarray, sb)))
    a = apply_fn(b, tuple(map(jax.numpy.asarray, sa)))
    gen_out = np.asarray(a)[
        g["PR"] : g["PR"] + g["R"], g["PC"] : g["PC"] + g["N"]
    ].reshape(spec.dims)
    np.testing.assert_array_equal(gen_out, lib_out)
