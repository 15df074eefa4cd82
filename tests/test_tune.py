"""Autotuner tests: space filtering, ledger resume, artifact files."""

import json
import os

import pytest

from drstencil_tpu.ops.config import KernelConfig
from drstencil_tpu.tune import tuned as tuned_mod
from drstencil_tpu.tune.space import default_space, vmem_estimate
from drstencil_tpu.tune.tuner import Tuner

from conftest import small_spec


def test_space_nonempty_and_valid():
    spec = small_spec("2d5pt_star")
    cands = list(default_space(spec))
    assert len(cands) >= 4
    labels = [c.cfg.label() for c in cands]
    assert len(set(labels)) == len(labels)  # no duplicates
    assert any(c.cfg.variant == "xla" for c in cands)
    assert any(c.cfg.variant == "stream" for c in cands)


def test_space_cross_stencil_excludes_step1_stream():
    spec = small_spec("2d5pt_cross")
    cands = list(default_space(spec))
    assert all(
        not (c.cfg.variant == "stream" and c.cfg.step == 1) for c in cands
    )


def test_vmem_filter():
    spec = small_spec("3d7pt_star", dims=(512, 512, 512))
    # an enormous tile must be rejected by the VMEM model
    big = KernelConfig(variant="stream", step=1, tm=65536)
    assert vmem_estimate(spec, big) is None
    # tm below the 3D row halo (h*M + h = 513) is structurally invalid
    small = KernelConfig(variant="stream", step=1, tm=512)
    assert vmem_estimate(spec, small) is None
    ok = KernelConfig(variant="stream", step=1, tm=1024)
    cand = vmem_estimate(spec, ok)
    assert cand is not None and cand.vmem_bytes > 0


def test_sweep_and_resume(tmp_path):
    spec = small_spec("2d5pt_star", dims=(32, 256))
    out = str(tmp_path)

    class InterpretTuner(Tuner):
        # run configs in interpret mode (no TPU in CI)
        def _measure(self, cand):
            cand = type(cand)(
                cfg=cand.cfg.replace(interpret=True),
                vmem_bytes=cand.vmem_bytes,
                window=cand.window,
            )
            return super()._measure(cand)

    tuned_mod.TUNED_PATH, orig = os.path.join(out, "tuned.json"), tuned_mod.TUNED_PATH
    try:
        tuner = InterpretTuner(spec, out, pairs=1, check=False)
        res = tuner.sweep(max_configs=3, log=lambda *_: None)
        assert res.best_cfg is not None
        assert res.tried == 3
        assert os.path.exists(tuner.ledger_path)
        assert os.path.exists(tuner.metrics_path)
        assert os.path.exists(tuner.duration_path)

        with open(tuner.ledger_path) as f:
            ledger = json.load(f)
        n_before = len(ledger)

        # resume: measured configs are never re-measured (the prior-first
        # reordering may admit at most one new config under max_configs)
        tuner2 = InterpretTuner(spec, out, pairs=1, check=False)
        res2 = tuner2.sweep(max_configs=3, log=lambda *_: None)
        assert res2.tried <= 1
        assert res2.best_cfg is not None  # seeded from ledger
        with open(tuner2.ledger_path) as f:
            assert len(json.load(f)) >= n_before

        # tuned.json recorded the best config
        with open(tuned_mod.TUNED_PATH) as f:
            best = json.load(f)
        assert spec.name in best
    finally:
        tuned_mod.TUNED_PATH = orig


def test_error_config_skipped_and_logged(tmp_path):
    spec = small_spec("2d5pt_star", dims=(32, 256))

    class BoomTuner(Tuner):
        def _measure(self, cand):
            raise RuntimeError("mosaic exploded")

    tuner = BoomTuner(spec, str(tmp_path), check=False)
    res = tuner.sweep(max_configs=2, log=lambda *_: None)
    assert res.errors == 2
    with open(tuner.ledger_path) as f:
        ledger = json.load(f)
    assert all(e["status"] == "error" for e in ledger.values())


def test_session_driver(tmp_path, monkeypatch):
    """End-to-end session over two stencils (interpret mode)."""
    import drstencil_tpu.tune.session as session_mod
    import drstencil_tpu.tune.tuner as tuner_mod
    from drstencil_tpu.tune import tuned as tuned_mod

    class InterpretTuner(tuner_mod.Tuner):
        def _measure(self, cand):
            cand = type(cand)(
                cfg=cand.cfg.replace(interpret=True),
                vmem_bytes=cand.vmem_bytes,
                window=cand.window,
            )
            return super()._measure(cand)

    monkeypatch.setattr(session_mod, "Tuner",
                        lambda spec, out, **kw: InterpretTuner(
                            spec, out, pairs=1, check=False))
    monkeypatch.setattr(tuned_mod, "TUNED_PATH",
                        str(tmp_path / "tuned.json"))

    # tiny stencils in a temp bench dir
    bench = tmp_path / "bench"
    bench.mkdir()
    (bench / "t1.stc").write_text(
        "M 32\nN 256\niterations 4\nstencil\n0 0 0.5\n1 0 0.25\n-1 0 0.25\n")
    res = session_mod.run_session(
        str(bench), str(tmp_path / "out"), max_configs=2,
        stencils=["t1"], log=lambda *_: None)
    assert res["t1"].best_cfg is not None
    assert os.path.exists(tmp_path / "out" / "tuning-time.log")
    assert os.path.exists(tmp_path / "out" / "gpuMetrics.csv")


def test_reconcile_from_ledgers(tmp_path, monkeypatch):
    from drstencil_tpu.tune import tuned as tuned_mod

    monkeypatch.setattr(tuned_mod, "TUNED_PATH", str(tmp_path / "tuned.json"))
    ledger = {
        "cfg_a": {"status": "ok", "ms_per_step": 2.0,
                  "config": {"variant": "stream", "step": 1, "tm": 64}},
        "cfg_b": {"status": "ok", "ms_per_step": 1.0,
                  "config": {"variant": "stream", "step": 2, "tm": 128}},
        "cfg_c": {"status": "error", "config": {"variant": "stream"}},
    }
    with open(tmp_path / "t1.ledger.json", "w") as f:
        json.dump(ledger, f)
    best = tuned_mod.reconcile_from_ledgers(str(tmp_path))
    assert best["t1"] == 1.0
    cfg = tuned_mod.best_config("t1")
    assert cfg.tm == 128 and cfg.step == 2

    # a later worse record must not regress the stored best
    from drstencil_tpu.ops.config import KernelConfig
    tuned_mod.record_best("t1", KernelConfig(tm=64), {"ms_per_step": 5.0})
    assert tuned_mod.best_config("t1").tm == 128


def test_winning_artifact_emitted(tmp_path, monkeypatch):
    """The sweep persists the winning config's generated program under
    out/cu/ (the reference's inspectable cu/<cfg>.cu artifacts,
    starter.sh:3-4)."""
    import drstencil_tpu.tune.tuner as tuner_mod
    from drstencil_tpu.ir.spec import parse_stc
    from drstencil_tpu.tune import tuned as tuned_mod

    monkeypatch.setattr(tuned_mod, "TUNED_PATH", str(tmp_path / "tuned.json"))
    spec = parse_stc(
        "M 32\nN 256\niterations 4\nstencil\n0 0 0.5\n1 0 0.25\n-1 0 0.25\n",
        "tiny",
    )

    class InterpretTuner(tuner_mod.Tuner):
        def _measure(self, cand):
            cand = type(cand)(cfg=cand.cfg.replace(interpret=True),
                              vmem_bytes=cand.vmem_bytes,
                              window=cand.window)
            return super()._measure(cand)

    t = InterpretTuner(spec, str(tmp_path / "out"), pairs=1, check=False)
    res = t.sweep(max_configs=2, log=lambda *_: None)
    assert res.best_cfg is not None
    import glob
    arts = glob.glob(str(tmp_path / "out" / "cu" / "tiny__*.py"))
    assert len(arts) == 1, arts
    text = open(arts[0]).read()
    assert "pallas_call" in text and "golden_apply" in text


def test_aggregate_metrics_mixed_headers(tmp_path):
    """metrics.csv re-emits its header on schema change; aggregation
    merges rows under the union of schemas."""
    from drstencil_tpu.tune import session as session_mod

    src = tmp_path / "metrics.csv"
    src.write_text(
        "stencil,config,ms_per_step\n"
        "a,cfg1,1.5\n"
        "stencil,config,ms_per_step,modeled_gbps\n"
        "a,cfg2,1.2,400.5\n"
    )
    dest = session_mod.aggregate_metrics(str(tmp_path))
    import csv as csv_mod
    with open(dest) as f:
        rows = list(csv_mod.DictReader(f))
    assert len(rows) == 2
    assert rows[0]["modeled_gbps"] == ""
    assert rows[1]["modeled_gbps"] == "400.5"


def test_objective_normalizes_dtype(tmp_path, monkeypatch):
    """A faster-in-raw-ms bf16 entry must NOT displace an fp32 entry
    whose roofline fraction is better (the bf16 naive SoL is 2x)."""
    from drstencil_tpu.ops.config import KernelConfig
    from drstencil_tpu.tune import tuned as tuned_mod

    monkeypatch.setattr(tuned_mod, "TUNED_PATH", str(tmp_path / "tuned.json"))
    fp32 = KernelConfig(variant="stream", step=2, tm=128)
    bf16 = KernelConfig(variant="stream", step=2, tm=128, dtype="bfloat16")
    tuned_mod.record_best("s", fp32, {"ms_per_step": 1.0})
    # bf16 at 0.7 ms: raw-faster but normalized 1.4 > 1.0 — rejected
    tuned_mod.record_best("s", bf16, {"ms_per_step": 0.7})
    assert tuned_mod.best_config("s").dtype == "float32"
    # bf16 at 0.4 ms: normalized 0.8 < 1.0 — accepted
    tuned_mod.record_best("s", bf16, {"ms_per_step": 0.4})
    assert tuned_mod.best_config("s").dtype == "bfloat16"


def test_keep_artifacts_per_config(tmp_path, monkeypatch):
    """--keep-artifacts writes cu/<cfg>.py for EVERY attempted stream
    config (reference behaviour: tuning.py:149-151 keeps cu/<cfg>.cu for
    all swept configs), not just the winner."""
    import glob

    import drstencil_tpu.tune.tuner as tuner_mod
    from drstencil_tpu.ir.spec import parse_stc
    from drstencil_tpu.tune import tuned as tuned_mod

    monkeypatch.setattr(tuned_mod, "TUNED_PATH", str(tmp_path / "tuned.json"))
    spec = parse_stc(
        "M 32\nN 256\niterations 4\nstencil\n0 0 0.5\n1 0 0.25\n-1 0 0.25\n",
        "tiny",
    )

    class InterpretTuner(tuner_mod.Tuner):
        def _measure(self, cand):
            cand = type(cand)(cfg=cand.cfg.replace(interpret=True),
                              vmem_bytes=cand.vmem_bytes,
                              window=cand.window)
            return super()._measure(cand)

    t = InterpretTuner(spec, str(tmp_path / "out"), pairs=1, check=False,
                       keep_artifacts=True)
    res = t.sweep(max_configs=4, log=lambda *_: None)
    assert res.best_cfg is not None
    arts = glob.glob(str(tmp_path / "out" / "cu" / "tiny__*.py"))
    # every attempted stream (non-factor) config left an artifact
    with open(t.ledger_path) as f:
        ledger = json.load(f)
    expect = [lbl for lbl, e in ledger.items()
              if e["config"].get("variant") == "stream"
              and not e["config"].get("factor")]
    assert len(expect) >= 1
    names = {os.path.basename(a)[len("tiny__"):-3] for a in arts}
    for lbl in expect:
        assert lbl in names, (lbl, names)


def test_isolated_hang_is_killed_and_sweep_continues(tmp_path, monkeypatch):
    """VERDICT r2 #3 'done' criterion: a config whose compile hangs
    (simulated via the worker's DRSTENCIL_TEST_HANG hook — the real
    Mosaic hang is SIGALRM-immune, exactly why isolation exists) is
    killed at the timeout, logged status=error, and the sweep moves on."""
    from drstencil_tpu.ir.spec import parse_stc
    from drstencil_tpu.tune import tuned as tuned_mod
    from drstencil_tpu.tune.tuner import Tuner

    monkeypatch.setattr(tuned_mod, "TUNED_PATH", str(tmp_path / "tuned.json"))
    monkeypatch.setenv("DRSTENCIL_TEST_HANG", "600")
    spec = parse_stc(
        "M 32\nN 256\niterations 4\nstencil\n0 0 0.5\n1 0 0.25\n-1 0 0.25\n",
        "tiny",
    )
    t = Tuner(spec, str(tmp_path), check=False, isolate=True,
              config_timeout_s=3.0)
    res = t.sweep(max_configs=2, log=lambda *_: None)
    assert res.errors == 2 and res.tried == 2  # killed, sweep continued
    with open(t.ledger_path) as f:
        ledger = json.load(f)
    assert len(ledger) == 2
    for e in ledger.values():
        assert e["status"] == "error"
        assert "isolated worker" in e["error"]


@pytest.mark.slow
def test_isolated_worker_measures_for_real(tmp_path, monkeypatch):
    """The isolate path end-to-end: a pure-CPU worker subprocess measures
    one interpret-mode config and returns a well-formed ledger entry."""
    from drstencil_tpu.ir.spec import parse_stc
    from drstencil_tpu.tune.space import Candidate
    from drstencil_tpu.tune.tuner import Tuner

    # pure-CPU child: detach the TPU relay exactly like the test docs say
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("PALLAS_AXON_POOL_IPS", "")
    spec = parse_stc(
        "M 32\nN 256\niterations 4\nstencil\n0 0 0.5\n1 0 0.25\n-1 0 0.25\n",
        "tiny",
    )
    t = Tuner(spec, str(tmp_path), pairs=1, check=False, isolate=True,
              config_timeout_s=300.0)
    cfg = KernelConfig(variant="stream", step=1, tm=16, interpret=True)
    entry = t._measure_isolated(Candidate(cfg=cfg, vmem_bytes=0, window=1))
    assert entry["status"] == "ok"
    assert entry["ms_per_step"] > 0
    assert entry["config"]["tm"] == 16


def test_finalist_medians_written_back_to_ledger(tmp_path):
    """A lucky-draw raw minimum must not survive finalist re-measurement:
    the median is folded back into the ledger so later argmin passes
    (tuner record_best, reconcile_from_ledgers) see the honest number
    (round-3 regression: 2d9pt_cross's refuted 0.5186 re-entered
    tuned.json via the next sweep's ledger argmin)."""
    from drstencil_tpu.tune.finalists import top_configs, writeback_medians

    cfg = KernelConfig(variant="stream", step=2, tm=64, trapezoid=True)
    lucky = {"status": "ok", "ms_per_step": 0.51,
             "config": cfg.to_dict() if hasattr(cfg, "to_dict") else
             __import__("dataclasses").asdict(cfg)}
    honest = {"status": "ok", "ms_per_step": 0.66,
              "config": dict(lucky["config"], tm=128)}
    path = tmp_path / "fake.ledger.json"
    path.write_text(json.dumps({"lucky": lucky, "honest": honest}))

    writeback_medians(str(path), {"lucky": 0.73}, reps=3)

    led = json.loads(path.read_text())
    assert led["lucky"]["ms_per_step"] == 0.73
    assert led["lucky"]["ms_per_step_sweep"] == 0.51
    assert led["lucky"]["protocol"] == "median-of-3"
    assert led["honest"]["ms_per_step"] == 0.66  # untouched
    # the shortlist now ranks the honest config first
    top = top_configs([str(path)], 2)
    assert top[0][1] == "honest"
    # idempotent: a second pass must not clobber the preserved raw value
    writeback_medians(str(path), {"lucky": 0.74}, reps=3)
    led = json.loads(path.read_text())
    assert led["lucky"]["ms_per_step_sweep"] == 0.51


def test_shortlist_ranks_by_sol_objective_not_raw_ms(tmp_path):
    """bf16 halves the roofline denominator, so a merely-faster bf16
    config must not displace a better-SCORING fp32 one (load-bearing in
    the 3D ledgers, where bf16 entries top the raw-ms ordering:
    3d9pt_cross stream_fu2_tm3080_trap_bfloat16 0.7978 raw vs the fp32
    winner 0.8367 — objective 1.5956 vs 0.8367)."""
    from dataclasses import asdict

    from drstencil_tpu.tune.finalists import top_configs

    fp32 = KernelConfig(variant="stream", step=2, tm=64, trapezoid=True)
    bf16 = KernelConfig(variant="stream", step=2, tm=64, trapezoid=True,
                        dtype="bfloat16")
    ledger = {
        "fp32_cfg": {"status": "ok", "ms_per_step": 0.84,
                     "config": asdict(fp32)},
        "bf16_cfg": {"status": "ok", "ms_per_step": 0.80,  # faster raw ms
                     "config": asdict(bf16)},
    }
    path = tmp_path / "fake.ledger.json"
    path.write_text(json.dumps(ledger))
    top = top_configs([str(path)], 2)
    assert top[0][1] == "fp32_cfg"  # wins on SoL-normalized objective
    assert top[1][1] == "bf16_cfg"


def test_space_distance_fallback_on_odd_step_diagonal():
    """Pure-diagonal stencils have no data reuse at the default distance
    for odd steps; the reference tuner handles this by sweeping --dist
    over [(step-1)*order, step*order] (tuning.py:24-25).  The space must
    keep those steps via an explicit-distance representative (the
    generated kernel is distance-invariant) rather than dropping them."""
    spec = small_spec("3d9pt_cross", dims=(24, 24, 256))
    cands = list(default_space(spec))
    odd = [c for c in cands if c.cfg.variant == "stream" and c.cfg.step == 3]
    assert odd, "step-3 candidates missing from the diagonal-3D space"
    # representative distance = largest valid in the reference range
    assert all(c.cfg.distance == 2 for c in odd)
    assert all("_d2_" in c.cfg.label() for c in odd)
    # even steps keep auto distance (no label noise)
    even = [c for c in cands if c.cfg.variant == "stream" and c.cfg.step == 2]
    assert even and all(c.cfg.distance == 0 for c in even)
    # step 5 gets the same treatment (d4 = largest valid)
    d4 = [c for c in cands if c.cfg.variant == "stream" and c.cfg.step == 5]
    assert d4, "step-5 candidates missing from the diagonal-3D space"
    assert all(c.cfg.distance == 4 for c in d4)


def test_space_fallback_candidates_build():
    """Every explicit-distance candidate the space emits must survive
    plan time (StencilProgram construction runs analyze + the full
    kernel build).  Regression: r5c recorded 'No data to reuse at
    distance 4' ledger errors for fu5_d4 configs generated under
    mid-edit code — a space/planner disagreement must fail HERE, in a
    CPU test, not as poisoned error entries in a hardware ledger."""
    from drstencil_tpu.ops.runner import StencilProgram

    spec = small_spec("3d9pt_cross", dims=(24, 24, 256))
    by_step = {}
    for c in default_space(spec):
        if c.cfg.variant == "stream" and c.cfg.distance != 0:
            by_step.setdefault(c.cfg.step, c.cfg)
    assert set(by_step) == {3, 5}
    for step, cfg in sorted(by_step.items()):
        cfg = cfg.replace(interpret=True)
        prog = StencilProgram(spec, cfg)  # plan-time legality
        assert prog.an.distance == cfg.distance


def test_space_includes_step5_deep_trapezoid():
    """step 5 (== DEEP_LEVELS: fori-loop level compilation) is swept."""
    from drstencil_tpu.ops import stream as stream_mod

    spec = small_spec("2d25pt_box")
    cands = [c for c in default_space(spec)
             if c.cfg.variant == "stream" and c.cfg.step == 5]
    assert cands
    assert all(c.cfg.trapezoid for c in cands)  # fused 5-step taps > 64
    assert stream_mod.DEEP_LEVELS == 5  # the deep path covers these
    assert all(not c.cfg.vfuse for c in cands)  # vfuse needs lv < DEEP


def test_space_gates_unrolled_trapezoid_compile_sinks():
    """2D unrolled-trapezoid configs (levels < DEEP_LEVELS) at tm >= 448
    with >= 20 unrolled tap-rows are a measured Mosaic compile-sink
    class (r5h: every fu3/fu4 tm512 config on the radius-3 2d13pt_star
    burned 420s-24min SIGALRM-deferred; fu4 tm448/512+ch on 2d25pt_box
    and fu4_tm512_ch32_vf on 2d9pt_star earlier).  The space must
    exclude the class while keeping (a) the small-tm unrolled region the
    winners live in and (b) the fu5+ deep fori-loop path, whose compile
    is constant-size at any tm."""
    from drstencil_tpu.ops import stream as stream_mod

    spec = small_spec("2d13pt_star", dims=(8192, 8192))
    cands = [c for c in default_space(spec) if c.cfg.variant == "stream"]
    assert cands
    order = 3  # radius-3 star
    for c in cands:
        cfg = c.cfg
        lv = cfg.step // cfg.block
        if (cfg.trapezoid and lv < stream_mod.DEEP_LEVELS
                and lv * (2 * cfg.block * order + 1) >= 20):
            assert cfg.tm < 448, f"compile-sink config in space: {cfg.label()}"
    # the measured winner region stays (fu2_tm64_trap_vf_roll = 1.235)
    assert any(c.cfg.step == 2 and c.cfg.tm == 64 and c.cfg.vfuse
               and c.cfg.trapezoid for c in cands)
    # deep fori-loop levels stay at large tm
    assert any(c.cfg.step >= stream_mod.DEEP_LEVELS and c.cfg.tm == 512
               for c in cands)


def test_space_gates_high_order_block_levels():
    """2D b-fused trapezoid levels with b*base_order >= 6 are the second
    measured compile-sink class (r5k: radius-3 2d13pt_star
    fu4_tm256_ch8_b2 = 2474s, fu8_tm384_ch16_b2 = 6412s, both immune to
    the 420s SIGALRM and at tm below the r5h tm>=448 gate).  Radius-2 b2
    (b*base_order = 4) stays in the space — r4f measured that family
    end-to-end on 2d5pt_cross/2d9pt_box."""
    # radius-3: no b >= 2 at all (3*2 = 6 hits the bound)
    spec13 = small_spec("2d13pt_star", dims=(8192, 8192))
    assert all(c.cfg.block == 1 for c in default_space(spec13)
               if c.cfg.variant == "stream")
    # radius-2: b2 survives the gate
    spec9 = small_spec("2d9pt_box")
    assert any(c.cfg.block == 2 for c in default_space(spec9)
               if c.cfg.variant == "stream")
