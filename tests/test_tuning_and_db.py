"""Autotuner DSL, search driver, sqlite archive, and the replay path —
modeled on the reference's tuning_impls_tests + sql_utils semantics."""

import os

import numpy as np
import pytest

import feinsum_tpu as f
from feinsum_tpu import sql_utils
from feinsum_tpu.tuning import (
    BoolParameter,
    IntParameter,
    TupleParameter,
    autotune,
    einsum_arg,
    get_transform_func_from_module_path,
    transform_param,
)


def small_div(ndof=8):
    return f.batched_einsum(
        "es,sij,ej->ei",
        [[f.array("Jx", ("E", 3), "float32"),
          f.array("R", (3, ndof, ndof), "float32"),
          f.array("ux", ("E", ndof), "float32")]])


def test_parameter_dsl():
    rng = np.random.default_rng(0)
    p = IntParameter(2, 5)
    for _ in range(20):
        assert 2 <= p.sample(rng) <= 5
        assert 2 <= p.mutate(3, rng) <= 5
    assert p.contains(4) and not p.contains(7)
    b = BoolParameter()
    assert b.contains(True) and not b.contains(3)
    t = TupleParameter((IntParameter(0, 3), BoolParameter()))
    v = t.sample(rng)
    assert t.contains(v)
    assert t.contains(t.mutate(v, rng))


def test_decorators_build_parametrized_transform():
    @transform_param("block", lambda e: IntParameter(3, 6))
    @einsum_arg("ndof", lambda e: int(e.index_to_dim_length["i"]))
    def transform(program, ndof, block):
        assert ndof == 8
        return program.with_descriptor(block_long=2 ** block)

    e = small_div()
    space = transform.get_param_space(e)
    assert set(space) == {"block"}
    tr = transform.bind_args(e, block=4)
    p = tr(f.generate_program(e))
    assert p.descriptor.block_long == 16


def test_impl_modules_load():
    for name in ("dg_div_v0", "dg_grad_v0", "face_mass_v0",
                 "elementwise_v1", "mass_v0", "tc_xla_v0",
                 "demo_transform_space"):
        pt = get_transform_func_from_module_path(name)
        assert pt.transform_params


def test_impl_transform_validates():
    e = small_div()
    pt = get_transform_func_from_module_path("dg_div_v0")
    tr = pt.bind_args(e, log2_block=8, hoist=True, parallel_grid=True,
                      dofmajor=False)
    f.validate_batched_einsum_transform(e, tr, long_dim_length=100)


def test_record_and_query_roundtrip(tmp_path):
    db = str(tmp_path / "test.sqlite")
    e = small_div()
    sql_utils.record_facts(
        e, transform_id="dg_div_v0.py",
        transform_params={"log2_block": 9, "hoist": True,
                          "parallel_grid": False, "dofmajor": False},
        runtime_in_sec=1.25e-4, device="TPU v5 lite", db_path=db,
        long_dim_length=1000)
    qs = sql_utils.query(e, "TPU v5 lite", db_path=db)
    assert len(qs) == 1
    q = qs[0]
    assert q.transform_id == "dg_div_v0.py"
    assert dict(q.transform_params)["log2_block"] == 9
    assert q.total_giga_op_rate > 0
    # renamed-but-isomorphic einsum must hit the same fact
    e2 = f.batched_einsum(
        "td,dkl,tl->tk",
        [[f.array("jac", ("NE", 3), "float32"),
          f.array("ref", (3, 8, 8), "float32"),
          f.array("dofs", ("NE", 8), "float32")]])
    qs2 = sql_utils.query(e2, "TPU v5 lite", db_path=db)
    assert len(qs2) == 1
    # and the lazy transform must bind+apply
    tr = qs2[0].transform
    prog = tr(f.generate_program(f.canonicalize_einsum(e2)))
    assert prog.descriptor.backend == "pallas"
    assert prog.descriptor.block_long == 512

    with pytest.raises(f.NoFactInDatabaseError):
        sql_utils.query(e, "TPU v4", db_path=db)


def test_retrieve_picks_best(tmp_path):
    db = str(tmp_path / "test.sqlite")
    e = small_div()
    for rt, blk in [(2e-4, 9), (1e-4, 10), (5e-4, 8)]:
        sql_utils.record_facts(
            e, transform_id="dg_div_v0.py",
            transform_params={"log2_block": blk, "hoist": False,
                              "parallel_grid": False, "dofmajor": False},
            runtime_in_sec=rt, device="TPU v5 lite", db_path=db,
            long_dim_length=1000)
    tr = sql_utils.retrieve(e, "TPU v5 lite", db_path=db)
    prog = tr(f.generate_program(f.canonicalize_einsum(e)))
    assert prog.descriptor.block_long == 1024


def test_get_timed_einsums_in_db(tmp_path):
    db = str(tmp_path / "test.sqlite")
    e = small_div()
    sql_utils.record_facts(
        e, transform_id="dg_div_v0.py",
        transform_params={"log2_block": 9, "hoist": True,
                          "parallel_grid": False, "dofmajor": False},
        runtime_in_sec=1e-4, device="TPU v5 lite", db_path=db,
        long_dim_length=1000)
    es = sql_utils.get_timed_einsums_in_db(db_path=db)
    assert len(es) == 1
    assert f.canonicalize_einsum(es[0]) == es[0]
    assert es[0] == f.canonicalize_einsum(e)


def test_autotune_smoke(tmp_path):
    db = str(tmp_path / "tune.sqlite")
    e = small_div()
    autotune(e, "dg_div_v0", db_path=db, long_dim_length=400,
             test_limit=3, device="TPU v5 lite",
             timeit_kwargs={"min_rounds": 5, "min_seconds": 0.02,
                            "validation_long_dim_length": 50,
                            "method": "host"})
    qs = sql_utils.query(f.canonicalize_einsum(e), "TPU v5 lite",
                         db_path=db)
    assert 1 <= len(qs) <= 3
    # resume: seeds + dedups from db, adds more points
    autotune(e, "dg_div_v0", db_path=db, long_dim_length=400,
             test_limit=2, device="TPU v5 lite",
             timeit_kwargs={"min_rounds": 5, "min_seconds": 0.02,
                            "validation_long_dim_length": 50,
                            "method": "host"})
    qs2 = sql_utils.query(f.canonicalize_einsum(e), "TPU v5 lite",
                          db_path=db)
    assert len(qs2) >= len(qs)
    params_seen = {q.transform_params for q in qs2}
    assert len(params_seen) == len(qs2), "duplicate configs re-measured"


def test_autotune_retries_sick_compile_helper(tmp_path, monkeypatch):
    """An HTTP 500 from the remote compile helpers is infrastructure noise
    (they crash on huge f64 modules; the relay round-robins across them),
    not a bad config: the tuner retries the point once after a cooldown
    instead of scoring a potential champion inf."""
    import feinsum_tpu.tuning as tuning

    db = str(tmp_path / "tune.sqlite")
    e = f.einsum("ej,ij->ei", f.array("u", ("E", 16), "float32"),
                 f.array("D", (16, 16), "float32"))
    from feinsum_tpu import measure
    real_timeit = measure.timeit
    calls = {"n": 0}

    def flaky_timeit(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError(
                "INTERNAL: remote_compile: HTTP 500: tpu_compile_helper"
                " subprocess exit code 1")
        return real_timeit(*a, **k)

    monkeypatch.setattr("feinsum_tpu.measure.timeit", flaky_timeit)
    monkeypatch.setattr(tuning.time, "sleep", lambda s: None)
    autotune(e, "mass_v0", db_path=db, long_dim_length=512,
             test_limit=3, device=f.FakeDevice("TPU v5 lite"),
             cost_model=False,
             timeit_kwargs=dict(min_rounds=1, min_seconds=0.01,
                                validation_long_dim_length=512))
    assert calls["n"] >= 2, "no retry happened"
    qs = sql_utils.query(e, f.FakeDevice("TPU v5 lite"),
                         db_path=db, err_if_no_results=False)
    assert len(qs) >= 1, "the retried point was not recorded"


def test_autotune_defers_500_exhausted_points(tmp_path, monkeypatch):
    """A point whose EVERY 500-retry dies is deferred (not scored inf) and
    re-queued the moment another point measures successfully — so a
    sick-helper-pool window (live r4 queue: four fresh dg lane_pack
    compiles in a row burned their retries) cannot permanently drop a
    potential champion from the run."""
    import feinsum_tpu.tuning as tuning

    db = str(tmp_path / "tune.sqlite")
    e = f.einsum("ej,ij->ei", f.array("u", ("E", 16), "float32"),
                 f.array("D", (16, 16), "float32"))
    from feinsum_tpu import measure
    real_timeit = measure.timeit
    calls = {"n": 0}

    def flaky_timeit(*a, **k):
        calls["n"] += 1
        if calls["n"] <= 3:        # first point: all three attempts die
            raise RuntimeError(
                "INTERNAL: remote_compile: HTTP 500: tpu_compile_helper"
                " subprocess exit code 1")
        return real_timeit(*a, **k)

    # two deterministic, known-measurable seed configs (random proposals
    # can be bind-invalid, which would end the run before any success
    # ever re-queues the deferred point)
    import numpy as np
    from feinsum_tpu.canonicalization import canonicalize_einsum
    from feinsum_tpu.tuning import get_transform_func_from_module_path
    ce = canonicalize_einsum(e)
    ts = get_transform_func_from_module_path("mass_v0")
    space = ts.get_param_space(ce)
    rng = np.random.default_rng(7)
    goods = []
    while len(goods) < 2:
        cand = {k: p.sample(rng) for k, p in space.items()}
        try:
            tr = ts.bind_args(ce, **cand)
            real_timeit(ce, transform=tr, long_dim_length=512,
                        min_rounds=1, min_seconds=0.01,
                        validation_long_dim_length=512)
        except Exception:  # noqa: BLE001
            continue
        if cand not in goods:
            goods.append(cand)

    monkeypatch.setattr("feinsum_tpu.measure.timeit", flaky_timeit)
    monkeypatch.setattr(tuning.time, "sleep", lambda s: None)
    autotune(e, "mass_v0", db_path=db, long_dim_length=512,
             test_limit=3, device=f.FakeDevice("TPU v5 lite"),
             cost_model=False, seed_configs=goods,
             timeit_kwargs=dict(min_rounds=1, min_seconds=0.01,
                                validation_long_dim_length=512))
    # point A: 3 failed attempts (deferred, does NOT consume test_limit —
    # advisor r4); point B: 1 success (re-queues A); point A again: 1
    # success; the freed budget then measures further points, so the
    # exact call count is no longer pinned — the contract is that A was
    # re-measured after the pool healed and both configs hit the DB
    assert calls["n"] >= 5, f"expected >=5 timeit calls, saw {calls['n']}"
    qs = sql_utils.query(e, f.FakeDevice("TPU v5 lite"),
                         db_path=db, err_if_no_results=False)
    assert len(qs) >= 2, "the deferred point was never re-measured"
    assert len({q.transform_params for q in qs}) >= 2, \
        "expected both seed configs measured"


def test_drifty_champion_ranks_by_reconfirmed_median(tmp_path):
    """VERDICT r4 weak #3 (live div10: a config claimed 4323 GOp/s, then
    re-measured 3112 = 28% drift, yet kept winning retrieve() on its lucky
    row).  With re-confirmations aggregated at the lower median, a config
    whose re-time is slow ranks by the slow sample — a consistently-
    reproducing runner-up overtakes it."""
    db = str(tmp_path / "drift.sqlite")
    e = f.einsum("ej,ij->ei", f.array("u", ("E", 16), "float32"),
                 f.array("D", (16, 16), "float32"))
    dev = f.FakeDevice("TPU v5 lite")
    # config A: lucky 1.0e-6 s + honest re-time 2.0e-6 s (drifty)
    for rt in (1.0e-6, 2.0e-6):
        sql_utils.record_facts(e, transform_id="mass_v0",
                               transform_params={"block_i": 8,
                                                 "vmem_idx": 0},
                               runtime_in_sec=rt, device=dev, db_path=db,
                               long_dim_length=2048)
    # config B: single consistent 1.5e-6 s row
    sql_utils.record_facts(e, transform_id="mass_v0",
                           transform_params={"block_i": 16, "vmem_idx": 0},
                           runtime_in_sec=1.5e-6, device=dev, db_path=db,
                           long_dim_length=2048)
    qs = sql_utils.query(e, dev, db_path=db)
    agg = sql_utils.aggregate_reconfirmations(qs)
    assert len(agg) == 2
    best = agg[0]
    assert dict(best.transform_params)["block_i"] == 16, \
        "the drifty config's lucky sample still leads"
    # A's representative is its honest (slow) re-time, not the lucky row
    a_row, = [q for q in agg
              if dict(q.transform_params)["block_i"] == 8]
    assert np.isclose(a_row.runtime_in_sec, 2.0e-6)


def test_aggregate_prefers_proto3_rows():
    """Rows measured under a retired timing instrument must not mix into
    a config's median once proto3 re-times exist."""
    from feinsum_tpu.sql_utils import QueryInfo, aggregate_reconfirmations

    def mk(rt, cver):
        return QueryInfo(transform_id="t", transform_params=(("k", "1"),),
                         runtime_in_sec=rt, compiler_version=cver,
                         giga_op_info_json='{"float32": 1.0}',
                         device_name="d", _einsum=None)

    rows = [mk(1.0e-6, "jax-x"),                      # pre-proto3, lucky
            mk(4.0e-6, "jax-x-timing-proto3"),
            mk(5.0e-6, "jax-x-timing-proto3"),
            mk(6.0e-6, "jax-x-timing-proto3")]
    agg = aggregate_reconfirmations(rows)
    assert len(agg) == 1
    assert np.isclose(agg[0].runtime_in_sec, 5.0e-6)  # proto3 median only


def test_migrate_from_reference_v6(tmp_path):
    """The migration tool reconstructs einsum classes from a reference-format
    archive (SizeParam axes come back parametric) and maps them to TPU
    schedule spaces."""
    import subprocess
    import sys

    import feinsum_tpu as f
    from feinsum_tpu import sql_utils

    src = str(tmp_path / "ref_v6.sqlite")
    e1 = f.einsum("xre,rij,ej->xei",
                  f.array("a", (3, 3, "E"), "float32"),
                  f.array("b", (3, 35, 35), "float32"),
                  f.array("c", ("E", 35), "float32"))
    e2 = f.get_tccg_benchmark(5, dtype="float32")
    for e in (e1, e2):
        sql_utils.record_facts(e, transform_id="xre_rij_ej_to_xei.py",
                               transform_params={"n_e_per_wg": 8},
                               runtime_in_sec=1e-3, db_path=src,
                               long_dim_length=1000)
    r = subprocess.run(
        [sys.executable, "-m",
         "feinsum_tpu.data.bin.migrate_from_reference_v6",
         "--src", src, "--dst", str(tmp_path / "out.sqlite")],
        capture_output=True, text=True, check=True)
    assert "2 einsum classes migrated, 0 skipped" in r.stdout, r.stdout


def test_db_hit_replay_budget():
    """The north-star consumer path (SURVEY.md §3.2, "<10 ms DB-hit→codegen"):
    with imports and the native canonicalizer warm, canonicalize → query the
    shipped archive → bind the stored transform → build the executable in
    under 10 ms (median of 20).  Compilation is NOT in this budget — jit is
    lazy and first-run compiles amortize through the persistent compile
    cache, exactly as the reference's caller-side generate_code_v2 is
    outside its replay path."""
    import time

    import feinsum_tpu as f
    from feinsum_tpu import sql_utils

    ndof = 35
    div = f.batched_einsum(
        "es,sij,ej->ei",
        [[f.array(jn, ("E", 3), "float32"),
          f.array("R", (3, ndof, ndof), "float32"),
          f.array(un, ("E", ndof), "float32")]
         for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])
    dev = f.FakeDevice("TPU_v5_lite")

    def replay():
        tr = sql_utils.retrieve(div, dev)
        prog = tr(f.generate_program(div))
        return f.build_executable(prog, long_dim_length=100_000)

    assert callable(replay())          # warm: imports, canon lib, sqlite
    ts = sorted((time.perf_counter(), replay(),
                 time.perf_counter())[::2] for _ in range(20))
    ts = sorted(t1 - t0 for t0, t1 in ts)
    median_ms = 1e3 * ts[len(ts) // 2]
    assert median_ms < 10.0, f"DB-hit replay took {median_ms:.2f} ms (median)"


def test_ttgt_replay_uses_target_program_names(tmp_path):
    """Archive replay binds params against the CANONICAL einsum (names
    arg_0...), but layout choices must land on the *target program's*
    operand names (bench r2 regression: KeyError 'arg_0' on every TCCG
    ttgt replay)."""
    import feinsum_tpu as f
    from feinsum_tpu import sql_utils

    e = f.einsum("ikl,ljk->ij",
                 f.array("left", (32, 24, 16), "float32"),
                 f.array("right", (16, 40, 24), "float32"))
    db = str(tmp_path / "t.sqlite")
    sql_utils.record_facts(
        e, transform_id="ttgt_v0.py",
        transform_params={"perm_a": 1, "perm_b": 1, "perm_out": 1,
                          "precision_idx": 1},
        runtime_in_sec=1e-3, db_path=db, long_dim_length=100)
    tr = sql_utils.retrieve(e, db_path=db)
    prog = tr(f.generate_program(e))
    names = {n for n, _ in prog.descriptor.arg_layouts}
    assert names == {"left", "right"}, names
    f.validate_batched_einsum_transform(e, tr, long_dim_length=100)


def test_position_sensitive_params_replay_canonically(tmp_path):
    """Operand-position-sensitive params (tc_gemm_v0 ``swap``, ttgt_v0
    ``perm_a``/``perm_b``) are archived relative to CANONICAL operand
    positions, but replay applies the transform to the user-ordered
    program.  On einsums whose canonical operand order differs from the
    user's (TCCG #02 ``dca,bd->abc`` -> ``jl,lki->ijk``, sigma_j=(1,0))
    the params must be routed through
    :func:`canonicalization.canonical_operand_positions` — bench r2
    regression: tccg_02's archived champion replayed with the
    resident/streamed roles flipped."""
    import feinsum_tpu as f
    from feinsum_tpu.canonicalization import (
        canonical_operand_positions,
        canonicalize_einsum,
    )
    from feinsum_tpu.tuning import get_transform_func_from_module_path

    e = f.einsum("dca,bd->abc",
                 f.array("T", (24, 16, 48), "float32"),
                 f.array("U", (32, 24), "float32"))
    ce = canonicalize_einsum(e)
    assert canonical_operand_positions(e) == (1, 0)
    # idempotence precondition: params tuned on the canonical einsum are
    # stored against identity positions
    assert canonical_operand_positions(ce) == (0, 1)

    pt = get_transform_func_from_module_path("tc_gemm_v0.py")
    params = dict(log2_block=9, blkc128=0, backend_pallas=False,
                  precision_idx=0, swap=False, dofmajor=False, fold=False,
                  vmem_idx=2)
    tr = pt.bind_args(ce, **params)
    p_canon = tr(f.generate_program(ce))
    p_user = tr(f.generate_program(e))
    # the rewritten 2D GEMM must have the same geometry either way: same
    # resident (N, K) factor, same streamed K width
    shapes_of = lambda p: sorted(
        tuple(int(d) for d in a.shape if not hasattr(d, "name"))
        for a in p.einsum.args[0])
    assert shapes_of(p_canon) == shapes_of(p_user)
    f.validate_batched_einsum_transform(e, tr, long_dim_length=100)

    # ttgt: rank-asymmetric operands — a perm applied to the wrong
    # position would have the wrong length
    pt2 = get_transform_func_from_module_path("ttgt_v0.py")
    tr2 = pt2.bind_args(ce, perm_a=0, perm_b=1, perm_out=0,
                        precision_idx=1, natural_out=1)
    prog2 = tr2(f.generate_program(e))
    ranks = {"T": 3, "U": 2}
    for name, perm in prog2.descriptor.arg_layouts:
        assert len(perm) == ranks[name], (name, perm)
    f.validate_batched_einsum_transform(e, tr2, long_dim_length=100)


def test_bench_candidate_ladder_dedups(monkeypatch):
    """bench's fallback ladder: re-timed copies of one champion collapse to
    one slot so a genuine runner-up is always reachable."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    import feinsum_tpu as f

    e = f.einsum("ej,ij->ei", f.array("u", ("E", 8), "float32"),
                 f.array("D", (8, 8), "float32"))

    class FakeQ:
        def __init__(self, rate, params):
            self.transform_id = "mass_v0.py"
            self.transform_params = tuple(sorted(params.items()))
            self.total_giga_op_rate = rate
            self.compiler_version = "jax=x timing-proto3"
            self.transform = lambda p: p

    dup = {"log2_block": 10}
    other = {"log2_block": 11}
    monkeypatch.setattr(bench.sql_utils, "query",
                        lambda einsum, *a, **k: [
                            FakeQ(100.0, dup), FakeQ(99.0, dup),
                            FakeQ(98.0, dup), FakeQ(97.0, dup),
                            FakeQ(50.0, other)])
    labels = [label for label, _ in
              bench.candidate_transforms("row", e)]
    assert len(labels) == 3            # dup champion, runner-up, default
    assert labels[-1] == "built-in default"


def test_bench_f64_ladder_proven_rows_first(monkeypatch):
    """fp64 ladder contract (2026-08-19, supersedes dd-first): this relay
    build rejects dd modules outright (the 13:16 sweep 500'd instantly in
    two fresh processes) and a failed dd compile sickens the helper pool,
    eating every later candidate (live bench 14:50 lost the whole grad
    row).  So for f64 rows: archived non-dd rows FIRST (proven to compile
    here), then archived dd rows, and the dd built-in ONLY when the
    archive proves dd has compiled on this platform; fp32 ladders are
    unchanged."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    import feinsum_tpu as f

    e64 = f.einsum("ej,ij->ei", f.array("u", ("E", 8), "float64"),
                   f.array("D", (8, 8), "float64"))

    class FakeQ:
        def __init__(self, tid, rate):
            self.transform_id = tid
            self.transform_params = (("log2_block", rate),)
            self.total_giga_op_rate = rate
            self.compiler_version = "jax=x timing-proto3"
            self.transform = lambda p: p

    # archive holds both kinds: XLA rows first even when a dd row out-rates
    # them; dd built-in allowed because a dd fact exists; default last
    monkeypatch.setattr(bench.sql_utils, "query",
                        lambda einsum, *a, **k: [
                            FakeQ("xla_v0.py", 100.0),
                            FakeQ("dd_pallas_v0.py", 500.0),
                            FakeQ("xla_v0.py", 90.0)])
    labels = [label for label, _ in bench.candidate_transforms("row", e64)]
    first_dd = next(i for i, s in enumerate(labels) if "dd" in s)
    assert all("xla_v0" in s for s in labels[:first_dd]) and first_dd == 2
    assert any("built-in dd_pallas" in s for s in labels)
    assert labels[-1] == "built-in default"

    # no archived dd rows: the dd built-in must NOT be gambled at all
    monkeypatch.setattr(bench.sql_utils, "query",
                        lambda einsum, *a, **k: [FakeQ("xla_v0.py", 100.0)])
    labels = [label for label, _ in bench.candidate_transforms("row", e64)]
    assert not any("dd" in s for s in labels)
    assert labels[-1] == "built-in default"


def test_shipped_archive_integrity():
    """Every einsum class in the SHIPPED archive reconstructs (canonical
    soundness asserts inside get_timed_einsums_in_db) and its best fact's
    transform binds against the canonical einsum — catches archive
    corruption and params/space drift after tuning sessions."""
    es = sql_utils.get_timed_einsums_in_db()     # asserts soundness per row
    assert len(es) >= 50
    bound = 0
    for e in es:
        qs = sql_utils.query(e, "TPU v5 lite", err_if_no_results=False)
        if not qs:
            continue                              # facts from another device
        best = max(qs, key=lambda q: q.total_giga_op_rate)
        assert callable(best.transform)           # lazy import + bind
        bound += 1
    assert bound >= 50, f"only {bound} classes have TPU_v5_lite champions"


def test_bench_ceiling_accounting_smoke(capsys):
    """The per-row ceiling accounting printed to bench stderr (VERDICT r2
    weak #3): tiled bytes amplify sublane-padded small-ndof operands, and
    the serial/tiled-serial ceilings land in (0, 100%]."""
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    import numpy as np
    import feinsum_tpu as f

    # (E, 4) f32: 4 sublanes pad to 8 -> ~2x tiled amplification (dof-major
    # (4, E) likewise); 1D and aligned shapes don't amplify
    assert bench._tiled_bytes((1024,), 4) == 1024 * 4
    assert bench._tiled_bytes((4, 1024), 4) == 8 * 1024 * 4
    assert bench._tiled_bytes((8, 128), 4) == 8 * 128 * 4
    assert bench._tiled_bytes((3, 5, 130), 4) == 3 * 8 * 256 * 4

    e = f.einsum("es,sij,ej->ei",
                 f.array("J", ("E", 3), "float32"),
                 f.array("R", (3, 4, 4), "float32"),
                 f.array("u", ("E", 4), "float32"))
    E = 4096
    arrays = {"J": np.ones((E, 3), np.float32),
              "R": np.ones((3, 4, 4), np.float32),
              "u": np.ones((E, 4), np.float32)}
    outs = (np.ones((E, 4), np.float32),)
    bench.log_ceiling_accounting("row", e, arrays, outs, 100.0, 0.7,
                                 "TPU_v5_lite", E)
    err = capsys.readouterr().err
    assert "tiled-serial" in err and "achieved  70.0%" in err


def test_dg_spaces_share_full_knob_set():
    """VERDICT r2 weak #7 / next #6: ONE definition site for the DG spaces —
    every family exposes the full knob vocabulary; structurally inapplicable
    knobs gate to a pinned-off IntParameter(0,0)."""
    from feinsum_tpu.tuning import (
        BoolParameter, IntParameter, get_transform_func_from_module_path)
    import feinsum_tpu as f

    ndof = 7
    div = f.batched_einsum(
        "es,sij,ej->ei",
        [[f.array(j, ("E", 3), "float32"),
          f.array("R", (3, ndof, ndof), "float32"),
          f.array(u, ("E", ndof), "float32")]
         for j, u in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])
    curl = f.batched_einsum(
        "e,rij,ej->ei",
        [[f.array(j, ("E",), "float32"),
          f.array("D", (3, ndof, ndof), "float32"),
          f.array(u, ("E", ndof), "float32")]
         for j, u in [("Jy", "uz"), ("Jz", "ux"), ("Jx", "uy")]])
    matvec = f.einsum("ej,ij->ei", f.array("u", ("E", ndof), "float32"),
                      f.array("D", (ndof, ndof), "float32"))

    modules = ["dg_div_v0", "dg_grad_v0", "face_mass_v0", "curl_3d_v0",
               "mass_v0"]
    spaces = {m: get_transform_func_from_module_path(m).get_param_space(div)
              for m in modules}
    names = {m: set(sp) for m, sp in spaces.items()}
    assert len(set(map(frozenset, names.values()))) == 1, names
    for knob in ("prereduce", "mfold", "jfold", "host_hoist", "hoist"):
        assert knob in names["dg_div_v0"]

    sp = get_transform_func_from_module_path("curl_3d_v0")
    # curl: prereduce gates ON (D's r is private); div: OFF (R's s is shared)
    assert isinstance(sp.get_param_space(curl)["prereduce"], BoolParameter)
    assert isinstance(sp.get_param_space(div)["prereduce"], IntParameter)
    # matvec: jfold gates OFF (single streamed operand)
    assert isinstance(sp.get_param_space(matvec)["jfold"], IntParameter)
    # archived params from the pre-consolidation narrower spaces still bind
    tr = sp.bind_args(curl, log2_block=12, dofmajor=True, parallel_grid=True,
                      hoist=False)
    f.validate_batched_einsum_transform(curl, tr, long_dim_length=640)


def test_permutation_parameter_and_ttgt_v1():
    """PermutationParameter: structured tuple values, transposition-swap
    mutation (VERDICT r2 missing #3); ttgt_v1 searches it directly."""
    import numpy as np
    from feinsum_tpu.tuning import (
        PermutationParameter, get_transform_func_from_module_path)
    import feinsum_tpu as f

    p = PermutationParameter(4)
    rng = np.random.default_rng(0)
    v = p.sample(rng)
    assert p.contains(v) and sorted(v) == [0, 1, 2, 3]
    m = p.mutate(v, rng)
    assert p.contains(m)
    assert sum(a != b for a, b in zip(v, m)) == 2    # one transposition
    assert not p.contains((0, 1, 1, 2))

    e = f.get_tccg_benchmark(3, dtype="float32")
    sp = get_transform_func_from_module_path("ttgt_v1")
    space = sp.get_param_space(e)
    assert isinstance(space["layout_a"], PermutationParameter)
    ra = space["layout_a"].ndim
    rb = space["layout_b"].ndim
    ro = space["layout_out"].ndim
    tr = sp.bind_args(e, layout_a=tuple(range(ra))[::-1],
                      layout_b=tuple(range(rb)),
                      layout_out=tuple(range(ro)), precision_idx=1,
                      natural_out=1)
    f.validate_batched_einsum_transform(e, tr, long_dim_length=24)


def test_bench_stale_cache_fallback(monkeypatch, tmp_path, capsys):
    """When the relay outage outlasts the full probe window, bench emits the
    last green headline line marked stale_cache=true (exit 0) instead of no
    artifact (exit 3) — and exits 3 as before when no green run is cached."""
    import json
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    import pytest
    import subprocess

    def probe_fails(*a, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=1)

    monkeypatch.setattr("subprocess.run", probe_fails)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)

    # no cache (and no committed seed) -> exit 3
    cache = tmp_path / "green.json"
    monkeypatch.setattr(bench, "_LAST_GREEN", str(cache))
    monkeypatch.setattr(bench, "_LAST_GREEN_SEED",
                        str(tmp_path / "no-seed.json"))
    with pytest.raises(SystemExit) as ei:
        bench._probe_backend(attempts=2, probe_timeout=1)
    assert ei.value.code == 3

    # cached green line -> printed with stale markers, exit 0
    line = {"metric": "m", "value": 81.26, "unit": "%roofline",
            "vs_baseline": 1.515}
    cache.write_text(json.dumps(
        {"line": line, "captured_at": "2026-08-17T18:27:00Z"}))
    with pytest.raises(SystemExit) as ei:
        bench._probe_backend(attempts=2, probe_timeout=1)
    assert ei.value.code == 0
    out = capsys.readouterr().out.strip().splitlines()[-1]
    emitted = json.loads(out)
    assert emitted["value"] == 81.26
    assert emitted["stale_cache"] is True
    assert emitted["captured_at"] == "2026-08-17T18:27:00Z"


def test_bench_deadline_self_limit(monkeypatch, tmp_path, capsys):
    """BENCH_DEADLINE makes bench exit cleanly between rows (the queue's
    short-relay-window mode): sections stop immediately, the probe loop
    stops retrying, and a truncated headline prefers the marked stale line
    over an arbitrary-subset geomean."""
    import json
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import bench
    import pytest
    import subprocess

    # no deadline (the driver's own capture): never limits
    monkeypatch.setattr(bench, "_DEADLINE", 0.0)
    assert not bench.past_deadline()
    assert not bench.past_deadline(1e12)

    # deadline in the past: every section loop returns before touching a row
    monkeypatch.setattr(bench, "_DEADLINE", 1.0)
    assert bench.past_deadline()
    assert bench.run_headline("TPU_v5_lite") == ([], [])
    bench._run_rows([("x", None, None)], "TPU_v5_lite")   # no TypeError:
    # the row is never unpacked into measure_row

    # probe loop: deadline stops the retry ladder after the first failure
    # (no 120 s sleeps burning the window)
    calls = []

    def probe_fails(*a, **k):
        calls.append(1)
        raise subprocess.TimeoutExpired(cmd="probe", timeout=1)

    monkeypatch.setattr("subprocess.run", probe_fails)
    monkeypatch.setattr(bench.time, "sleep",
                        lambda s: pytest.fail("slept past the deadline"))
    cache = tmp_path / "green.json"
    line = {"metric": "m", "value": 81.26, "unit": "%roofline",
            "vs_baseline": 1.515}
    cache.write_text(json.dumps(
        {"line": line, "captured_at": "2026-08-17T18:27:00Z"}))
    monkeypatch.setattr(bench, "_LAST_GREEN", str(cache))
    with pytest.raises(SystemExit) as ei:
        bench._probe_backend(attempts=8, probe_timeout=1)
    assert ei.value.code == 0
    assert len(calls) == 1
    emitted = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert emitted["stale_cache"] is True

    # _emit_stale_line: False (and no output) when no green run is cached
    monkeypatch.setattr(bench, "_LAST_GREEN", str(tmp_path / "missing.json"))
    monkeypatch.setattr(bench, "_LAST_GREEN_SEED",
                        str(tmp_path / "no-seed.json"))
    assert bench._emit_stale_line("reason") is False
    assert capsys.readouterr().out.strip() == ""

    # the committed seed backs up a deleted live cache (fresh checkouts
    # wipe gitignored files — the r4 reset)
    seed = tmp_path / "seed.json"
    seed.write_text(json.dumps(
        {"line": line, "captured_at": "2026-08-17T19:05:00Z"}))
    monkeypatch.setattr(bench, "_LAST_GREEN_SEED", str(seed))
    assert bench._emit_stale_line("reason") is True
    emitted = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert emitted["stale_cache"] is True
    assert emitted["captured_at"] == "2026-08-17T19:05:00Z"


# {{{ analytic cost model (tuning/cost_model.py): the proposal ranker

def test_cost_model_prefers_known_layout_truths():
    """Qualitative checks against measured v5e facts: dof-major storage
    beats row-major for short-dof streams (3.66x lane padding), and bigger
    blocks beat tiny ones (per-grid-step overhead)."""
    from feinsum_tpu.codegen.program import get_index_lengths
    from feinsum_tpu.tuning import get_transform_func_from_module_path
    from feinsum_tpu.tuning.cost_model import predict_for_params

    base = dict(log2_block=15, blkc128=0, parallel_grid=True, hoist=False,
                fold=False, preblock=False, precision_3x=False, jfold=False,
                mfold=False, prereduce=False, lane_pack_g=0, rowcat=False,
                vmem_idx=2, split_rows=False, accum_f32=False,
                host_hoist=True)
    # dot-free copy class: pure streaming, so storage layout dominates —
    # a (E,35) row-major stream pads 35 lanes to 128 (3.66x), dof-major
    # (35,E) only 35 sublanes to 40
    cp = f.canonicalize_einsum(
        f.einsum("ij,ij->ij", f.array("A", ("E", 35), "float32"),
                 f.array("B", ("E", 35), "float32")))
    spc = get_transform_func_from_module_path("elementwise_v1")
    lengths_c = get_index_lengths(cp, 1_000_000)
    space_c = spc.get_param_space(cp)
    base_c = {k: base[k] for k in space_c if k in base}
    base_c["flatten"] = False
    t_rowmajor = predict_for_params(spc, cp, dict(base_c, dofmajor=False),
                                    lengths_c, "TPU_v5_lite")
    t_dofmajor = predict_for_params(spc, cp, dict(base_c, dofmajor=True),
                                    lengths_c, "TPU_v5_lite")
    assert t_dofmajor < t_rowmajor            # lane padding priced
    # matvec class: per-grid-step overhead separates block sizes
    e = f.canonicalize_einsum(
        f.einsum("ej,ij->ei", f.array("u", ("E", 20), "float32"),
                 f.array("D", (20, 20), "float32")))
    sp = get_transform_func_from_module_path("mass_v0")
    lengths = get_index_lengths(e, 1_000_000)
    t_big = predict_for_params(sp, e, dict(base, dofmajor=True), lengths,
                               "TPU_v5_lite")
    t_tiny_blocks = predict_for_params(
        sp, e, dict(base, dofmajor=True, log2_block=8), lengths,
        "TPU_v5_lite")
    assert t_big < t_tiny_blocks              # grid-step overhead priced
    # a structurally invalid point ranks as None, never raises
    e35 = f.canonicalize_einsum(
        f.einsum("ej,ij->ei", f.array("u", ("E", 35), "float32"),
                 f.array("D", (35, 35), "float32")))
    assert predict_for_params(sp, e35, dict(base, dofmajor=False,
                                            lane_pack_g=1),  # 70 % 8 != 0
                              get_index_lengths(e35, 1_000_000),
                              "TPU_v5_lite") is None


def test_cost_model_ranks_shipped_archive():
    """Against the shipped archive's matvec class (81 measured rows): rank
    correlation must stay positive and the measured champion must land in
    the predicted top quartile — the property that makes model-guided
    proposals worth their compiles.  Deterministic: fixed archive, fixed
    model."""
    import numpy as np

    from feinsum_tpu import sql_utils
    from feinsum_tpu.codegen.program import get_index_lengths
    from feinsum_tpu.tuning import get_transform_func_from_module_path
    from feinsum_tpu.tuning.cost_model import predict_for_params

    e = f.canonicalize_einsum(
        f.einsum("ej,ij->ei", f.array("u", ("E", 20), "float32"),
                 f.array("D", (20, 20), "float32")))
    qs = [q for q in sql_utils.query(e, f.FakeDevice("TPU v5 lite"),
                                     err_if_no_results=False)
          if np.isfinite(q.runtime_in_sec)]
    assert len(qs) >= 30
    lengths = get_index_lengths(e, 1_000_000)
    preds, meas = [], []
    for q in qs:
        sp = get_transform_func_from_module_path(q.transform_id)
        p = predict_for_params(sp, e, dict(q.transform_params), lengths,
                               "TPU_v5_lite")
        if p is not None:
            preds.append(p)
            meas.append(q.runtime_in_sec)
    preds, meas = np.asarray(preds), np.asarray(meas)
    assert len(preds) >= 30
    ra = np.argsort(np.argsort(preds)).astype(float)
    rb = np.argsort(np.argsort(meas)).astype(float)
    ra -= ra.mean()
    rb -= rb.mean()
    rho = float((ra * rb).sum()
                / np.sqrt((ra * ra).sum() * (rb * rb).sum()))
    assert rho > 0.3, rho
    champ = int(np.argmin(meas))
    champ_rank = int(np.sum(preds < preds[champ]))
    assert champ_rank <= len(preds) // 4, (champ_rank, len(preds))


def test_autotune_model_guided_proposals_run(tmp_path):
    """cost_model=True path executes end-to-end on a tiny CPU search."""
    from feinsum_tpu.tuning import autotune

    e = f.einsum("ej,ij->ei", f.array("u", ("E", 16), "float32"),
                 f.array("D", (16, 16), "float32"))
    db = str(tmp_path / "t.sqlite")
    autotune(e, "mass_v0", db_path=db, device=f.FakeDevice("TPU v5 lite"),
             long_dim_length=512, test_limit=3, cost_model=True,
             timeit_kwargs=dict(min_rounds=1, min_seconds=0.01,
                                validation_long_dim_length=512))
    from feinsum_tpu import sql_utils
    assert sql_utils.query(e, f.FakeDevice("TPU v5 lite"), db_path=db,
                           err_if_no_results=False)

# }}}


def test_autotune_shards_partition_the_sweep(tmp_path):
    """SURVEY §5: the measurement sweep shards across chips as concurrent
    processes sharing one archive — proposals hash into disjoint buckets,
    both shards record into the same DB, and the union seeds later runs."""
    from feinsum_tpu import sql_utils
    from feinsum_tpu.tuning import autotune

    e = f.einsum("ej,ij->ei", f.array("u", ("E", 16), "float32"),
                 f.array("D", (16, 16), "float32"))
    db = str(tmp_path / "t.sqlite")
    kw = dict(db_path=db, device=f.FakeDevice("TPU v5 lite"),
              long_dim_length=512, test_limit=4, cost_model=False,
              timeit_kwargs=dict(min_rounds=1, min_seconds=0.01,
                                 validation_long_dim_length=512))
    autotune(e, "mass_v0", shard=(0, 2), seed=7, **kw)
    rows0 = sql_utils.query(e, f.FakeDevice("TPU v5 lite"), db_path=db,
                            err_if_no_results=False)
    autotune(e, "mass_v0", shard=(1, 2), seed=7, **kw)
    rows1 = sql_utils.query(e, f.FakeDevice("TPU v5 lite"), db_path=db,
                            err_if_no_results=False)
    assert len(rows1) > len(rows0) >= 1
    # every recorded config belongs to exactly the shard that measured it
    import zlib
    def bucket(params):
        return zlib.crc32(repr(tuple(sorted(params.items()))).encode()) % 2
    new0 = {tuple(sorted(q.transform_params)) for q in rows0}
    for q in rows0:
        assert bucket(dict(q.transform_params)) == 0
    for q in rows1:
        if tuple(sorted(q.transform_params)) not in new0:
            assert bucket(dict(q.transform_params)) == 1


def test_retire_is_nondestructive_and_restorable(tmp_path):
    """r4 incident: the over-reporter retire pass deleted two HONEST
    champion rows after contention-polluted re-timings.  Retire must move
    rows to the retired-facts stash, and restore_retired must bring them
    back byte-identical."""
    import sqlite3
    import subprocess
    import sys

    from feinsum_tpu import sql_utils

    db = str(tmp_path / "scratch.sqlite")
    e = f.einsum("ej,ij->ei", f.array("u", ("E", 8), "float32"),
                 f.array("D", (8, 8), "float32"))
    params = {"log2_block": 10}
    sql_utils.record_facts(e, transform_id="mass_v0.py",
                           transform_params=params, runtime_in_sec=1e-4,
                           device=f.FakeDevice("TPU v5 lite"), db_path=db,
                           long_dim_length=1024)
    conn = sqlite3.connect(db)
    before = conn.execute(
        f"SELECT * FROM {sql_utils.TIMINGS_TABLENAME}").fetchall()
    conn.close()
    assert len(before) == 1

    n = sql_utils.retire_rows_where("transform_id = ?", ["mass_v0.py"],
                                    reason="test", db_path=db)
    assert n == 1
    conn = sqlite3.connect(db)
    assert conn.execute(
        f"SELECT COUNT(*) FROM {sql_utils.TIMINGS_TABLENAME}"
        ).fetchone()[0] == 0
    stash = conn.execute(
        f"SELECT retire_reason FROM {sql_utils.RETIRED_TABLENAME}"
        ).fetchall()
    conn.close()
    assert stash == [("test",)]

    rc = subprocess.run(
        [sys.executable, "feinsum_tpu/data/bin/restore_retired.py",
         "--db", db, "--transform-id", "mass_v0.py"],
        capture_output=True, text=True)
    assert rc.returncode == 0, rc.stderr
    conn = sqlite3.connect(db)
    after = conn.execute(
        f"SELECT * FROM {sql_utils.TIMINGS_TABLENAME}").fetchall()
    n_stash = conn.execute(
        f"SELECT COUNT(*) FROM {sql_utils.RETIRED_TABLENAME}").fetchone()[0]
    conn.close()
    assert after == before
    assert n_stash == 0


def test_autotune_mosaic_reject_500_not_retried(tmp_path, monkeypatch):
    """An HTTP 500 whose body carries a Mosaic compiler diagnostic is a
    DETERMINISTIC rejection of that exact module (the relay forwards the
    full compiler error text — dd diag 2026-08-20), not a sick helper:
    the point must be scored inf immediately, with no 30 s retry sleeps
    and no deferral that would inflate the sick-streak accounting."""
    import feinsum_tpu.tuning as tuning

    db = str(tmp_path / "tune.sqlite")
    e = f.einsum("ej,ij->ei", f.array("u", ("E", 16), "float32"),
                 f.array("D", (16, 16), "float32"))
    from feinsum_tpu import measure
    real_timeit = measure.timeit
    calls = {"n": 0, "reject_calls": 0}

    def rejecting_timeit(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            calls["reject_calls"] += 1
            raise RuntimeError(
                "INTERNAL: remote_compile: HTTP 500: tpu_compile_helper"
                " subprocess exit code 1\n... AOT PJRT error: Mosaic"
                " failed to compile TPU kernel: failed to legalize"
                " operation 'func.return'")
        return real_timeit(*a, **k)

    slept = []
    monkeypatch.setattr("feinsum_tpu.measure.timeit", rejecting_timeit)
    monkeypatch.setattr(tuning.time, "sleep", lambda s: slept.append(s))
    autotune(e, "mass_v0", db_path=db, long_dim_length=512,
             test_limit=3, device=f.FakeDevice("TPU v5 lite"),
             cost_model=False,
             timeit_kwargs=dict(min_rounds=1, min_seconds=0.01,
                                validation_long_dim_length=512))
    # the rejected module was tried exactly once (no sick-helper retries)
    assert calls["reject_calls"] == 1
    assert not any(s >= 30 for s in slept), (
        f"Mosaic-rejected point slept {slept} — it burned sick-helper"
        " retries on a deterministic rejection")
    # other points still measured and recorded
    qs = sql_utils.query(e, f.FakeDevice("TPU v5 lite"),
                         db_path=db, err_if_no_results=False)
    assert len(qs) >= 1
