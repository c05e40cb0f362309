"""Schedules, flop counting, codegen (XLA backend), and measurement —
modeled on the reference's test_codegen.py/test_measure.py coverage, with the
exact-flop assertions from test_loopy_utils.py:267-271."""

import numpy as np
import pytest

import feinsum_tpu as f
from feinsum_tpu.measure import (
    evaluate_giga_op_map,
    generate_input_arrays,
    get_giga_op_map,
)


def dg_grad(ndim=3, ndof=35, dtype="float64"):
    return f.einsum("xre,rij,ej->xei",
                    f.array("J", (ndim, ndim, "E"), dtype),
                    f.array("D", (ndim, ndof, ndof), dtype),
                    f.array("u", ("E", ndof), dtype))


def test_trivial_schedule():
    e = dg_grad()
    s = f.get_trivial_contraction_schedule(e)
    assert s.nsteps == 1
    assert s.result_names == ("_fe_out",)
    assert s.subscripts == ("xre,rij,ej->xei",)


def test_opt_einsum_schedule_reduces_flops():
    e = dg_grad()
    trivial = get_giga_op_map(e, f.get_trivial_contraction_schedule(e))
    opt = get_giga_op_map(e)  # defaults to opt_einsum schedule
    n = 1  # per-element comparison: evaluate at E=1
    t = sum(evaluate_giga_op_map(trivial, n).values()) * 1e9
    o = sum(evaluate_giga_op_map(opt, n).values()) * 1e9
    # reference asserts 33075 -> 7980 per element (4.14x cut)
    assert t == pytest.approx(33075)
    assert o == pytest.approx(7980)


def test_flop_poly_is_symbolic_in_E():
    e = dg_grad()
    gmap = get_giga_op_map(e, f.get_trivial_contraction_schedule(e))
    val = evaluate_giga_op_map(gmap, 1000)
    assert sum(val.values()) * 1e9 == pytest.approx(33075 * 1000)


def test_xla_backend_matches_numpy_trivial_and_opt():
    e = dg_grad(ndof=10)
    f.validate_batched_einsum_transform(e, None, long_dim_length=50)
    f.validate_batched_einsum_transform(
        e, lambda p: f.generate_program_with_opt_einsum_schedule(p.einsum),
        long_dim_length=50)


def test_xla_backend_batched_rows():
    e = f.batched_einsum(
        "es,sij,ej->ei",
        [[f.array("Jx", ("E", 3)), f.array("R", (3, 20, 20)),
          f.array("ux", ("E", 20))],
         [f.array("Jy", ("E", 3)), f.array("R", (3, 20, 20)),
          f.array("uy", ("E", 20))]])
    f.validate_batched_einsum_transform(e, None, long_dim_length=40)


def test_validation_catches_wrong_transform():
    e = dg_grad(ndof=5)

    def bad_transform(p):
        # compute a *different* einsum: drop the Jacobian factor
        wrong = f.einsum("rij,ej->rei",
                         f.array("D", (3, 5, 5)), f.array("u", ("E", 5)))
        return f.generate_program(wrong)

    with pytest.raises(Exception):
        f.validate_batched_einsum_transform(e, bad_transform,
                                            long_dim_length=30)


def test_mixed_dtype_promotion():
    e = f.einsum("ij,jk->ik",
                 f.array("A", (8, 8), "float32"),
                 f.array("B", (8, 8), "float64"))
    f.validate_batched_einsum_transform(e, None, long_dim_length=8)
    gmap = get_giga_op_map(e, f.get_trivial_contraction_schedule(e))
    assert set(gmap) == {"float64"}


def test_timeit_smoke():
    e = dg_grad(ndof=10, dtype="float32")
    t = f.timeit(e, long_dim_length=500, min_rounds=5, min_seconds=0.05)
    assert 0 < t < 5.0


def test_measure_giga_op_rate_smoke():
    e = dg_grad(ndof=10, dtype="float32")
    rates = f.measure_giga_op_rate(e, long_dim_length=500, min_rounds=5,
                                   min_seconds=0.05)
    assert rates["total"] > 0


def test_roofline():
    e = dg_grad(ndof=35)
    r = f.get_roofline_flop_rate(e, "NVIDIA TITAN V")
    assert r is not None and 0 < r <= 6144.0
    assert f.get_roofline_flop_rate(e, "bogus device",
                                    ignore_unknown_device=True) is None
    with pytest.raises(f.NoDevicePeaksInfoError):
        f.get_roofline_flop_rate(e, "bogus device")


def test_stringify_comparison_smoke():
    e = dg_grad(ndof=10, dtype="float32")
    s = f.stringify_comparison_vs_roofline(
        e, long_dim_length=500, min_rounds=5, min_seconds=0.05,
        ignore_unknown_device=True)
    assert "measured" in s


def test_stringify_comparison_accepts_device_object():
    # the reference passes a cl_device object; ours accepts anything with a
    # .name (e.g. FakeDevice) via the `device` kwarg
    e = dg_grad(ndof=10, dtype="float32")
    s = f.stringify_comparison_vs_roofline(
        e, device=f.FakeDevice("TPU v5 lite"),
        long_dim_length=500, min_rounds=5, min_seconds=0.05)
    assert "% roofline" in s and "unknown" not in s


def test_complex_dtypes_validate_end_to_end():
    # reference measure.py:63-108 generates complex inputs and weights
    # complex ops (mul=6, add=2); our XLA backend executes complex einsums
    for dt in ("complex64", "complex128"):
        e = f.einsum("ej,ij->ei", f.array("u", ("E", 8), dt),
                     f.array("D", (8, 8), dt))
        f.validate_batched_einsum_transform(e, None, long_dim_length=512)
        gmap = f.get_giga_op_map(e)
        assert set(gmap) == {dt}


def test_footprint():
    e = f.einsum("ej,ij->ei", f.array("u", ("E", 10), "float64"),
                 f.array("D", (10, 10), "float64"))
    gb = f.get_footprint_gbytes(e, long_dim_length=1000)
    expected = (1000 * 10 * 8 + 10 * 10 * 8 + 1000 * 10 * 8) * 1e-9
    assert gb == pytest.approx(expected)


def test_input_arrays_respect_dtype():
    e = f.einsum("ij,jk->ik",
                 f.array("A", (4, 5), "complex64"),
                 f.array("B", (5, 6), "int32"))
    arrs = generate_input_arrays(e, long_dim_length=10, as_numpy=True)
    assert arrs["A"].dtype == np.complex64
    assert arrs["B"].dtype == np.int32


def test_timeit_on_device_policy(monkeypatch):
    """The span-primary physics-clamped policy (scripts/
    tpu_timing_integrity_probe.py evidence): trace is authoritative unless
    it falls below the bandwidth floor; wall-diff survives only >=100 ms
    or when no trace exists; everything is clamped by the floor."""
    from feinsum_tpu import measure

    def fake(wall, trace, floor):
        monkeypatch.setattr(measure, "_timeit_wall_diff",
                            lambda fn, arrays: wall)
        monkeypatch.setattr(measure, "_timeit_device_trace",
                            lambda fn, arrays, **kw: trace)
        monkeypatch.setattr(measure, "_bytes_floor_seconds",
                            lambda fn, arrays: floor)
        monkeypatch.setattr(measure, "_timeit_in_graph",
                            lambda fn, arrays: 99.0)
        return measure.timeit_on_device(None, {})

    # >=100 ms: wall-diff kept (trace would cost minutes)
    assert fake(0.5, None, None) == 0.5
    # trace authoritative over a disagreeing wall (both directions)
    assert fake(28e-6, 219e-6, 171e-6) == 219e-6     # drainage under-report
    assert fake(282e-6, 172e-6, 141e-6) == 172e-6    # enqueue over-report
    # plain-HLO span below the physics floor: floor (or the larger wall)
    assert fake(121e-6, 39e-6, 140e-6) == 140e-6
    assert fake(200e-6, 39e-6, 140e-6) == 200e-6
    # no trace: wall clamped by floor; no wall+no trace: in-graph fallback
    assert fake(100e-6, None, 140e-6) == 140e-6
    assert fake(None, None, 1e-6) == 99.0


def test_write_gbytes_and_write_ceiling_roofline():
    """get_write_gbytes counts output bytes only; the v5e roofline applies
    the measured write-drain ceiling (652 GB/s < the 819 GB/s bus peak) to
    write-dominated kernels — an expansion einsum's roofline must be set
    by writes/652, not bytes/819."""
    from feinsum_tpu.measure import (
        get_footprint_gbytes,
        get_roofline_flop_rate,
        get_write_gbytes,
    )

    # expansion: tiny inputs, big output
    e = f.einsum("i,j,k->ijk",
                 f.array("a", (64,), "float32"),
                 f.array("b", (64,), "float32"),
                 f.array("c", (64,), "float32"))
    w = get_write_gbytes(e, long_dim_length=100)
    total = get_footprint_gbytes(e, long_dim_length=100)
    assert abs(w - 64 ** 3 * 4e-9) < 1e-12
    assert abs(total - (w + 3 * 64 * 4e-9)) < 1e-12
    from feinsum_tpu.measure import evaluate_giga_op_map, get_giga_op_map
    gops = sum(evaluate_giga_op_map(get_giga_op_map(e), 100).values())
    # the write term dominates on v5e: roofline == gops / (writes / 652)
    roof = get_roofline_flop_rate(e, "TPU v5 lite", long_dim_length=100)
    assert abs(roof - gops / (w / 652.0)) < 1e-6 * roof
    # a device without a measured write ceiling keeps the plain bus model
    roof_v4 = get_roofline_flop_rate(e, "TPU v4", long_dim_length=100)
    assert abs(roof_v4 - gops / (total / 1228.0)) < 1e-6 * roof_v4


def test_profile_program_smoke():
    """profile_program returns per-op spans (or an explanatory None) on the
    CPU backend without raising."""
    from feinsum_tpu.measure import profile_program

    e = f.einsum("ej,ij->ei", f.array("u", ("E", 8), "float32"),
                 f.array("D", (8, 8), "float32"))
    prog = f.generate_program(e)
    try:
        out = profile_program(prog, long_dim_length=256)
    except Exception as ex:  # noqa: BLE001 — must not raise blindly
        raise AssertionError(f"profile_program raised {type(ex).__name__}")
    assert out is None or out


def test_short_span_retraces_and_keeps_larger(monkeypatch):
    """Sub-500 us spans re-trace with a 200-launch train and keep the larger
    median (spans are real occupancy: larger = honest) — the tccg_05
    run-to-run drift fix."""
    from feinsum_tpu import measure

    calls = []

    def trace(fn, arrays, n_iters=30, **kw):
        calls.append(n_iters)
        return 150e-6 if n_iters == 30 else 260e-6

    monkeypatch.setattr(measure, "_timeit_wall_diff",
                        lambda fn, arrays: None)
    monkeypatch.setattr(measure, "_timeit_device_trace", trace)
    monkeypatch.setattr(measure, "_bytes_floor_seconds",
                        lambda fn, arrays: 100e-6)
    assert measure.timeit_on_device(None, {}) == 260e-6
    assert calls == [30, 200]


# {{{ timing-protocol selection (VERDICT r3 #8): the three-heuristic stack
# in timeit_on_device must keep choosing the right primary per regime

class _ProtocolProbe:
    """Monkeypatch harness: synthetic wall/floor/trace/in-graph values,
    recording which helpers ran (and the re-trace n_iters)."""

    def __init__(self, monkeypatch, *, wall=None, floor=None,
                 trace=None, retrace=None, in_graph=None):
        from feinsum_tpu import measure
        self.calls = []

        def fake_wall(fn, arrays, **kw):
            self.calls.append("wall")
            return wall

        def fake_floor(fn, arrays):
            self.calls.append("floor")
            return floor

        def fake_trace(fn, arrays, **kw):
            if kw.get("n_iters") == 200:
                self.calls.append("retrace")
                return retrace
            self.calls.append("trace")
            return trace

        def fake_in_graph(fn, arrays, **kw):
            self.calls.append("in_graph")
            return in_graph

        monkeypatch.setattr(measure, "_timeit_wall_diff", fake_wall)
        monkeypatch.setattr(measure, "_bytes_floor_seconds", fake_floor)
        monkeypatch.setattr(measure, "_timeit_device_trace", fake_trace)
        monkeypatch.setattr(measure, "_timeit_in_graph", fake_in_graph)


def _ton():
    from feinsum_tpu.measure import timeit_on_device
    return timeit_on_device(lambda a: a, {})


def test_protocol_wall_diff_wins_above_100ms(monkeypatch):
    p = _ProtocolProbe(monkeypatch, wall=0.2, floor=0.05, trace=0.15)
    assert _ton() == 0.2
    assert "trace" not in p.calls  # trace costs minutes at >=100 ms spans


def test_protocol_span_is_primary_below_100ms(monkeypatch):
    p = _ProtocolProbe(monkeypatch, wall=0.001, floor=0.0005, trace=0.002)
    assert _ton() == 0.002
    assert "retrace" not in p.calls  # 2 ms span is stable: no re-trace


def test_protocol_floor_clamps_underreporting_span(monkeypatch):
    # plain-HLO module span excluding async DMA: the floor is authoritative
    p = _ProtocolProbe(monkeypatch, wall=None, floor=0.001, trace=0.0006)
    assert _ton() == 0.001
    assert "trace" in p.calls


def test_protocol_sub_500us_retrace_keeps_larger_median(monkeypatch):
    p = _ProtocolProbe(monkeypatch, wall=None, floor=0.0001,
                       trace=0.0003, retrace=0.0004)
    assert _ton() == 0.0004
    assert "retrace" in p.calls


def test_protocol_no_trace_falls_back_to_floored_wall(monkeypatch):
    p = _ProtocolProbe(monkeypatch, wall=0.01, floor=0.02, trace=None,
                       retrace=None)
    assert _ton() == 0.02
    assert "trace" in p.calls


def test_protocol_in_graph_is_last_resort(monkeypatch):
    p = _ProtocolProbe(monkeypatch, wall=None, floor=0.001, trace=None,
                       retrace=None, in_graph=0.005)
    assert _ton() == 0.005
    assert "in_graph" in p.calls

# }}}


def test_timeit_on_device_reports_clamp_info(monkeypatch):
    """timeit_on_device's info channel: when the device-trace span under-
    runs the physics floor (plain-HLO async-DMA under-report), the floor
    is returned AND info['clamped'] is set — consumers (bench's TCCG
    section) use it to prefer a DMA-inclusive-span candidate."""
    from feinsum_tpu import measure

    monkeypatch.setattr(measure, "_timeit_wall_diff", lambda fn, a: None)
    monkeypatch.setattr(measure, "_timeit_device_trace",
                        lambda fn, a, n_iters=30: 1e-5)
    monkeypatch.setattr(measure, "_bytes_floor_seconds",
                        lambda fn, a: 5e-5)
    info = {}
    dt = measure.timeit_on_device(lambda a: None, {}, info=info)
    assert np.isclose(dt, 5e-5)
    assert info["clamped"] is True
    assert np.isclose(info["floor"], 5e-5)

    # span above the floor: no clamp
    monkeypatch.setattr(measure, "_timeit_device_trace",
                        lambda fn, a, n_iters=30: 9e-5)
    info = {}
    dt = measure.timeit_on_device(lambda a: None, {}, info=info)
    assert np.isclose(dt, 9e-5)
    assert info["clamped"] is False
