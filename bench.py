"""
Headline benchmark: the reference's archived einsum suite on real TPU.

Prints ONE JSON line:
  {"metric": ..., "value": <geomean % of TPU roofline across the suite>,
   "unit": "%roofline", "vs_baseline": <ours / reference's geomean roofline
   fraction on its own hardware (TITAN V, from BASELINE.md)>}

Per-kernel details go to stderr.  Schedules come from the shipped transform
archive when present, else from built-in best-known descriptors (tuned on
TPU v5e).
"""

from __future__ import annotations

import json
import math
import sys

import jax

jax.config.update("jax_compilation_cache_dir",
                  "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import feinsum_tpu as f  # noqa: E402
from feinsum_tpu import sql_utils  # noqa: E402
from feinsum_tpu.data.device_info import get_device_key  # noqa: E402
from feinsum_tpu.diagnostics import NoFactInDatabaseError  # noqa: E402
from feinsum_tpu.ops.layouts import dofmajor_layouts  # noqa: E402
from feinsum_tpu.measure import (  # noqa: E402
    _apply_layouts,
    evaluate_giga_op_map,
    generate_input_arrays,
    get_giga_op_map,
    get_roofline_flop_rate,
    timeit_on_device,
)

E_BENCH = 1_000_000   # streaming regime: working sets >> VMEM


def log(*args):
    print(*args, file=sys.stderr, flush=True)


# {{{ the suite (shapes = the reference's headline rows, BASELINE.md)

def suite():
    ndof = 35
    div = f.batched_einsum(
        "es,sij,ej->ei",
        [[f.array(jn, ("E", 3), "float32"),
          f.array("R", (3, ndof, ndof), "float32"),
          f.array(un, ("E", ndof), "float32")]
         for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])
    grad = f.einsum("xre,rij,ej->xei",
                    f.array("J", (3, 3, "E"), "float32"),
                    f.array("D", (3, ndof, ndof), "float32"),
                    f.array("u", ("E", ndof), "float32"))
    face = f.einsum("ifj,fe,fej->ei",
                    f.array("L", (ndof, 4, 15), "float32"),
                    f.array("Fj", (4, "E"), "float32"),
                    f.array("flux", (4, "E", 15), "float32"))
    mass = f.einsum("e,ij,ej->ei",
                    f.array("jac", ("E",), "float32"),
                    f.array("M", (ndof, ndof), "float32"),
                    f.array("u", ("E", ndof), "float32"))
    matvec = f.einsum("ej,ij->ei",
                      f.array("u", ("E", 20), "float32"),
                      f.array("D", (20, 20), "float32"))
    copy2 = f.einsum("ij,ij->ij",
                     f.array("A", ("E", ndof), "float32"),
                     f.array("B", ("E", ndof), "float32"))
    # reference best GOp/s on TITAN V (fp64), BASELINE.md rows
    return [
        ("dg_div_ndof35", div, 1945.6, "dg_div_v0"),
        ("dg_grad_ndof35", grad, 2002.4, "dg_grad_v0"),
        ("dg_face_mass", face, 2186.0, "face_mass_v0"),
        ("dg_mass_ndof35", mass, 1393.7, "mass_v0"),
        ("matvec_ndof20", matvec, 974.3, "mass_v0"),
        ("copy_ndof35", copy2, 24.6, "elementwise_v0"),
    ]

# }}}


# {{{ built-in best-known schedules (tuned on TPU v5e; see scripts/tpu_sweep*)

def default_transform(kind):
    def tr(program):
        e = program.einsum
        layouts, out_perm = dofmajor_layouts(e)
        p = f.generate_program_with_opt_einsum_schedule(e)
        return p.with_descriptor(
            backend="pallas", block_long=8192,
            dimension_semantics="parallel",
            arg_layouts=layouts,
            out_layout=out_perm)
    return tr

# }}}


def geomean(xs):
    xs = [x for x in xs if x > 0]
    return math.exp(sum(math.log(x) for x in xs) / len(xs)) if xs else 0.0


def main() -> None:
    device_key = get_device_key()
    log(f"benchmarking on {device_key}, E={E_BENCH}")

    ours, refs = [], []
    for name, einsum, ref_gops, impl in suite():
        # schedule: archive first, then built-in defaults
        transform = None
        try:
            transform = sql_utils.retrieve(einsum)
        except (NoFactInDatabaseError, Exception):
            transform = None
        if transform is None:
            transform = default_transform("dofmajor")
        try:
            f.validate_batched_einsum_transform(
                einsum, transform, long_dim_length=2000)
            program = transform(f.generate_program(einsum))
            arrays = _apply_layouts(
                program,
                generate_input_arrays(einsum, long_dim_length=E_BENCH))
            fn = f.build_executable(program, long_dim_length=E_BENCH)
            dt = timeit_on_device(fn, arrays)
        except Exception as ex:  # noqa: BLE001
            log(f"{name}: FAILED {type(ex).__name__}: {str(ex)[:200]}")
            continue
        gops = sum(evaluate_giga_op_map(
            get_giga_op_map(einsum), E_BENCH).values())
        rate = gops / dt
        roof = get_roofline_flop_rate(einsum, device_key,
                                      long_dim_length=E_BENCH,
                                      ignore_unknown_device=True)
        frac = rate / roof if roof else 0.0
        ours.append(frac)

        # the reference's fraction-of-roofline on its own hardware (fp64)
        ref_einsum = einsum.copy(args=tuple(
            tuple(a.copy(dtype="float64") for a in row)
            for row in einsum.args))
        ref_roof = get_roofline_flop_rate(
            ref_einsum, "NVIDIA TITAN V", long_dim_length=100_000)
        ref_frac = ref_gops / ref_roof
        refs.append(ref_frac)
        log(f"{name}: {rate:8.0f} GOp/s = {100*frac:5.1f}% of TPU roofline"
            f" | reference: {ref_gops:7.1f} GOp/s = {100*ref_frac:5.1f}% of"
            f" TITAN V roofline")

    value = 100.0 * geomean(ours)
    vs_baseline = (geomean(ours) / geomean(refs)) if refs else 0.0
    print(json.dumps({
        "metric": "Batched-einsum geomean % of TPU roofline"
                  " (reference archive suite, fp32, E=1M)",
        "value": round(value, 2),
        "unit": "%roofline",
        "vs_baseline": round(vs_baseline, 3),
    }))


if __name__ == "__main__":
    main()
