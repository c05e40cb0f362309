"""Measured per-class practical ceilings for the sub-80% small-ndof rows
(VERDICT r4 next #5: 'find the schedule or produce a per-class measured
ceiling argument as rigorous as matvec's').

For each class this times a STREAM-ONLY surrogate: an einsum with byte-for
-byte the same streamed operands and output but the contraction replaced
by a VPU reduction (no MXU dots, no resident operand) — the same fold
kernel knobs as the class champion.  The surrogate's achieved fraction of
the physics floor IS the class's no-MXU ceiling; the champion's gap to it
prices the MXU/DMA interleave + per-block overhead at that ndof.

Usage: python scripts/tpu_smallndof_ceiling.py [grad4 grad10 div4 ...]
Writes /tmp/smallndof_ceiling.json; one TPU process rule applies.
"""
import json
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import feinsum_tpu as f  # noqa: E402
from feinsum_tpu.tuning.impls._common import fused_pallas_program  # noqa: E402

E = 1_000_000


def surrogate_grad(ndof):
    # same traffic as grad<ndof> (J 36E + u 4*ndof E + out 12*ndof E bytes):
    # out[x,e,i] = sum_r J[x,r,e] * u[e,i] — broadcast product + r-sum, VPU
    return f.einsum("xre,ei->xei",
                    f.array("J", (3, 3, "E"), "float32"),
                    f.array("u", ("E", ndof), "float32"))


def surrogate_div(ndof):
    # same traffic as one div row (J 12E + u 4*ndof E + out 4*ndof E), b=3
    return f.batched_einsum(
        "es,ei->ei",
        [[f.array(jn, ("E", 3), "float32"),
          f.array(un, ("E", ndof), "float32")]
         for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])


SURROGATES = {
    "grad4": surrogate_grad(4),
    "grad10": surrogate_grad(10),
    "grad20": surrogate_grad(20),
    "div4": surrogate_div(4),
    "div10": surrogate_div(10),
}

BLOCKS = {  # (block_long, fold) candidates per class — champion-adjacent
    "default": [(2 ** 14, True), (2 ** 15, True), (1024 * 20, True)],
}


def measure(cls):
    e = SURROGATES[cls]
    best = None
    for blk, fold in BLOCKS["default"]:
        def tr(program, blk=blk, fold=fold):
            return fused_pallas_program(
                program, block_long=blk, hoist=False, dofmajor=True,
                fold=fold, precision_3x=False)
        try:
            t = f.timeit(e, transform=tr, long_dim_length=E)
        except Exception as exc:           # noqa: BLE001
            print(f"  {cls} blk={blk}: {type(exc).__name__}: "
                  f"{str(exc)[:200]}", flush=True)
            continue
        gb = f.get_footprint_gbytes(e, long_dim_length=E)
        rate = gb / t
        print(f"  {cls} blk={blk}: {t*1e6:.0f} us = {rate:.0f} GB/s "
              f"= {100*rate/819:.1f}% of bus", flush=True)
        if best is None or t < best[0]:
            best = (t, blk, rate)
    return best


def main():
    classes = sys.argv[1:] or ["grad4", "grad10", "div4"]
    out = {}
    for cls in classes:
        print(f"=== {cls} stream-only surrogate", flush=True)
        got = measure(cls)
        if got:
            t, blk, rate = got
            out[cls] = {"stream_only_us": t * 1e6, "block": blk,
                        "gbps": rate, "pct_bus": 100 * rate / 819,
                        "ts": time.strftime("%F %T")}
    with open("/tmp/smallndof_ceiling.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
