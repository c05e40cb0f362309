"""Round-4 decision probe (CLAUDE.md "div/grad-family lane_pack"): what
does the in-VMEM lane reshape (B, g*d) -> (B, g, d) cost on this Mosaic?

The matvec/vecmat lane_pack packs g elements into the dof axis and needs
no per-element streamed factor.  div/grad also stream J[e,s]: applying J
to the packed dot result t (B, g*d) needs t viewed as (B, g, d) to
broadcast J (B, g) over d — option (a) of the round-4 design note.  If
the reshape+broadcast costs ~nothing at small d, implement the rewrite;
if it relayouts (like the measured HBM 2D->1D retile trap), fall back to
option (b)/(c) or drop the idea.

Kernels (f32, E = 2^20 long elements, streamed working set >> VMEM):
  A  stream x (E/g, g*d), out = 2*x               -- pure streaming floor
  B  + j (E/g, g): out = (x.rs(B,g,d) * j[:,:,None]).rs(B,g*d)
                                                   -- reshape + broadcast
  C  + dot first: t = x @ K (raw resident block), then B's J-apply
  D  dot only: out = x @ K                         -- isolates C's delta
B-A = reshape/broadcast cost from a RAW block; C-D = the same on a
COMPUTED operand (Mosaic's computed-resident trap was 5x; does a computed
reshape source hurt too?).

Run on the TPU (one process at a time!):  python scripts/tpu_lane_reshape_probe.py
"""

import sys

import jax

# --interpret: CPU correctness smoke (tiny E, grid=1 — interpret-mode
# compile time explodes at grid >= 2, CLAUDE.md CPU gotcha)
INTERP = "--interpret" in sys.argv
if INTERP:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402

from feinsum_tpu.measure import timeit_on_device  # noqa: E402

E = 1 << 12 if INTERP else 1 << 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def run_case(name, kernel, in_specs, out_shape, arrays, blk_rows, n_rows,
             want=None):
    grid = (n_rows // blk_rows,)
    fn_p = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((blk_rows, out_shape[1]), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
        interpret=INTERP,
    )

    def fn(d):
        return fn_p(*[d[k] for k in sorted(d)])

    try:
        out = np.asarray(jax.jit(fn)(arrays))
        if want is not None:
            err = float(np.abs(out - want).max() / max(np.abs(want).max(),
                                                       1e-30))
            assert err < 2e-5, f"{name}: rel err {err}"
        if INTERP:
            log(f"  {name}: correctness OK (interpret)")
            return None
        dt = timeit_on_device(jax.jit(fn), arrays)
        return dt
    except Exception as ex:  # noqa: BLE001
        log(f"  {name}: FAILED {type(ex).__name__}: {str(ex)[:140]}")
        return None


def probe(d, g, blk_rows=1024):
    gd = g * d
    B = E // g             # packed rows
    blk_rows = B if INTERP else min(blk_rows, B)
    log(f"--- d={d} g={g} (packed width {gd} lanes, {B} rows,"
        f" blk {blk_rows}) ---")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((B, gd)).astype(np.float32)
    j = rng.standard_normal((B, g)).astype(np.float32)
    K = rng.standard_normal((gd, gd)).astype(np.float32)
    bytes_a = (2 * x.nbytes) / 1e9
    bytes_b = (2 * x.nbytes + j.nbytes) / 1e9

    def kA(x_ref, o_ref):
        o_ref[...] = 2.0 * x_ref[...]

    def kB(j_ref, x_ref, o_ref):
        b = x_ref.shape[0]
        t = x_ref[...].reshape(b, g, d) * j_ref[...][:, :, None]
        o_ref[...] = t.reshape(b, gd)

    def kC(K_ref, j_ref, x_ref, o_ref):
        b = x_ref.shape[0]
        t = jax.lax.dot_general(
            x_ref[...], K_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        t = t.reshape(b, g, d) * j_ref[...][:, :, None]
        o_ref[...] = t.reshape(b, gd)

    def kD(K_ref, x_ref, o_ref):
        o_ref[...] = jax.lax.dot_general(
            x_ref[...], K_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    sx = pl.BlockSpec((blk_rows, gd), lambda i: (i, 0))
    sj = pl.BlockSpec((blk_rows, g), lambda i: (i, 0))
    sK = pl.BlockSpec((gd, gd), lambda i: (0, 0))

    wantA = 2.0 * x
    wantB = (x.reshape(B, g, d) * j[:, :, None]).reshape(B, gd)
    tC = x @ K
    wantC = (tC.reshape(B, g, d) * j[:, :, None]).reshape(B, gd)

    res = {}
    res["A"] = run_case("A copy", kA, [sx], (B, gd), {"x": x}, blk_rows, B,
                        wantA)
    res["B"] = run_case("B reshape+j", kB, [sj, sx], (B, gd),
                        {"j": j, "x": x}, blk_rows, B, wantB)
    res["C"] = run_case("C dot+reshape+j", kC, [sK, sj, sx], (B, gd),
                        {"K": K, "j": j, "x": x}, blk_rows, B, wantC)
    res["D"] = run_case("D dot only", kD, [sK, sx], (B, gd),
                        {"K": K, "x": x}, blk_rows, B, tC)
    for k in "ABCD":
        if res[k] is not None:
            gb = bytes_b if k in "BC" else bytes_a
            log(f"  {k}: {1e6*res[k]:8.1f} us = {gb/res[k]:6.0f} GB/s")
    if res["A"] and res["B"]:
        log(f"  reshape+broadcast tax (B-A): {1e6*(res['B']-res['A']):+8.1f}"
            f" us ({100*(res['B']-res['A'])/res['A']:+.1f}%)")
    if res["C"] and res["D"]:
        log(f"  tax on computed operand (C-D): "
            f"{1e6*(res['C']-res['D']):+8.1f} us"
            f" ({100*(res['C']-res['D'])/res['D']:+.1f}%)")
    return res


def main():
    log(f"devices: {jax.devices()}")
    # d = the small-ndof P1/P2/P3 sizes; g chosen so g*d is a 128-lane
    # multiple where possible (Mosaic ops on non-128-multiple lane dims
    # are a crash class) plus two deliberately unaligned cases (560, 32
    # lanes) to map the cliff
    for d, g in ((4, 32), (10, 64), (20, 32), (35, 16), (4, 8)):
        try:
            probe(d, g)
        except Exception as ex:  # noqa: BLE001
            log(f"case d={d} g={g} blew up: {type(ex).__name__}:"
                f" {str(ex)[:140]}")


if __name__ == "__main__":
    main()
