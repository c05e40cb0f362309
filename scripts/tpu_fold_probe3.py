"""Fold-8 strategy I (boundary reshapes) under production precision.

Production MXU steps run Precision.HIGHEST (6-pass bf16, splitting inside the
MXU pipeline, no VPU split cost) — manual bf16_3x showed heavy VPU cost on
streamed operands (probe2).  Compare, at HIGHEST:

  base: today's dof-major matvec/div          (the production layout)
  fold: (nd, 8, C) blocks, in-kernel merge to (nd, 8*blk), same dots,
        un-merge before store.

Also the Kronecker variant for matvec at HIGHEST (K=160/280 inflated dot).
"""
import functools
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = 1 << 20
C = E // 8
HI = jax.lax.Precision.HIGHEST

CP = functools.partial(pltpu.CompilerParams,
                       dimension_semantics=("parallel",),
                       vmem_limit_bytes=100 * 1024 * 1024)


def timeit_fn(fn, *arrays):
    @jax.jit
    def run(args, k):
        def body(_, carry):
            args, acc = carry
            out = fn(*args)
            probe = out.ravel()[0].astype(jnp.float32)
            acc = acc * 0.5 + probe
            eps = (acc * jnp.asarray(1e-45, jnp.float32)).astype(
                args[0].dtype)
            a0 = args[0].at[(0,) * args[0].ndim].add(eps)
            return (a0,) + tuple(args[1:]), acc
        args, acc = jax.lax.fori_loop(0, k, body, (args, jnp.float32(0)))
        return acc + fn(*args).ravel()[0].astype(jnp.float32)

    def timed(k, reps=3):
        vals = []
        for _ in range(reps):
            t0 = time.perf_counter()
            _ = float(run(arrays, k))
            vals.append(time.perf_counter() - t0)
        return sorted(vals)[len(vals) // 2]

    _ = float(run(arrays, 1))
    t1 = timed(8)
    k2 = 64
    while k2 < 100_000:
        t2 = timed(k2, reps=1)
        if t2 - t1 > 0.6:
            break
        per = max((t2 - t1) / (k2 - 8), 1e-7)
        k2 = min(100_000, max(2 * k2, 8 + int(0.6 / per)))
    t2 = timed(k2)
    return max((t2 - t1) / (k2 - 8), 1e-9)


def bench(label, fn, arrays, gb):
    try:
        dt = timeit_fn(fn, *arrays)
        print(f"{label}: {gb/dt:5.0f} GB/s ({dt*1e6:7.1f} us)", flush=True)
    except Exception as ex:
        print(f"{label}: FAILED {str(ex)[:150]}", flush=True)


def dot(a, b, dims):
    return jax.lax.dot_general(a, b, dims, precision=HI,
                               preferred_element_type=jnp.float32)


DIMS = (((1,), (0,)), ((), ()))


# ---- matvec (ndof=20, the weak suite kernel) + ndof=35
for ND in (20, 35):
    D = jnp.ones((ND, ND), jnp.float32)
    u2 = jnp.ones((ND, E), jnp.float32)
    u3 = jnp.ones((ND, 8, C), jnp.float32)
    GBm = (E * ND * 2 * 4) / 1e9
    blk = 32768
    blkC = blk // 8

    base = pl.pallas_call(
        lambda d, u, o: o.__setitem__((...,), dot(d[...], u[...], DIMS)),
        grid=(E // blk,),
        in_specs=[pl.BlockSpec((ND, ND), lambda g: (0, 0)),
                  pl.BlockSpec((ND, blk), lambda g: (0, g))],
        out_specs=pl.BlockSpec((ND, blk), lambda g: (0, g)),
        out_shape=jax.ShapeDtypeStruct((ND, E), jnp.float32),
        compiler_params=CP())
    bench(f"mv{ND} base HIGHEST   ", base, (D, u2), GBm)

    def foldk(d_ref, u_ref, o_ref, ND=ND, blkC=blkC):
        um = u_ref[...].reshape(ND, 8 * blkC)
        o_ref[...] = dot(d_ref[...], um, DIMS).reshape(ND, 8, blkC)

    fold = pl.pallas_call(
        foldk, grid=(C // blkC,),
        in_specs=[pl.BlockSpec((ND, ND), lambda g: (0, 0)),
                  pl.BlockSpec((ND, 8, blkC), lambda g: (0, 0, g))],
        out_specs=pl.BlockSpec((ND, 8, blkC), lambda g: (0, 0, g)),
        out_shape=jax.ShapeDtypeStruct((ND, 8, C), jnp.float32),
        compiler_params=CP())
    bench(f"mv{ND} fold-I HIGHEST ", fold, (D, u3), GBm)

    def kronk(dp_ref, u_ref, o_ref, ND=ND, blkC=blkC):
        um = u_ref[...].reshape(ND * 8, blkC)
        o_ref[...] = dot(dp_ref[...], um, DIMS).reshape(ND, 8, blkC)

    kron = pl.pallas_call(
        kronk, grid=(C // blkC,),
        in_specs=[pl.BlockSpec((ND * 8, ND * 8), lambda g: (0, 0)),
                  pl.BlockSpec((ND, 8, blkC), lambda g: (0, 0, g))],
        out_specs=pl.BlockSpec((ND, 8, blkC), lambda g: (0, 0, g)),
        out_shape=jax.ShapeDtypeStruct((ND, 8, C), jnp.float32),
        compiler_params=CP())

    def kron_fn(D, u3, call=kron, ND=ND):
        eye = jnp.eye(8, dtype=D.dtype)
        Dp = jnp.einsum("ij,st->isjt", D, eye).reshape(ND * 8, ND * 8)
        return call(Dp, u3)
    bench(f"mv{ND} kron HIGHEST   ", kron_fn, (D, u3), GBm)


# ---- div (hoisted 2-step: 3 dots K=35 + 3 VPU FMAs), ndof=35
ND = 35
R = jnp.ones((3, ND, ND), jnp.float32)
GBd = (E * (ND + 3 + ND) * 4) / 1e9
blk = 16384
blkC = blk // 8

u2 = jnp.ones((ND, E), jnp.float32)
J2 = jnp.ones((3, E), jnp.float32)


def div_base(r_ref, j_ref, u_ref, o_ref):
    u = u_ref[...]
    acc = None
    for s in range(3):
        t = dot(r_ref[s], u, DIMS)
        t = t * j_ref[s, :][None, :]
        acc = t if acc is None else acc + t
    o_ref[...] = acc


base = pl.pallas_call(
    div_base, grid=(E // blk,),
    in_specs=[pl.BlockSpec((3, ND, ND), lambda g: (0, 0, 0)),
              pl.BlockSpec((3, blk), lambda g: (0, g)),
              pl.BlockSpec((ND, blk), lambda g: (0, g))],
    out_specs=pl.BlockSpec((ND, blk), lambda g: (0, g)),
    out_shape=jax.ShapeDtypeStruct((ND, E), jnp.float32),
    compiler_params=CP())
bench("div base HIGHEST   ", base, (R, J2, u2), GBd)

u3 = jnp.ones((ND, 8, C), jnp.float32)
J3 = jnp.ones((3, 8, C), jnp.float32)


def div_fold(r_ref, j_ref, u_ref, o_ref):
    u = u_ref[...].reshape(ND, 8 * blkC)
    j = j_ref[...].reshape(3, 8 * blkC)
    acc = None
    for s in range(3):
        t = dot(r_ref[s], u, DIMS)
        t = t * j[s, :][None, :]
        acc = t if acc is None else acc + t
    o_ref[...] = acc.reshape(ND, 8, blkC)


fold = pl.pallas_call(
    div_fold, grid=(C // blkC,),
    in_specs=[pl.BlockSpec((3, ND, ND), lambda g: (0, 0, 0)),
              pl.BlockSpec((3, 8, blkC), lambda g: (0, 0, g)),
              pl.BlockSpec((ND, 8, blkC), lambda g: (0, 0, g))],
    out_specs=pl.BlockSpec((ND, 8, blkC), lambda g: (0, 0, g)),
    out_shape=jax.ShapeDtypeStruct((ND, 8, C), jnp.float32),
    compiler_params=CP())
bench("div fold-I HIGHEST ", fold, (R, J3, u3), GBd)


# correctness of the fold-I div
rng = np.random.default_rng(0)
Rv = jnp.asarray(rng.standard_normal((3, ND, ND)), jnp.float32)
Jv = jnp.asarray(rng.standard_normal((3, 8, C)), jnp.float32)
uv = jnp.asarray(rng.standard_normal((ND, 8, C)), jnp.float32)
got = np.asarray(fold(Rv, Jv, uv))
ref = np.einsum("sij,ssc->isc", 0 * np.ones((1,)) + np.asarray(Rv, np.float64),
                np.zeros((3, 8, C)))  # placeholder, computed below properly
ref = None
import numpy as _np
Rn, Jn, un = (_np.asarray(x, _np.float64) for x in (Rv, Jv, uv))
ref = _np.einsum("sij,jac->siac", Rn, un)          # (s,i,8,C)
ref = (ref * Jn[:, None, :, :]).sum(axis=0)        # (i,8,C)
err = _np.abs(got - ref).max() / _np.abs(ref).max()
print(f"div fold-I rel err: {err:.2e}", flush=True)
print("DONE", flush=True)
