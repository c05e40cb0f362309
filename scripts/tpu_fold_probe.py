"""Probe the fold-8 layout: store dof-major (ndof, E) as (ndof, 8, E/8) so
the sublane dim is exactly 8 (no 35->40 tile padding).  Streamed blocks view
as (ndof*8, blk) for free (sublane tiles group rows in 8s); resident matmuls
use the Kronecker-interleaved matrix D'[(i,s),(j,s')] = D[i,j] * delta_ss'.

Measures (E=2^20, f32):
  A. copy  (35, E)      blocks (35, blk)        -- current dof-major baseline
  B. copy  (35, 8, E/8) blocks (35, 8, blkC)    -- folded
  C. matvec dof-major   D(35,35) @ u(35, E)     -- current
  D. matvec folded      D'(280,280) @ u(280, E/8), default precision
  E. matvec folded      bf16_3x splits
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
ND = 35
C = E // 8


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


CP = functools.partial(pltpu.CompilerParams,
                       dimension_semantics=("parallel",),
                       vmem_limit_bytes=100 * 1024 * 1024)


def copy_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = a_ref[...] * b_ref[...]


def bench(label, fn, arrays, gb):
    dt = timeit_fn(fn, *arrays)
    print(f"{label}: {gb/dt:5.0f} GB/s ({dt*1e6:7.1f} us)", flush=True)


# A. dof-major copy baseline
a = jnp.ones((ND, E), jnp.float32)
b = jnp.ones((ND, E), jnp.float32)
blk = 32768
fn = pl.pallas_call(
    copy_kernel, grid=(E // blk,),
    in_specs=[pl.BlockSpec((ND, blk), lambda g: (0, g))] * 2,
    out_specs=pl.BlockSpec((ND, blk), lambda g: (0, g)),
    out_shape=jax.ShapeDtypeStruct((ND, E), jnp.float32),
    compiler_params=CP())
bench("A copy (35,E)      ", fn, (a, b), 3 * E * ND * 4 / 1e9)

# B. folded copy
a3 = jnp.ones((ND, 8, C), jnp.float32)
b3 = jnp.ones((ND, 8, C), jnp.float32)
blkC = 4096
fn = pl.pallas_call(
    copy_kernel, grid=(C // blkC,),
    in_specs=[pl.BlockSpec((ND, 8, blkC), lambda g: (0, 0, g))] * 2,
    out_specs=pl.BlockSpec((ND, 8, blkC), lambda g: (0, 0, g)),
    out_shape=jax.ShapeDtypeStruct((ND, 8, C), jnp.float32),
    compiler_params=CP())
bench("B copy (35,8,E/8)  ", fn, (a3, b3), 3 * E * ND * 4 / 1e9)

# C. matvec dof-major baseline
D = jnp.ones((ND, ND), jnp.float32)
u = jnp.ones((ND, E), jnp.float32)
GBm = (E * ND * 2 * 4 + ND * ND * 4) / 1e9
blk = 32768


def mv_kern(d_ref, u_ref, o_ref):
    o_ref[...] = jax.lax.dot_general(
        d_ref[...], u_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


fn = pl.pallas_call(
    mv_kern, grid=(E // blk,),
    in_specs=[pl.BlockSpec((ND, ND), lambda g: (0, 0)),
              pl.BlockSpec((ND, blk), lambda g: (0, g))],
    out_specs=pl.BlockSpec((ND, blk), lambda g: (0, g)),
    out_shape=jax.ShapeDtypeStruct((ND, E), jnp.float32),
    compiler_params=CP())
bench("C matvec (35,E)    ", fn, (D, u), GBm)


# D/E. folded matvec with Kronecker-interleaved D'
def kron_interleave(D, f=8):
    # D'[(i,s),(j,s')] = D[i,j] * delta(s,s'), rows/cols interleaved i*f+s
    eye = jnp.eye(f, dtype=D.dtype)
    return jnp.einsum("ij,st->isjt", D, eye).reshape(
        D.shape[0] * f, D.shape[1] * f)


u3 = jnp.ones((ND, 8, C), jnp.float32)


def dot_bf16_3x(lhs, rhs, dims):
    def split(x):
        hi = x.astype(jnp.bfloat16)
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo
    lh, ll = split(lhs)
    rh, rl = split(rhs)
    kw = {"preferred_element_type": jnp.float32}
    return (jax.lax.dot_general(lh, rh, dims, **kw)
            + jax.lax.dot_general(lh, rl, dims, **kw)
            + jax.lax.dot_general(ll, rh, dims, **kw))


def make_folded_mv(blkC, use_3x):
    def kern(dp_ref, u_ref, o_ref):
        um = u_ref[...].reshape(ND * 8, blkC)       # free view
        dims = (((1,), (0,)), ((), ()))
        if use_3x:
            out = dot_bf16_3x(dp_ref[...], um, dims)
        else:
            out = jax.lax.dot_general(dp_ref[...], um, dims,
                                      preferred_element_type=jnp.float32)
        o_ref[...] = out.reshape(ND, 8, blkC)

    call = pl.pallas_call(
        kern, grid=(C // blkC,),
        in_specs=[pl.BlockSpec((ND * 8, ND * 8), lambda g: (0, 0)),
                  pl.BlockSpec((ND, 8, blkC), lambda g: (0, 0, g))],
        out_specs=pl.BlockSpec((ND, 8, blkC), lambda g: (0, 0, g)),
        out_shape=jax.ShapeDtypeStruct((ND, 8, C), jnp.float32),
        compiler_params=CP())

    def fn(D, u3):
        return call(kron_interleave(D), u3)
    return fn


for blkC in (2048, 4096):
    bench(f"D matvec fold blk{blkC} ", make_folded_mv(blkC, False),
          (D, u3), GBm)
    bench(f"E matvec fold 3x blk{blkC}", make_folded_mv(blkC, True),
          (D, u3), GBm)

# correctness spot check
rng = np.random.default_rng(0)
Dv = jnp.asarray(rng.standard_normal((ND, ND)), jnp.float32)
uv = jnp.asarray(rng.standard_normal((ND, 8, C)), jnp.float32)
got = np.asarray(make_folded_mv(4096, True)(Dv, uv))
ref = np.einsum("ij,jsc->isc", np.asarray(Dv, np.float64),
                np.asarray(uv, np.float64))
err = np.abs(got - ref).max() / np.abs(ref).max()
print(f"fold matvec 3x rel err: {err:.2e}", flush=True)
print("DONE", flush=True)
