"""Probe HBM streaming efficiency of different block layouts on TPU.

Copy kernel y = a*b over logically-(E,35) f32 arrays, E=2^20:
  A. blocks (blk, 35)        — row-fragment DMA (140 B rows)
  B. flat 1D blocks (blk*35,)
  C. flat 2D blocks (n, 128) — dense lanes via host-side reshape
  D. transposed (35, E) with blocks (35, blk) — contiguous 4*blk rows
Matvec out[e,i] = sum_j u[e,j] D[i,j]:
  E. u as (E,35) blocks      F. u as (35,E) transposed blocks
"""
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


def copy_kernel(a_ref, b_ref, o_ref):
    o_ref[...] = a_ref[...] * b_ref[...]


def bench_copy(label, shape, block, gb):
    a = jnp.ones(shape, jnp.float32)
    b = jnp.ones(shape, jnp.float32)
    idx = lambda g: tuple(g if s != ss else 0
                          for s, ss in zip(block, shape))
    # grid over the first axis where block < shape
    gdim = [i for i, (bs, ss) in enumerate(zip(block, shape)) if bs < ss]
    gd = gdim[0] if gdim else 0
    grid = (pl.cdiv(shape[gd], block[gd]),)
    def imap(g):
        return tuple(g if i == gd else 0 for i in range(len(shape)))
    fn = pl.pallas_call(
        copy_kernel, grid=grid,
        in_specs=[pl.BlockSpec(block, imap)] * 2,
        out_specs=pl.BlockSpec(block, imap),
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=100*1024*1024))
    dt = timeit_fn(fn, a, b)
    print(f"{label}: {gb/dt:5.0f} GB/s ({dt*1e6:7.1f} us)", flush=True)


GB = 3 * E * ND * 4 / 1e9
bench_copy("D copy transposed", (ND, E), (ND, 32768), GB)


def bench_matvec(label, transposed):
    D = jnp.ones((ND, ND), jnp.float32)
    GBm = (E * ND * 2 * 4 + ND * ND * 4) / 1e9
    if not transposed:
        u = jnp.ones((E, ND), jnp.float32)
        blk = 8192
        def kern(u_ref, d_ref, o_ref):
            o_ref[...] = jax.lax.dot_general(
                u_ref[...], d_ref[...], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        fn = pl.pallas_call(
            kern, grid=(E // blk,),
            in_specs=[pl.BlockSpec((blk, ND), lambda g: (g, 0)),
                      pl.BlockSpec((ND, ND), lambda g: (0, 0))],
            out_specs=pl.BlockSpec((blk, ND), lambda g: (g, 0)),
            out_shape=jax.ShapeDtypeStruct((E, ND), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100*1024*1024))
        dt = timeit_fn(fn, u, D)
    else:
        u = jnp.ones((ND, E), jnp.float32)
        blk = 8192 * 4
        def kern(u_ref, d_ref, o_ref):
            # out (i, e) = D(i,j) @ u(j, e)
            o_ref[...] = jax.lax.dot_general(
                d_ref[...], u_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        fn = pl.pallas_call(
            kern, grid=(E // blk,),
            in_specs=[pl.BlockSpec((ND, blk), lambda g: (0, g)),
                      pl.BlockSpec((ND, ND), lambda g: (0, 0))],
            out_specs=pl.BlockSpec((ND, blk), lambda g: (0, g)),
            out_shape=jax.ShapeDtypeStruct((ND, E), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100*1024*1024))
        dt = timeit_fn(fn, u, D)
    print(f"{label}: {GBm/dt:5.0f} GB/s-eff ({dt*1e6:7.1f} us)", flush=True)


bench_matvec("E matvec (E,35)", False)
bench_matvec("F matvec (35,E)", True)
print("DONE", flush=True)
