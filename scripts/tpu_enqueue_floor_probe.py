"""Measure the relay's per-launch enqueue floor and its contamination of
the differenced-wall protocol on short kernels.

Hypothesis: ``wall(n) ~ max(n * device_time, n * enqueue_cost) + fixed``,
so ``_timeit_wall_diff`` reports ``max(device, enqueue)`` — honest for
kernels >= a few hundred us, but on this sandbox the axon RPC relay's
per-launch enqueue cost is large enough to dominate short kernels
(dg_div_ndof4 @ E=1M: ~125 us/launch wall-diff vs a much shorter device
span), which is a sandbox artifact, not TPU performance: a production host
enqueues XLA launches in ~5-20 us.

Protocol here:
  1. null kernel (scalar add): differenced wall = pure enqueue floor F
     (device time ~ 1 us).
  2. a small DG kernel (div ndof=4 champion) + a large one (div ndof=35):
     wall-diff vs device-trace span for each.
  3. print the decision table for measure.timeit_on_device.
"""

import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

import feinsum_tpu as f  # noqa: E402
from feinsum_tpu import sql_utils  # noqa: E402
from feinsum_tpu.measure import (  # noqa: E402
    _apply_layouts,
    _timeit_device_trace,
    _timeit_wall_diff,
    generate_input_arrays,
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_div(ndof, dtype="float32"):
    return f.batched_einsum(
        "es,sij,ej->ei",
        [[f.array(jn, ("E", 3), dtype),
          f.array("R", (3, ndof, ndof), dtype),
          f.array(un, ("E", ndof), dtype)]
         for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])


def main():
    # 1. the null kernel: device work ~1 us, so wall-diff == enqueue floor
    @jax.jit
    def null_fn(arrays):
        return (arrays["x"] + 1.0,)

    xs = {"x": jnp.zeros((8, 128), jnp.float32)}
    floors = [_timeit_wall_diff(null_fn, xs) for _ in range(5)]
    log(f"enqueue floor (null kernel), 5 reps us:"
        f" {[round(1e6 * t, 1) for t in floors]}")
    floor = min(floors)

    # 2. short + long production kernels
    for name, ndof in (("div_ndof4", 4), ("div_ndof10", 10),
                       ("div_ndof35", 35)):
        e = make_div(ndof)
        tr = sql_utils.retrieve(e)
        prog = tr(f.generate_program(e))
        arrays = _apply_layouts(
            prog, generate_input_arrays(e, long_dim_length=1_000_000))
        fn = f.build_executable(prog, long_dim_length=1_000_000)
        walls = [_timeit_wall_diff(fn, arrays) for _ in range(3)]
        trace = _timeit_device_trace(fn, arrays)
        log(f"{name}: wall-diff 3 reps us="
            f"{[round(1e6 * t, 1) for t in walls]}"
            f" trace span us={1e6 * trace:.1f}"
            f" floor-ratio={min(walls) / floor:.2f}")


if __name__ == "__main__":
    main()
