"""VERDICT r3 #7: TPU-validate the consumer path end-to-end.

compile_fn_with_archive on a wave-operator RHS (componentwise div + mass +
scaled sum, the knowledge_transfer example's shape) at E=1M on the live
chip:

  * plan-construction latency (match -> archive query -> spot-check ->
    build), cold and warm;
  * per-call latency of the compiled fn vs the sum of its champions'
    bench-measured kernel times — the gap is the storage-contract
    relayout overhead the apply.py docstring warns about (user arrays
    arrive in LOGICAL layout, so packing/transposes run in-graph here,
    unlike the bench path where inputs are pre-packed).

Writes a summary to stderr/stdout for capture into CLAUDE.md.
"""
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import feinsum_tpu as f  # noqa: E402
from feinsum_tpu.measure import timeit_on_device  # noqa: E402

E = 1_000_000
NDOF = 35


def main():
    rng = np.random.default_rng(0)
    d = {
        "Jx": rng.random((E, 3), np.float32),
        "Jy": rng.random((E, 3), np.float32),
        "Jz": rng.random((E, 3), np.float32),
        "R": rng.random((3, NDOF, NDOF), np.float32),
        "ux": rng.random((E, NDOF), np.float32),
        "uy": rng.random((E, NDOF), np.float32),
        "uz": rng.random((E, NDOF), np.float32),
        "jac": rng.random((E,), np.float32),
        "M": rng.random((NDOF, NDOF), np.float32),
    }
    d = {k: jax.device_put(v) for k, v in d.items()}
    jax.block_until_ready(list(d.values()))

    def wave_rhs(Jx, Jy, Jz, R, ux, uy, uz, jac, M):
        div = (jnp.einsum("es,sij,ej->ei", Jx, R, ux)
               + jnp.einsum("es,sij,ej->ei", Jy, R, uy)
               + jnp.einsum("es,sij,ej->ei", Jz, R, uz))
        mass = jnp.einsum("e,ij,ej->ei", jac, M, ux)
        return div - 0.5 * mass

    args = [d[k] for k in ("Jx", "Jy", "Jz", "R", "ux", "uy", "uz",
                           "jac", "M")]

    # cold plan includes the on-device shootout when the modeled champion
    # sits far above the physics floor (r5: the div class holds no fast
    # layout-free row, so only measuring can discover that the user's raw
    # XLA program wins end-to-end)
    t0 = time.perf_counter()
    fn2 = f.compile_fn_with_archive(wave_rhs, args, long_dim_length=E)
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    fn2b = f.compile_fn_with_archive(wave_rhs, args, long_dim_length=E)
    t_warm = time.perf_counter() - t0
    print(f"plan construction: cold {t_cold:.2f} s, warm {t_warm * 1e3:.1f}"
          f" ms (north star: <10 ms warm replay)", flush=True)
    for row_infos, einsum, program in fn2.plans:
        print(f"  plan: b={einsum.b} {einsum.get_subscripts()} ->"
              f" {program.descriptor.backend}"
              f" lane_pack={program.descriptor.lane_pack}"
              f" rowcat={getattr(program.descriptor, 'rowcat', 1)}",
              flush=True)

    # numeric check at full length vs an f64 HOST oracle.  The raw jitted
    # fn is NOT a reference: XLA's default f32 dot precision on this TPU is
    # one-pass bf16 (~1e-3 rel err — CLAUDE.md), so comparing against it
    # asserts nothing about OUR kernels.  The consumer contract is "at
    # least as accurate as the user's own jax.jit would have been".
    h = {k: np.asarray(v, np.float64) for k, v in d.items()}
    oracle = ((np.einsum("es,sij,ej->ei", h["Jx"], h["R"], h["ux"])
               + np.einsum("es,sij,ej->ei", h["Jy"], h["R"], h["uy"])
               + np.einsum("es,sij,ej->ei", h["Jz"], h["R"], h["uz"]))
              - 0.5 * np.einsum("e,ij,ej->ei", h["jac"], h["M"], h["ux"]))
    got = np.asarray(fn2(*args), np.float64)
    raw = np.asarray(wave_rhs(*args), np.float64)
    scale = np.abs(oracle).max() or 1.0
    err_got = np.abs(got - oracle).max() / scale
    err_raw = np.abs(raw - oracle).max() / scale
    print(f"full-length numeric check vs f64 oracle: compiled"
          f" {err_got:.2e}, raw-XLA {err_raw:.2e}", flush=True)
    assert err_got < max(5e-5, 1.5 * err_raw), (err_got, err_raw)

    jfn = jax.jit(fn2b)
    jax.block_until_ready(jfn(*args))
    # timeit_on_device takes fn(arrays_by_name); close over the real args
    # (the empty dict only weakens the bandwidth floor, span stays primary)
    dt_fn = timeit_on_device(lambda arrays: jfn(*args), {})
    dt_raw = timeit_on_device(lambda arrays: jax.jit(wave_rhs)(*args), {})
    print(f"end-to-end per-call: compiled {dt_fn * 1e6:.0f} us vs raw-XLA"
          f" {dt_raw * 1e6:.0f} us (ratio {dt_raw / dt_fn:.2f}x)",
          flush=True)
    print("CONSUMER PROBE DONE", flush=True)


if __name__ == "__main__":
    main()
