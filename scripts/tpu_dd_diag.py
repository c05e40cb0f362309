"""ONE careful dd (double-double fp64) point on the TPU, with the FULL
compile-helper error captured — VERDICT r4 next #4: every dd module 500'd
instantly on the post-reboot relay build with a truncated error body, so
the fp64-on-TPU question is open until one solo diagnostic either compiles
(-> sweep dd) or pins the actual rejection text.

Safe-ops design (CLAUDE.md r4 lessons):
- the compile runs in a CHILD python process whose stdout/stderr stream to
  files; the parent NEVER kills it (SIGTERM mid-compile is the known
  relay-wedge-maker) — on deadline the parent reports the hang and exits,
  leaving the orphan to finish alone;
- nothing else may touch the TPU while this runs (the device lock covers
  the library funnels, including backend attach, but don't rely on it);
- the full traceback + captured streams land in /tmp/dd_diag_report.txt.

Usage: python scripts/tpu_dd_diag.py [deadline-secs]    (default 900)
"""
import os
import subprocess
import sys
import time

REPORT = "/tmp/dd_diag_report.txt"
OUT = "/tmp/dd_diag_child.out"


def child():
    import traceback

    import jax

    if os.environ.get("DD_DIAG_CPU"):   # CPU smoke-test mode
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    import feinsum_tpu as f
    from feinsum_tpu.diagnostics import TransformValidationError
    from feinsum_tpu.tuning import get_transform_func_from_module_path

    e = f.einsum("es,sij,ej->ei", f.array("J", ("E", 3), "float64"),
                 f.array("R", (3, 35, 35), "float64"),
                 f.array("u", ("E", 35), "float64"))
    sp = get_transform_func_from_module_path("dd_pallas_v0")
    tr = sp.bind_args(e, log2_block=10, blkc128=0, parallel_grid=True,
                      vmem_idx=2)
    # tiny: we want the error, not perf.  CPU smoke stays at grid=1 (the
    # interpret-mode grid>=2 compile blowup, CLAUDE.md CPU gotcha 1).
    E = 1 << 10 if os.environ.get("DD_DIAG_CPU") else 1 << 14
    print(f"[child] compiling + validating (1e-12 oracle) on"
          f" {jax.devices()} ...", flush=True)
    t0 = time.time()
    try:
        f.validate_batched_einsum_transform(e, tr, long_dim_length=E)
        print(f"[child] COMPILED, RAN AND VALIDATED at the f64 oracle in"
              f" {time.time()-t0:.1f}s", flush=True)
        print("DD_DIAG_VERDICT: COMPILES ACCURATE", flush=True)
    except TransformValidationError as exc:
        print(f"[child] compiled but FAILED the oracle: {exc}", flush=True)
        print("DD_DIAG_VERDICT: COMPILES INACCURATE", flush=True)
    except Exception:
        print(f"[child] FAILED after {time.time()-t0:.1f}s; FULL traceback"
              " (untruncated):", flush=True)
        tb = traceback.format_exc()
        print(tb, flush=True)
        # some relay errors carry response bodies on args; dump them whole
        exc = sys.exc_info()[1]
        for i, a in enumerate(getattr(exc, "args", ()) or ()):
            print(f"[child] exc.args[{i}] ({len(str(a))} chars):", flush=True)
            print(str(a), flush=True)
        print("DD_DIAG_VERDICT: REJECTED", flush=True)


def main():
    deadline = float(sys.argv[1]) if len(sys.argv) > 1 else 900.0
    with open(OUT, "w") as out:
        p = subprocess.Popen([sys.executable, __file__, "--child"],
                             stdout=out, stderr=subprocess.STDOUT)
    t0 = time.time()
    while p.poll() is None and time.time() - t0 < deadline:
        time.sleep(5)
    lines = open(OUT).read() if os.path.exists(OUT) else ""
    with open(REPORT, "w") as r:
        r.write(f"dd diag {time.strftime('%F %T')} rc={p.poll()}"
                f" elapsed={time.time()-t0:.0f}s\n")
        r.write(lines)
    if p.poll() is None:
        print(f"DD_DIAG: HANG after {deadline:.0f}s — leaving child"
              f" pid {p.pid} to finish alone (never SIGTERM a compile)."
              f" Tail of {OUT}:")
        print(lines[-2000:])
        sys.exit(3)
    print(f"DD_DIAG: child rc={p.returncode}; report at {REPORT}")
    print(lines[-4000:])
    sys.exit(0 if "DD_DIAG_VERDICT: COMPILES" in lines else 1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child()
    else:
        main()
