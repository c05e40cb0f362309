"""Seeded autotune for the sub-80% small-ndof DG rows (VERDICT r2 next #3)
under the CONSOLIDATED space — mfold/jfold/prereduce are now searchable on
every family (they were grad/curl-only before), and the block cap is 2^18.
One class per process (relay ops guidance).

Usage: python scripts/tune_small_ndof.py [div4|div10|div20|grad4|grad10|
                                          grad20|matvec|curl] [secs]
"""
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import feinsum_tpu as f  # noqa: E402
from feinsum_tpu.tuning import autotune  # noqa: E402

import logging  # noqa: E402

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")


def mk_div(ndof):
    return f.batched_einsum(
        "es,sij,ej->ei",
        [[f.array(jn, ("E", 3), "float32"),
          f.array("R", (3, ndof, ndof), "float32"),
          f.array(un, ("E", ndof), "float32")]
         for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])


def mk_grad(ndof):
    return f.einsum("xre,rij,ej->xei",
                    f.array("J", (3, 3, "E"), "float32"),
                    f.array("D", (3, ndof, ndof), "float32"),
                    f.array("u", ("E", ndof), "float32"))


def mk_div_single(ndof):
    return f.einsum("es,sij,ej->ei",
                    f.array("J", ("E", 3), "float32"),
                    f.array("R", (3, ndof, ndof), "float32"),
                    f.array("u", ("E", ndof), "float32"))


CLASSES = {
    # single-output div: its own canonical class (BASELINE row 1918.8; a
    # user matching ONE einsum misses the b=3 batched facts)
    "div_single": (mk_div_single(35), "dg_div_v0"),
    "div35": (mk_div(35), "dg_div_v0"),     # headline row: rowcat candidate
    "div4": (mk_div(4), "dg_div_v0"),
    "div10": (mk_div(10), "dg_div_v0"),
    "div20": (mk_div(20), "dg_div_v0"),
    "grad4": (mk_grad(4), "dg_grad_v0"),
    "grad10": (mk_grad(10), "dg_grad_v0"),
    "grad20": (mk_grad(20), "dg_grad_v0"),
    "grad35": (mk_grad(35), "dg_grad_v0"),  # headline row (mfold trend was
                                            # still rising with block size)
    "matvec": (f.einsum("ej,ij->ei", f.array("u", ("E", 20), "float32"),
                        f.array("D", (20, 20), "float32")), "mass_v0"),
    # face/mass sit AT the 80% north star in r2d; the consolidated space
    # exposes knobs (mfold/rowcat/prereduce) they have never searched
    "face": (f.einsum("ifj,fe,fej->ei",
                      f.array("L", (35, 4, 15), "float32"),
                      f.array("Fj", (4, "E"), "float32"),
                      f.array("flux", (4, "E", 15), "float32")),
             "face_mass_v0"),
    "mass": (f.einsum("e,ij,ej->ei", f.array("jac", ("E",), "float32"),
                      f.array("M", (35, 35), "float32"),
                      f.array("u", ("E", 35), "float32")), "mass_v0"),
    "copy": (f.einsum("ij,ij->ij", f.array("A", ("E", 35), "float32"),
                      f.array("B", ("E", 35), "float32")), "elementwise_v1"),
    "curl": (f.batched_einsum(
        "e,rij,ej->ei",
        [[f.array(j, ("E",), "float32"),
          f.array("D", (3, 35, 35), "float32"),
          f.array(u, ("E", 35), "float32")]
         for j, u in [("Jy", "uz"), ("Jz", "ux"), ("Jx", "uy")]]),
        "curl_3d_v0"),
}


def project_seed(space, seed):
    """Project a make_dg_space-shaped seed onto *space*: autotune silently
    DROPS seeds failing exact key-set validation, so a pinned knob
    (rowcat gated to IntParameter(0,0) on b=1 classes) or a differently
    shaped space (elementwise_v1 for copy) would discard the whole seed.
    Out-of-space keys drop, missing keys fill conservatively, out-of-range
    values clamp (True -> pinned 0)."""
    from feinsum_tpu.tuning import BoolParameter, IntParameter
    out = {}
    for k, p in space.items():
        v = seed.get(k)
        if v is not None and p.contains(v):
            out[k] = v
        elif isinstance(p, IntParameter):
            out[k] = min(max(int(v or 0), p.low), p.high)
        elif isinstance(p, BoolParameter):
            out[k] = bool(v)
        else:
            import numpy as np
            out[k] = p.sample(np.random.default_rng(0))
    return out


if __name__ == "__main__":
    from feinsum_tpu.tuning import get_transform_func_from_module_path

    which = sys.argv[1] if len(sys.argv) > 1 else "div4"
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 600.0
    einsum, impl = CLASSES[which]
    # big-block seeds: small-ndof rows are per-grid-step-overhead-bound —
    # the old 2^16 cap was binding (matvec's optimum sat AT the cap)
    seeds = [
        {"log2_block": max(lb, 8), "blkc128": bc, "dofmajor": True,
         "fold": True,
         "preblock": False, "precision_3x": False, "hoist": False,
         "jfold": jf, "mfold": mf, "prereduce": False, "lane_pack_g": 0,
         "rowcat": rc, "parallel_grid": True, "vmem_idx": 2,
         "split_rows": False, "accum_f32": False, "host_hoist": True}
        for lb, bc in ((17, 0), (18, 0), (16, 0), (0, 20), (0, 24))
        for jf, mf in ((True, False), (False, True), (False, False))
        for rc in (False, True)]
    # r4 DG lane-pack seeds (the P1/P2 unlock, VERDICT r3 #3): dense
    # packed lanes x rowcat; misaligned g's raise fast and score as
    # failures, so every class can share one seed list
    seeds += [
        {"log2_block": lb, "blkc128": bc, "dofmajor": True, "fold": fd,
         "preblock": False, "precision_3x": False, "hoist": False,
         "jfold": False, "mfold": False, "prereduce": False,
         "lane_pack_g": lg, "rowcat": rc, "parallel_grid": True,
         "vmem_idx": 2, "split_rows": False, "accum_f32": False,
         "host_hoist": True}
        for lg in (3, 4, 5)
        for rc in (False, True)
        for lb, bc, fd in ((17, 0, True), (0, 20, True), (14, 0, False))]
    # recovery seeds (r4 incident) FIRST: the polluted retire pass deleted
    # two honest champion rows whose configs survive only in the retire
    # log — div10's jfold @ 2^15 + hoist (4315 GOp/s) and grad4's mfold @
    # 2^15.  Known-champion configs, so they lead the seed order and are
    # re-measured honestly whenever their class tunes again.
    seeds = [
        {"log2_block": 15, "blkc128": 0, "dofmajor": True, "fold": True,
         "preblock": True, "precision_3x": True, "hoist": True,
         "jfold": jf, "mfold": mf, "prereduce": False, "lane_pack_g": 0,
         "rowcat": False, "parallel_grid": True, "vmem_idx": 2,
         "split_rows": False, "accum_f32": False, "host_hoist": True}
        for jf, mf in ((True, False), (False, True))] + seeds
    sp = get_transform_func_from_module_path(impl)
    ce = f.canonicalize_einsum(einsum)
    space = sp.get_param_space(ce)
    projected, seen = [], set()
    for s in seeds:
        p = project_seed(space, s)
        key = tuple(sorted(p.items()))
        if key not in seen:
            seen.add(key)
            projected.append(p)
    # model-ranked seeds (r4): sample the space broadly on the host and
    # put the analytic predictor's top picks FIRST — champions sit at
    # median predicted-percentile ~11% (scripts/cost_model_report.py), so
    # the first compiles go to the likeliest winners
    try:
        import numpy as _np
        from feinsum_tpu.codegen.program import get_index_lengths
        from feinsum_tpu.tuning.cost_model import predict_for_params
        _rng = _np.random.default_rng(0)
        _lens = get_index_lengths(ce, 1_000_000)
        ranked = []
        for _ in range(3000):
            cand = {k: p.sample(_rng) for k, p in space.items()}
            t = predict_for_params(sp, ce, cand, _lens, "TPU_v5_lite")
            if t is not None:
                ranked.append((t, cand))
        ranked.sort(key=lambda x: x[0])
        model_seeds = []
        for _t, cand in ranked:
            key = tuple(sorted(cand.items()))
            if key not in seen:
                seen.add(key)
                model_seeds.append(cand)
            if len(model_seeds) >= 6:
                break
        # model picks run AFTER a dozen known-good-family seeds: a single
        # mis-ranked pick with a pathological Mosaic compile (observed
        # live r4: div10's top pick compiled ~17 min and measured 5x worse
        # than champion) must cost the tail of the budget, not the head
        projected = projected[:12] + model_seeds + projected[12:]
        print(f"{len(model_seeds)} model-ranked seeds inserted after the"
              f" first 12", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"cost-model seeding skipped: {type(ex).__name__}: {ex}",
              flush=True)
    print(f"{len(projected)} projected seeds (from {len(seeds)})",
          flush=True)
    autotune(einsum, impl, stop_after=budget, long_dim_length=1_000_000,
             seed_configs=projected)
    print("SMALL-NDOF TUNE DONE", flush=True)
