"""Hand-write TPU schedules for the P4 wave operator and race the archive.

Reference counterpart: ``examples/wave_3d_p4_manual.py`` (606 lines of
hand-rolled loopy verbs — ``split_iname``/``tag_inames``/``add_prefetch``
with hand-picked tile sizes for div/grad/face-mass).  The TPU-native
analog is much shorter because a schedule here is *data*: a
:class:`~feinsum_tpu.ScheduleDescriptor` interpreted by the Pallas/XLA
emitters.  This walkthrough builds each descriptor from first principles
(each knob annotated with the measured v5e fact that motivates it),
validates against numpy, and — when a TPU is attached — times the manual
schedule against the shipped archive's champion for the same einsum.

Run on CPU (validates only):   python examples/wave_3d_p4_manual.py
Run on TPU (also measures):    same command, with the relay reachable.
"""
import numpy as np

import feinsum_tpu as f
from feinsum_tpu.tuning.impls._common import fused_pallas_program

NDOF = 35          # P4 tetrahedral element
NFACEDOF = 15


# {{{ the P4 wave-operator einsum classes (same classes bench.py times)

def make_div():
    # weak divergence: 3 rows sharing the resident R (3, 35, 35)
    return f.batched_einsum(
        "es,sij,ej->ei",
        [[f.array(jn, ("E", 3), "float32"),
          f.array("R", (3, NDOF, NDOF), "float32"),
          f.array(un, ("E", NDOF), "float32")]
         for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])


def make_grad():
    return f.einsum("xre,rij,ej->xei",
                    f.array("J", (3, 3, "E"), "float32"),
                    f.array("D", (3, NDOF, NDOF), "float32"),
                    f.array("u", ("E", NDOF), "float32"))


def make_face_mass():
    return f.einsum("ifj,fe,fej->ei",
                    f.array("L", (NDOF, 4, NFACEDOF), "float32"),
                    f.array("Fj", (4, "E"), "float32"),
                    f.array("flux", (4, "E", NFACEDOF), "float32"))

# }}}


# {{{ the hand-written schedules

def transform_div(program):
    """Manual div schedule.  Reasoning, knob by knob:

    * ``dofmajor`` — XLA:TPU stores arrays in T(8,128) tiles, so a
      row-major (E, 35) operand pads 35 lanes to 128: 3.66x wasted HBM
      traffic.  Storing the long axis trailing (dof-major) makes the lane
      dim the dense E axis (~3x measured streaming).
    * ``fold`` — a (35, E) dof-major array still pads 35 sublanes to 40;
      storing (35, 8, E/8) tiles HBM exactly (measured 600 -> 691 GB/s).
    * ``jfold`` — outer-product-first: tmp[e,s,j] = J[e,s]*u[e,j] first,
      then ONE contraction against the resident R.  The emitter folds the
      tiny s axis into MXU K: 3 dots of K=35 become one dot of K=105
      (fewer padded K tiles; div's +10pp unlock).
    * ``precision_3x`` — f32 dots at jax's default precision run a single
      bf16 pass on this MXU (fails the 2e-5 oracle); ``HIGHEST`` is a
      6-pass emulation (~31 TF).  bf16_3x is a manual 3-pass split: ~2x
      HIGHEST's rate, passes the oracle.
    * ``block_long=2**14`` — grid-step size: large enough to amortize
      per-block fixed overhead, small enough that double-buffered blocks
      fit VMEM (the guard inside checks).
    """
    return fused_pallas_program(
        program, block_long=2 ** 14, hoist=False, dofmajor=True, fold=True,
        jfold=True, precision_3x=True)


def transform_grad(program):
    """Manual grad schedule.  grad's 3 r-dots share the streamed u, so
    instead of jfold it uses ``mfold``: the 3 resident D[r] slices are
    padded to 8-aligned rows and stacked into ONE (120, 35) operand — one
    MXU dot instead of 3, each of which wasted 93/128 of its M tile.
    ``blkc128=20`` picks a 128-lane-granular fold block (blk_c = 2560;
    the measured grad optima sit between power-of-two grid points)."""
    return fused_pallas_program(
        program, block_long=1024 * 20, hoist=False, dofmajor=True,
        fold=True, mfold=True, precision_3x=True)


def transform_face_mass(program):
    """Manual face-mass schedule: plain fused single-step contraction —
    the resident L (35, 4, 15) contracts against the streamed flux with
    the f axis folded into MXU K by the emitter (4 dots of K=15 -> one
    K=60).  ``hoist=False`` keeps the trivial schedule: opt_einsum's
    pairwise path would materialize a (4, E, 35) intermediate (more HBM
    traffic than it saves in FLOPs on a bandwidth-bound class)."""
    return fused_pallas_program(
        program, block_long=2 ** 14, hoist=False, dofmajor=True, fold=True,
        precision_3x=True)

# }}}


def main():
    import jax

    on_tpu = jax.devices()[0].platform == "tpu"
    rows = []
    for name, einsum, tr in (("div", make_div(), transform_div),
                             ("grad", make_grad(), transform_grad),
                             ("face_mass", make_face_mass(),
                              transform_face_mass)):
        # 1. correctness first, always (tiny length, numpy oracle)
        f.validate_batched_einsum_transform(einsum, tr,
                                            long_dim_length=1024)
        print(f"{name}: manual schedule validates against numpy")
        if not on_tpu:
            continue

        # 2. time the manual schedule (device-trace span protocol)
        manual = f.timeit(einsum, transform=tr, long_dim_length=1_000_000)

        # 3. the archive's champion for the same (canonicalized) einsum
        try:
            best = f.retrieve(einsum, device=jax.devices()[0])
            champ = f.timeit(einsum, transform=best,
                             long_dim_length=1_000_000)
        except f.NoFactInDatabaseError:
            champ = None
        rows.append((name, manual, champ))

    for name, manual, champ in rows:
        beat = (" (manual BEATS the DB!)" if champ and manual < champ
                else "")
        print(f"{name}: manual {manual * 1e6:.0f} us vs archive champion "
              f"{champ * 1e6:.0f} us{beat}" if champ else
              f"{name}: manual {manual * 1e6:.0f} us (no archive row)")


if __name__ == "__main__":
    main()
