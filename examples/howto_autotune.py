"""Autotune a schedule space on the current device and read the results back
(reference: examples/howto_autotune.py)."""
import tempfile

import feinsum_tpu as f
from feinsum_tpu import sql_utils
from feinsum_tpu.tuning import autotune

NDOF = 35
einsum = f.batched_einsum(
    "es,sij,ej->ei",
    [[f.array(jn, ("E", 3), "float32"),
      f.array("R", (3, NDOF, NDOF), "float32"),
      f.array(un, ("E", NDOF), "float32")]
     for jn, un in [("Jx", "ux"), ("Jy", "uy"), ("Jz", "uz")]])

if __name__ == "__main__":
    import logging
    logging.basicConfig(level=logging.INFO)

    db = tempfile.mktemp(suffix=".sqlite")
    autotune(einsum, "dg_div_v0", db_path=db, stop_after=600,
             long_dim_length=500_000)

    for q in sorted(sql_utils.query(einsum, db_path=db),
                    key=lambda q: q.runtime_in_sec):
        print(f"{q.total_giga_op_rate:9.1f} GOp/s  {dict(q.transform_params)}")
