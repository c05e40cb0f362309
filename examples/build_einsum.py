"""Build and inspect batched einsums (reference: examples/build_einsum.py)."""
import numpy as np

import feinsum_tpu as f

# a single dense batched einsum (matmul-like)
e = f.einsum("ij,jk->ik",
             f.array("A", (128, 256), np.float32),
             f.array("B", (256, 64), np.float32))
print(e)
print("subscripts:", e.get_subscripts())
print("canonical form:\n", f.canonicalize_einsum(e))

# a parametric ("infinitely long") element axis
dg = f.einsum("ej,ij->ei",
              f.array("u", ("E", 35), np.float32),
              f.array("D", (35, 35), np.float32))
print(dg)
print("size params:", dg.all_size_params)
