"""Full 3D wave operator at P4 with DB-driven schedules (reference:
examples/wave_3d_p4_auto.py): every einsum in the step consults the transform
archive for the best recorded schedule on this device."""
import time

import jax

from feinsum_tpu import sql_utils
from feinsum_tpu.models import WaveOperator3D, make_wave_state

import jax as _jax
N_ELEMENTS = 200_000 if _jax.devices()[0].platform == "tpu" else 2_000

if __name__ == "__main__":
    op = WaveOperator3D(ndof=35, nfacedof=15, dtype="float32",
                        db_path=sql_utils.DEFAULT_DB)
    step = jax.jit(op.make_step(N_ELEMENTS))
    state, geom = make_wave_state(N_ELEMENTS)

    state = step(state, geom)          # compile
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(20):
        state = step(state, geom)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / 20
    print(f"wave step: {dt * 1e3:.2f} ms / step at E={N_ELEMENTS}")
