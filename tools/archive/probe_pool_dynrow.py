"""Mosaic feasibility probe for the fused pool kernel (round 4).

The fused pool walk needs 3 kept-field rows per grid step at offsets
(t, t+1, t+2) with clamped indices.  Streaming them as (1, 1, S) blocks
is the known-rejected 1-sublane layout, so the design keeps the WHOLE
kept plane in VMEM (u8 1 MB / i32 4 MB at 1080p) and row-indexes it
dynamically per step.  This probe checks whether Mosaic lowers dynamic
sublane indexing of a whole-array VMEM ref (u8 and i32 variants), and
whether values match numpy.

    python tools/probe_pool_dynrow.py
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(kept_ref, out_ref, *, H):
    t = pl.program_id(0)
    r0 = jnp.minimum(t, H - 1)
    r1 = jnp.minimum(t + 1, H - 1)
    r2 = jnp.minimum(t + 2, H - 1)
    a = kept_ref[r0].astype(jnp.int32)
    b = kept_ref[r1].astype(jnp.int32)
    c = kept_ref[r2].astype(jnp.int32)
    out_ref[0, 0] = a * 3 + b * 5 + c * 7


def run(dtype, H=64, S=256, steps=70):
    rng = np.random.default_rng(0)
    kept = rng.integers(0, 200, (H, S)).astype(dtype)
    call = pl.pallas_call(
        functools.partial(_kernel, H=H),
        grid=(steps,),
        in_specs=[pl.BlockSpec((H, S), lambda t: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, S), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((steps, 1, S), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )
    got = np.asarray(call(jnp.asarray(kept)))[:, 0]
    k = kept.astype(np.int64)
    want = np.stack([
        k[min(t, H - 1)] * 3 + k[min(t + 1, H - 1)] * 5
        + k[min(t + 2, H - 1)] * 7
        for t in range(steps)
    ])
    ok = np.array_equal(got, want)
    print(f"{np.dtype(dtype).name}: {'OK' if ok else 'MISMATCH'}")
    return ok


def main():
    print("backend:", jax.default_backend())
    for dt in (np.int32, np.uint8):
        try:
            run(dt)
        except Exception as e:
            print(f"{np.dtype(dt).name}: FAILED to lower/run: "
                  f"{str(e).splitlines()[0][:200]}")


if __name__ == "__main__":
    main()
