"""Probe whether Mosaic (Pallas-TPU) can lower the dynamic-gather
pattern the deformable sampler needs (PERFORMANCE.md: blocked in round 1
— 'Mosaic lowers no dynamic gather'). Run on the real chip whenever the
toolchain updates; if PASS, a VMEM-resident deform kernel becomes viable
(the per-level value tensors fit VMEM easily at line-image sizes).

Usage: python scripts/pallas_probe.py   (TPU must be otherwise idle)
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from jax.experimental import pallas as pl

    S, C, Q = 1024, 64, 128

    def kernel(val_ref, idx_ref, out_ref):
        # the deform-attn primitive: per-query dynamic row gather
        idx = idx_ref[...]                      # (Q,) int32 in [0, S)
        rows = val_ref[idx, :]                  # dynamic gather
        out_ref[...] = rows * 2.0

    val = jnp.asarray(np.random.RandomState(0).randn(S, C), jnp.float32)
    idx = jnp.asarray(np.random.RandomState(1).randint(0, S, Q), jnp.int32)

    try:
        fn = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((Q, C), jnp.float32),
        )
        got = jax.jit(fn)(val, idx)
        want = np.asarray(val)[np.asarray(idx)] * 2.0
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)
        print("PASS: Mosaic lowered the dynamic row gather — "
              "a VMEM deform kernel is now worth building")
        return 0
    except Exception as exc:  # lowering errors are expected until then
        print(f"BLOCKED: {type(exc).__name__}: {str(exc)[:500]}")
        return 1


if __name__ == "__main__":
    sys.exit(main())
