"""On-chip check of the device-conformer batch-composition bound.

tests/test_device_refine.py pins BATCH_COMPOSITION_ATOL = 1e-5 on the CPU
backend; this probe asserts the same bound on the REAL chip's XLA codegen
(the documented drift source: the batch count changes the batched-matmul
codegen, accumulating ~1e-6 A over 300 iterations).

Usage: python scripts/conformer_determinism_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax


def main():
    from mmdti_tpu.chem.device_conformer import device_smi2coords_batch

    print(f"backend={jax.default_backend()}")
    # >= min_atoms(48) total atoms so the DEVICE path runs (not the host
    # fallback): ~51-heavy-atom ether ladders, the serve-probe molecule class
    lad = "OCC" + "OCC" * 16 + "O"
    others = ["OCC" + "OCC" * 15 + "N", "OCC" + "OCC" * 14 + "CO"]

    alone = device_smi2coords_batch([lad], seed=7)[0][1]
    rep = device_smi2coords_batch([lad], seed=7)[0][1]
    trio = device_smi2coords_batch([lad] + others, seed=7)[0][1]

    d_repeat = float(np.abs(alone - rep).max())
    d_batch = float(np.abs(alone - trio).max())
    print(f"repeat-call drift: {d_repeat:.2e} A (must be 0: bit-identical)")
    print(f"batch-composition drift: {d_batch:.2e} A (bound 1e-5)")
    assert d_repeat == 0.0, "repeat calls must be bit-identical"
    assert d_batch < 1e-5, f"drift {d_batch:.2e} exceeds the documented bound"
    print("OK: chip codegen drift within the pinned 1e-5 bound")


if __name__ == "__main__":
    main()
