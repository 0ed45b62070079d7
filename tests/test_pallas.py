"""Pallas kernel equivalence (interpreter mode on the CPU mesh)."""

import numpy as np

import jax.numpy as jnp

from mumemto_tpu.ops import pallas_kernels as pk
from mumemto_tpu.ops import pfp as ops_pfp


def test_break_mask_pallas_matches_xla(rng):
    n = pk.BLK * 4
    for n_real in (n - 7, n // 2, pk.BLK + 3):
        text = np.zeros(n, np.uint8)
        text[:n_real] = rng.integers(65, 91, n_real)
        m_x, c_x = ops_pfp._break_mask(jnp.asarray(text), jnp.int32(n_real),
                                       10, 100, n)
        m_p, c_p = pk.break_mask_pallas(jnp.asarray(text), jnp.int32(n_real),
                                        10, 100, n, interpret=True)
        assert int(c_x) == int(c_p)
        assert (np.asarray(m_x) == np.asarray(m_p)).all()
