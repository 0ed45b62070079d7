"""Pallas kernel equivalence (interpreter mode on the CPU mesh)."""

import numpy as np

import jax.numpy as jnp

from mumemto_tpu.ops import pallas_kernels as pk
from mumemto_tpu.ops import pfp as ops_pfp


def test_break_mask_pallas_matches_xla(rng):
    ne = pk.BLK * 4
    for n_text in (ne - 64, ne // 2, pk.BLK + 3):
        # ext layout: [Dollar] + text + [Dollar]*w + zero pad
        ext = np.zeros(ne, np.uint8)
        ext[0] = ops_pfp.DOLLAR_PFP
        ext[1:n_text + 1] = rng.integers(65, 91, n_text)
        ext[n_text + 1:n_text + 11] = ops_pfp.DOLLAR_PFP
        m_x, c_x = ops_pfp._break_mask(jnp.asarray(ext), jnp.int32(n_text),
                                       10, 100, ne)
        m_p, c_p = pk.break_mask_pallas(jnp.asarray(ext), jnp.int32(n_text),
                                        10, 100, ne, interpret=True)
        assert int(c_x) == int(c_p)
        assert (np.asarray(m_x) == np.asarray(m_p)).all()
