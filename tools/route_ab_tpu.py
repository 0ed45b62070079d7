"""TPU A/B: permutation scatter vs sort-route at doubling-round shapes.

Run on the real chip when the tunnel returns. If sort-route wins,
swap round_core's `.at[perm].set(v)` for `lax.sort((perm, v))[1]`
(byte-identical: perm is a permutation) — ~1 pass per doubling round
over nd, ~8 rounds at bench shape.
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp
import numpy as np

for n in (6_291_456, 16_777_216, 25_165_824):
    rng = np.random.default_rng(0)
    perm_np = rng.permutation(n).astype(np.int32)
    v_np = rng.integers(0, n, n, dtype=np.int32)
    perm = jnp.asarray(perm_np); v = jnp.asarray(v_np)

    @jax.jit
    def scat(perm, v):
        return jnp.zeros((n,), jnp.int32).at[perm].set(v)

    @jax.jit
    def route(perm, v):
        return jax.lax.sort((perm, v), num_keys=1)[1]

    a = jax.block_until_ready(scat(perm, v))
    b = jax.block_until_ready(route(perm, v))
    assert (np.asarray(a) == np.asarray(b)).all()
    for name, fn in (("scatter", scat), ("sortroute", route)):
        ts = []
        for _ in range(5):
            t0 = time.time(); jax.block_until_ready(fn(perm, v))
            ts.append(time.time() - t0)
        print(f"n={n}: {name} best {min(ts)*1e3:.1f} ms", flush=True)
