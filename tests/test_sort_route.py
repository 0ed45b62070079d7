"""The two route_set lowerings (ops/suffix.route_set) are byte-identical
end to end: sort-route (the default since the 2026-08-19 hardware A/B)
vs MUMEMTO_SORT_ROUTE=0 scatter. The flag is read at TRACE time, so each
run happens in a subprocess with the env set."""

import os
import subprocess
import sys

import numpy as np

from mumemto_tpu import engine, options, refbuilder
from tests.conftest import mutated_collection

_CHILD = r"""
import jax; jax.config.update("jax_platforms", "cpu")
import sys, numpy as np
sys.path.insert(0, %(root)r)
from mumemto_tpu import engine, options, refbuilder
docs = %(docs)r
rb = refbuilder.build_from_sequences(docs)
opts = options.normalize(rb.num_docs, merge=%(merge)r, quiet=True)
res = engine.find_matches(rb, opts, backend=%(backend)r,
                          show_progress=False)
sys.stdout.buffer.write(res.output_bytes())
"""

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(docs, env_val, merge=False, backend="pfp"):
    env = dict(os.environ)
    env["MUMEMTO_SORT_ROUTE"] = env_val
    env.setdefault("JAX_PLATFORMS", "cpu")
    code = _CHILD % {"root": ROOT, "docs": docs, "merge": merge,
                     "backend": backend}
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       env=env, timeout=900)
    assert r.returncode == 0, r.stderr.decode()[-2000:]
    return r.stdout


def test_sort_route_byte_equal(rng):
    docs = mutated_collection(rng, 4, base_len=500)
    want = _run(docs, "0")
    got = _run(docs, "1")
    assert want and want == got


def test_sort_route_direct_backend(rng):
    docs = mutated_collection(rng, 3, base_len=400)
    want = _run(docs, "0", backend="direct")
    got = _run(docs, "1", backend="direct")
    assert want and want == got


def test_route_set_unit():
    import jax.numpy as jnp
    from mumemto_tpu.ops.suffix import route_set
    rng = np.random.default_rng(0)
    n = 257
    perm = rng.permutation(n).astype(np.int32)
    v1 = rng.integers(0, 1 << 30, n).astype(np.int32)
    v2 = rng.integers(0, 1 << 30, n).astype(np.uint32)
    out = np.asarray(route_set(jnp.asarray(perm), jnp.asarray(v1)))
    want = np.zeros(n, np.int32)
    want[perm] = v1
    np.testing.assert_array_equal(out, want)
    o1, o2 = route_set(jnp.asarray(perm), jnp.asarray(v1), jnp.asarray(v2))
    want2 = np.zeros(n, np.uint32)
    want2[perm] = v2
    np.testing.assert_array_equal(np.asarray(o1), want)
    np.testing.assert_array_equal(np.asarray(o2), want2)
