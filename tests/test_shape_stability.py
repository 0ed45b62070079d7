"""Different inputs in the same shape buckets must NOT trigger recompiles.

Compiles through the tunneled TPU cost minutes; any data-dependent static
(raw lengths, phrase counts, ...) leaking into a jit signature silently
recompiles the pipeline per dataset. This guards the contract.
"""

import logging

import numpy as np

from mumemto_tpu import engine, options, refbuilder
from tests.conftest import mutated_collection


def _run(rng, seed):
    docs = mutated_collection(np.random.default_rng(seed), 3, base_len=400)
    rb = refbuilder.build_from_sequences(docs)
    opts = options.normalize(rb.num_docs, quiet=True)
    return engine.find_matches(rb, opts).output_bytes()


def test_no_recompile_same_buckets(rng, caplog):
    import jax

    # warm all programs on the first collection
    assert _run(rng, 101)

    jax.config.update("jax_log_compiles", True)
    try:
        with caplog.at_level(logging.WARNING, logger="jax._src.dispatch"):
            assert _run(rng, 202)  # different data, same-size buckets
    finally:
        jax.config.update("jax_log_compiles", False)
    # programs whose statics legitimately adapt to the data's max phrase
    # length (depth caps); their variant count is O(log maxlen) and each
    # lands in the persistent cache
    adaptive = ("_suffix_array_impl", "_lcp_impl")
    compiled = [r.getMessage() for r in caplog.records
                if "Finished XLA compilation" in r.getMessage()
                and not any(a in r.getMessage() for a in adaptive)]
    assert not compiled, f"unexpected recompiles: {compiled}"
