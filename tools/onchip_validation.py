"""Round-3/4 component validation on the REAL chip (VERDICT r3 item 5).

The CPU-mesh suite proves multi-device byte-equality on virtual devices;
this runs the same components on the actual TPU — a single chip, so the
meshes are 1-device, which still exercises the real compiler/runtime
(Mosaic-free XLA path), the real gather/sort units, and the uint32 wide
arithmetic on hardware.

Checks (each byte-compared to the single-device engine on the same data):
  1. forced-wide block scan (parallel/widepfp, uint32 coordinates)
  2. sharded dict index composed with the block scan (parallel/sharddict)
  3. collective anchor merge (parallel/collective_merge) vs the host fold
  4. MEM mode + merge metadata through the block scan

Prints one PASS/FAIL line per check plus wall times; exits nonzero on any
FAIL. Run: python tools/onchip_validation.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from mumemto_tpu import engine, options, refbuilder

FAILED = []


def check(name, fn):
    t0 = time.time()
    try:
        fn()
        print(f"PASS {name} ({time.time() - t0:.1f}s)", flush=True)
    except Exception as exc:  # noqa: BLE001 — report-all validation tool
        FAILED.append(name)
        print(f"FAIL {name} ({time.time() - t0:.1f}s): {exc!r}", flush=True)


def _collection(n_docs=6, base_len=120_000, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 4, base_len, dtype=np.int8)
    acgt = np.frombuffer(b"ACGT", dtype=np.uint8)
    docs = []
    for _ in range(n_docs):
        s = base.copy()
        pos = rng.integers(0, base_len, max(1, base_len // 1000))
        s[pos] = (s[pos] + rng.integers(1, 4, pos.size)) % 4
        docs.append([bytes(acgt[s])])
    return refbuilder.build_from_sequences(docs)


def main():
    dev = jax.devices()[0]
    print(f"device: {dev} ({dev.platform})", flush=True)
    if dev.platform == "cpu":
        raise SystemExit("refusing to validate on the CPU fallback")
    mesh = jax.sharding.Mesh(np.asarray(jax.devices()[:1]), ("seq",))
    rb = _collection()
    opts = options.normalize(rb.num_docs, quiet=True)
    t0 = time.time()
    ref = engine.find_matches(rb, opts, show_progress=False).output_bytes()
    print(f"single-device reference: {len(ref)} bytes "
          f"({time.time() - t0:.1f}s)", flush=True)
    assert ref

    def wide():
        from mumemto_tpu.parallel import widepfp
        got = widepfp.find_matches_wide(rb, opts, mesh).output_bytes()
        assert got == ref, "wide block scan != single-device bytes"

    def sharddict_wide():
        from mumemto_tpu.parallel import widepfp
        got = widepfp.find_matches_wide(
            rb, opts, mesh, shard_dict=True).output_bytes()
        assert got == ref, "sharded-dict block scan != single-device bytes"

    def mem_merge_wide():
        from mumemto_tpu.parallel import widepfp
        mopts = options.normalize(rb.num_docs, rare_freq=3, quiet=True)
        want = engine.find_matches(rb, mopts,
                                   show_progress=False).output_bytes()
        got = widepfp.find_matches_wide(rb, mopts, mesh).output_bytes()
        assert want and got == want, "wide MEM scan != single-device bytes"

    def collective():
        import tempfile

        from mumemto_tpu import cli, formats
        from mumemto_tpu.parallel import collective_merge
        rng = np.random.default_rng(3)
        base = "".join(rng.choice(list("ACGT"), 4000))
        def mut(k):
            s = list(base)
            r = np.random.default_rng(k)
            for _ in range(8):
                s[int(r.integers(0, len(s)))] = str(r.choice(list("ACGT")))
            return "".join(s)
        with tempfile.TemporaryDirectory() as td:
            paths = []
            for i in range(6):
                p = os.path.join(td, f"g{i}.fa")
                with open(p, "w") as f:
                    f.write(f">g{i}\n{mut(i)}\n")
                paths.append(p)
            p1 = os.path.join(td, "p1")
            p2 = os.path.join(td, "p2")
            assert cli.main([paths[0]] + paths[1:3] +
                            ["-o", p1, "-M", "-n"]) == 0
            assert cli.main([paths[0]] + paths[3:] +
                            ["-o", p2, "-M", "-n"]) == 0
            host_out = os.path.join(td, "host.mums")
            dev_out = os.path.join(td, "dev.mums")
            assert cli.main(["merge", p1 + ".mums", p2 + ".mums",
                             "-o", host_out]) == 0
            collective_merge.collective_anchor_merge(
                [p1 + ".mums", p2 + ".mums"], dev_out)
            with open(host_out, "rb") as f:
                want = f.read()
            with open(dev_out, "rb") as f:
                got = f.read()
            assert want and got == want, "collective merge != host fold"

    check("wide block scan (u32, 1-chip mesh)", wide)
    check("sharded dict index + block scan", sharddict_wide)
    check("wide MEM mode (-f 3)", mem_merge_wide)
    check("collective anchor merge vs host fold", collective)
    if FAILED:
        raise SystemExit(f"FAILED: {FAILED}")
    print("all on-chip validations passed", flush=True)


if __name__ == "__main__":
    main()
