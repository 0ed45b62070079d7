"""Progress bar: stage names track the real phase emissions, bar renders,
and library calls / failures never leak the module-global bar."""

import numpy as np
import pytest

from mumemto_tpu import engine, options, progress, refbuilder
from tests.conftest import mutated_collection


def test_stage_names_cover_pipeline(rng, monkeypatch, capsys):
    """Every pipeline phase that fires during a run must advance the bar
    (a renamed/fused phase otherwise silently freezes it — the _STAGES
    table is name-matched)."""
    monkeypatch.setenv("MUMEMTO_TPU_PROGRESS", "1")
    seen = []
    orig_advance = progress.PhaseBar.advance

    def spy(self, stage):
        before = self.frac
        orig_advance(self, stage)
        seen.append((stage, self.frac > before or self.frac == 1.0))

    monkeypatch.setattr(progress.PhaseBar, "advance", spy)
    docs = mutated_collection(rng, 3, base_len=300)
    rb = refbuilder.build_from_sequences(docs)
    opts = options.normalize(rb.num_docs, quiet=True)
    engine.find_matches(rb, opts)
    known = {name for name, _ in progress._STAGES}
    fired = {s for s, _ in seen}
    # the heavyweight stages must all have fired AND advanced the bar
    for stage in ("build_pfp", "dict_index", "parse_side",
                  "expand_analyze", "compact_readback"):
        assert stage in fired, f"phase {stage} never fired"
        assert stage in known, f"phase {stage} missing from _STAGES"
    # no fired stage that _STAGES silently ignores among the majors
    ignored = {s for s in fired if s not in known and not s.startswith(" ")}
    assert not ignored - {"ext_asarray", "ext_alphabet", "break_mask+count",
                          "break_compact+readback"}, ignored


def test_bar_released_on_failure(rng, monkeypatch):
    monkeypatch.setenv("MUMEMTO_TPU_PROGRESS", "1")
    rb = refbuilder.build_from_sequences(
        mutated_collection(rng, 2, base_len=200))
    opts = options.normalize(rb.num_docs, quiet=True)

    def boom(*a, **kw):
        raise RuntimeError("RESOURCE_EXHAUSTED (simulated)")

    monkeypatch.setattr(engine, "_find_matches_inner", boom)
    with pytest.raises(RuntimeError):
        engine.find_matches(rb, opts)
    assert progress.active() is None, "failed run leaked the active bar"


def test_disabled_without_env(rng, monkeypatch):
    monkeypatch.delenv("MUMEMTO_TPU_PROGRESS", raising=False)
    # non-tty stderr in tests => disabled
    assert progress.activate() is None
    assert progress.active() is None
