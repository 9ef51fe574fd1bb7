"""Bench-harness contract pieces that are testable without running the
bench: the oracle-bracket contamination probe (r13 verdict #2)."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import bracket_ratio_contaminated


def test_bracket_ratio_flags_divergence_both_directions():
    # BENCH_r13's live case: pre 4.387 s, post 10.146 s (2.31x).
    assert bracket_ratio_contaminated(4.387, 10.146)
    # Drift the other way (box busy during the PRE pass) flags too.
    assert bracket_ratio_contaminated(10.146, 4.387)


def test_bracket_ratio_passes_stable_brackets():
    # BENCH_r12's stable bracket: 3.843 / 3.403 (1.13x).
    assert not bracket_ratio_contaminated(3.843, 3.403)
    assert not bracket_ratio_contaminated(3.403, 3.843)
    # Exactly at the threshold is NOT contaminated (strict >).
    assert not bracket_ratio_contaminated(2.0, 3.0)


def test_bracket_ratio_degenerate_zero_is_not_flagged():
    # A failed/empty oracle pass (total 0) must not divide by zero or
    # mark the artifact — the errors field already reports it.
    assert not bracket_ratio_contaminated(0.0, 5.0)
    assert not bracket_ratio_contaminated(5.0, 0.0)
