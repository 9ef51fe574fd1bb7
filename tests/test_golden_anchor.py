"""Golden-anchor assertions against the reference's committed output.

The reference repo commits its de-facto golden output —
``data/scores.csv`` (1,902 test-week rows; docs/submission.md:35) —
but not the raw/cleaned inputs, so a full replay is impossible. What
CAN be pinned cheaply, and is pinned here:

- the 6-column output contract (names, order, types) that
  ``pipeline/scores.py::compute_scores`` must keep producing;
- the committed file's shape and value envelopes, which double as
  evidence for semantics learned by test: the max recovery score
  1.1293... exceeds 1.0, proving the interception multiplier in the
  reference CODE (1.2, src/metrics/recovery.py:49-57) over its
  docstring's 2x (which would allow values up to 2.0 that never
  occur — and 1.2 bounds them exactly);
- that the engine's scores, on the synthetic fixture, land inside the
  same envelopes.
"""

from __future__ import annotations

import csv
import os
from pathlib import Path

import pytest

GOLDEN = Path("/root/reference/data/scores.csv")

EXPECTED_COLUMNS = [
    "game_id",
    "play_id",
    "defender_id",
    "receiver_id",
    "deception_score",
    "recovery_score",
]

pytestmark = pytest.mark.skipif(
    not GOLDEN.exists(), reason="reference golden scores not mounted"
)


def _golden_rows() -> list[dict]:
    with open(GOLDEN, newline="") as f:
        return list(csv.DictReader(f))


def test_golden_file_contract():
    rows = _golden_rows()
    # docs/submission.md:35 — 1,902 testing plays, one score row each
    assert len(rows) == 1902
    with open(GOLDEN, newline="") as f:
        header = next(csv.reader(f))
    assert header == EXPECTED_COLUMNS
    # ids are integral, scores parse as floats, nothing null
    for r in rows[:50] + rows[-50:]:
        for c in EXPECTED_COLUMNS[:4]:
            assert r[c] == str(int(r[c]))
        float(r["deception_score"])
        float(r["recovery_score"])
    # (game_id, play_id) is a key: one scored play per row
    keys = {(r["game_id"], r["play_id"]) for r in rows}
    assert len(keys) == len(rows)


def test_golden_envelopes_pin_recovery_multiplier():
    rows = _golden_rows()
    rec = [float(r["recovery_score"]) for r in rows]
    dec = [float(r["deception_score"]) for r in rows]
    # recovery = -p | 1-p | 1.2*(1-p) with p in [0,1]: bound [-1, 1.2].
    assert -1.0 <= min(rec) and max(rec) <= 1.2
    # the data exceeds 1.0 — only possible with a multiplier > 1 on
    # interceptions, ruling the docstring's plain (1-p) out, and stays
    # under 1.2, ruling the docstring's 2x out of being needed.
    assert max(rec) > 1.0
    # deception = mean(post)-mean(pre) of a probability series: [-1,1]
    assert -1.0 <= min(dec) and max(dec) <= 1.0


def test_engine_scores_match_golden_contract(spark):
    """compute_scores output: identical column contract, values inside
    the golden envelopes, 1.2 multiplier observable end-to-end."""
    from fixtures_nfl import make_inference_results

    from big_data_bowl_2026_analytics_spark.pipeline.scores import compute_scores
    from big_data_bowl_2026_analytics_spark.schemas import INFERENCE_RESULTS_SCHEMA

    results = spark.createDataFrame(
        [
            tuple(r[f.name] for f in INFERENCE_RESULTS_SCHEMA.fields)
            for r in make_inference_results()
        ],
        INFERENCE_RESULTS_SCHEMA,
    )
    out = compute_scores(results)
    assert [f.name for f in out.schema.fields] == EXPECTED_COLUMNS
    types = {f.name: f.dataType.typeName() for f in out.schema.fields}
    for c in EXPECTED_COLUMNS[:4]:
        assert types[c] in ("long", "integer"), (c, types[c])
    for c in EXPECTED_COLUMNS[4:]:
        assert types[c] == "double", (c, types[c])
    rows = out.collect()
    assert all(-1.0 <= r["recovery_score"] <= 1.2 for r in rows)
    assert all(-1.0 <= r["deception_score"] <= 1.0 for r in rows)
    # fixture play 2 is an interception at p=0.55: exactly 1.2*(1-p),
    # which is > 1-p and < 2*(1-p) — the multiplier pinned end-to-end
    by_play = {r["play_id"]: r for r in rows}
    assert by_play[2]["recovery_score"] == pytest.approx(1.2 * (1 - 0.55))
