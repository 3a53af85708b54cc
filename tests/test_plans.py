"""Physical-plan property tests for the pipeline stages (SURVEY §4).

These assert the *shape* of the plans Catalyst produces — the properties
that decide whether the job survives a 100 TB input — without executing
anything: no cartesian products, the cogroup pair-scorer lowers to
FlatMapCoGroupsInArrow (not a join), the huge-vocab idf attach
broadcasts the idf side, and parquet scans prune columns.
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("extended")
    return buf.getvalue()


@pytest.fixture(scope="module")
def stage_frames(spark, pages_df):
    from webr.engine import (build_idf, build_mention_feats, build_mentions,
                             build_pair_scores_grouped, build_pairs)
    mentions = build_mentions(pages_df)
    idf = build_idf(mentions, 100)
    feats = build_mention_feats(mentions, idf, vocab_rows=10**12)  # join path
    pairs = build_pairs(mentions)
    scores = build_pair_scores_grouped(pairs, feats)
    return {"mentions": mentions, "idf": idf, "feats": feats,
            "pairs": pairs, "scores": scores}


def test_no_cartesian_anywhere(stage_frames):
    for name, df in stage_frames.items():
        assert "CartesianProduct" not in _plan(df), name


def test_pair_scoring_is_cogroup_not_join(stage_frames):
    """The pair scorer must lower to a cogroup (each mention's weight
    arrays cross the shuffle once per block) — if this ever regresses to
    a plan that joins mention_feats onto pairs per side, the fat-array
    payload re-amplifies by the pair degree."""
    plan = _plan(stage_frames["scores"])
    assert ("FlatMapCoGroupsInArrow" in plan
            or "FlatMapCoGroupsInPandas" in plan)


def test_idf_join_fallback_broadcasts(stage_frames):
    """Huge-vocab path: the token->idf attach must broadcast the idf
    (vocab) side, not shuffle the exploded token stream into a
    sort-merge join."""
    plan = _plan(stage_frames["feats"])
    assert "broadcast" in plan.lower()


def test_mentions_scan_prunes_columns(spark, pages_df, tmp_path):
    """build_mentions must read only url/html/text/warc_ts from a parquet
    pages table — lang pruned at the scan (warc_ts is consumed since v8:
    it feeds the F10/F11-analog pair features)."""
    from webr.engine import build_mentions
    p = str(tmp_path / "pages")
    pages_df.write.parquet(p)
    plan = _plan(build_mentions(spark.read.parquet(p)))
    scan = plan[plan.rindex("FileScan"):].splitlines()[0]
    assert "url" in scan and "html" in scan and "warc_ts" in scan
    assert "lang" not in scan


def test_pairs_small_blocks_equijoin(stage_frames):
    """Candidate generation joins on the block key (equi-join); the
    mega-block side is a window, so no join in the plan may be
    cartesian or nested-loop on a non-equi predicate only."""
    plan = _plan(stage_frames["pairs"])
    assert "BroadcastNestedLoopJoin" not in plan
