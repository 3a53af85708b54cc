"""Learned-blocking experiment (SURVEY §2.9 M4, §2.4 A10/A11; ref
train_blocking.py:14-49 metrics, :266-445 greedy DNF learner).

The reference greedily assembles a DNF of cheap boolean predicates over
labeled author pairs, scoring each candidate scheme by the harmonic mean of
Reduction Ratio and Pairs Completeness. Here the conditional counts per
candidate predicate run as Spark boolean aggregates in ONE pass per greedy
step (ref computes them with pandas column ops, :270-302); the greedy loop
itself stays driver-side exactly like the reference's.

Input: a DataFrame of labeled candidate pairs with boolean predicate
columns and a boolean match column. Works unchanged at any scale — each
step is a single map-side-combinable aggregation over the pair table.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


@dataclass
class SchemeEval:
    predicates: list[str]   # DNF: pair is a candidate if ANY holds
    rr: float               # reduction ratio  = 1 - |cand| / |all|
    pc: float               # pairs completeness = |cand ∧ match| / |match|
    f: float                # harmonic mean (ref train_blocking.py:46-49)


def _f(rr: float, pc: float) -> float:
    return 2 * rr * pc / (rr + pc) if (rr + pc) > 0 else 0.0


def evaluate_scheme(pairs: DataFrame, predicates: list[str],
                    match_col: str = "match") -> SchemeEval:
    """RR / PC / F of one DNF scheme (ref train_blocking.py:14-49)."""
    cand = F.lit(False)
    for p in predicates:
        cand = cand | F.col(p)
    row = pairs.agg(
        F.count("*").alias("n"),
        F.sum(F.col(match_col).cast("long")).alias("pos"),
        F.sum(cand.cast("long")).alias("cand"),
        F.sum((cand & F.col(match_col)).cast("long")).alias("cand_pos"),
    ).collect()[0]
    rr = 1.0 - row["cand"] / row["n"] if row["n"] else 0.0
    pc = row["cand_pos"] / row["pos"] if row["pos"] else 1.0
    return SchemeEval(list(predicates), rr, pc, _f(rr, pc))


def learn_dnf(pairs: DataFrame, candidate_preds: list[str],
              match_col: str = "match", max_terms: int = 4,
              min_gain: float = 1e-9) -> list[SchemeEval]:
    """Greedy DNF construction: at each step add the predicate whose union
    with the current scheme maximizes F; stop when no candidate improves F
    by min_gain or max_terms is reached. Returns the eval after each added
    term (last entry = final scheme). One Spark aggregation per step
    evaluates ALL remaining candidates at once."""
    chosen: list[str] = []
    cur = F.lit(False)
    cur_f = 0.0
    steps: list[SchemeEval] = []
    remaining = list(candidate_preds)
    while remaining and len(chosen) < max_terms:
        aggs = [F.count("*").alias("n"),
                F.sum(F.col(match_col).cast("long")).alias("pos")]
        for i, p in enumerate(remaining):
            u = cur | F.col(p)
            aggs.append(F.sum(u.cast("long")).alias(f"c{i}"))
            aggs.append(F.sum((u & F.col(match_col)).cast("long"))
                        .alias(f"cp{i}"))
        row = pairs.agg(*aggs).collect()[0]
        n, pos = row["n"], row["pos"]
        best_i, best = -1, None
        for i in range(len(remaining)):
            rr = 1.0 - row[f"c{i}"] / n if n else 0.0
            pc = row[f"cp{i}"] / pos if pos else 1.0
            f = _f(rr, pc)
            if best is None or f > best.f:
                best_i = i
                best = SchemeEval(chosen + [remaining[i]], rr, pc, f)
        if best is None or best.f <= cur_f + min_gain:
            break
        chosen.append(remaining.pop(best_i))
        cur = cur | F.col(chosen[-1])
        cur_f = best.f
        steps.append(best)
    return steps
