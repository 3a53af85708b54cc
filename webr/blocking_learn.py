"""Learned-blocking experiment (SURVEY §2.9 M4, §2.4 A10/A11; ref
train_blocking.py:14-49 metrics, :81-263 CNF and DNF schemes with
multiple gain functions, :266-445 greedy learner).

The reference greedily assembles a DNF (union of predicates) or CNF
(intersection of predicates) blocking scheme over labeled author pairs,
scoring each candidate scheme by a gain function over Reduction Ratio and
Pairs Completeness. Here the conditional counts per candidate predicate
run as Spark boolean aggregates in ONE pass per greedy step (ref computes
them with pandas column ops, :270-302); the greedy loop itself stays
driver-side exactly like the reference's.

Gain functions (ref :14-49 exposes several; same three shapes):
  "f"        harmonic mean of RR and PC (the default),
  "weighted" alpha*RR + (1-alpha)*PC,
  "rr_at_pc" RR subject to PC >= min_pc (infeasible schemes rank by PC
             below every feasible one).

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


def _gain(rr: float, pc: float, gain: str = "f", min_pc: float = 0.9,
          alpha: float = 0.5) -> float:
    if gain == "f":
        return _f(rr, pc)
    if gain == "weighted":
        return alpha * rr + (1.0 - alpha) * pc
    if gain == "rr_at_pc":
        return rr if pc >= min_pc else pc - 1.0
    raise ValueError(f"unknown gain {gain!r}")


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


def oversample_minority(pairs: DataFrame, label_col: str = "match",
                        max_factor: int = 100) -> DataFrame:
    """M2 (ref train_rf.py's minority oversampling before fitting):
    replicate minority-class rows floor(majority/minority) times so the
    classes roughly balance. Deterministic (no RNG — every minority row
    replicates the same integer factor) and distributed (explode over a
    sequence; no collect). ``max_factor`` caps pathological imbalance."""
    row = pairs.agg(
        F.sum(F.col(label_col).cast("long")).alias("pos"),
        F.count("*").alias("n")).collect()[0]
    pos = row["pos"] or 0  # sum over zero rows is NULL
    neg = row["n"] - pos
    if pos == 0 or neg == 0 or pos == neg:
        return pairs
    minority_is_pos = pos < neg
    k = min(max(neg, pos) // min(pos, neg), max_factor)
    if k <= 1:
        return pairs
    is_min = F.col(label_col) if minority_is_pos else ~F.col(label_col)
    minority = (pairs.where(is_min)
                .withColumn("_dup", F.explode(
                    F.sequence(F.lit(1), F.lit(int(k)))))
                .drop("_dup"))
    return pairs.where(~is_min).unionByName(minority)


def _learn_greedy(pairs: DataFrame, candidate_preds: list[str],
                  combine, seed_expr, seed_rr_pc, match_col: str,
                  max_terms: int, min_gain: float, gain: str,
                  min_pc: float, alpha: float) -> list[SchemeEval]:
    """Shared greedy loop: at each step add the predicate whose
    ``combine`` (| for DNF, & for CNF) with the current scheme maximizes
    the gain function; stop when no candidate improves by min_gain or
    max_terms is reached. Returns the eval after each added term (last
    entry = final scheme). One Spark aggregation per step evaluates ALL
    remaining candidates at once."""
    chosen: list[str] = []
    cur = seed_expr
    cur_g = _gain(*seed_rr_pc, gain, min_pc, alpha)
    steps: list[SchemeEval] = []
    remaining = list(candidate_preds)
    while remaining and len(chosen) < max_terms:
        aggs = [F.count("*").alias("n"),
                F.sum(F.col(match_col).cast("long")).alias("pos")]
        for i, p in enumerate(remaining):
            u = combine(cur, F.col(p))
            aggs.append(F.sum(u.cast("long")).alias(f"c{i}"))
            aggs.append(F.sum((u & F.col(match_col)).cast("long"))
                        .alias(f"cp{i}"))
        row = pairs.agg(*aggs).collect()[0]
        n, pos = row["n"], row["pos"]
        best_i, best, best_g = -1, None, None
        for i in range(len(remaining)):
            rr = 1.0 - row[f"c{i}"] / n if n else 0.0
            pc = row[f"cp{i}"] / pos if pos else 1.0
            g = _gain(rr, pc, gain, min_pc, alpha)
            if best is None or g > best_g:
                best_i = i
                best_g = g
                best = SchemeEval(chosen + [remaining[i]], rr, pc,
                                  _f(rr, pc))
        if best is None or best_g <= cur_g + min_gain:
            break
        chosen.append(remaining.pop(best_i))
        cur = combine(cur, F.col(chosen[-1]))
        cur_g = best_g
        steps.append(best)
    return steps


def learn_dnf(pairs: DataFrame, candidate_preds: list[str],
              match_col: str = "match", max_terms: int = 4,
              min_gain: float = 1e-9, gain: str = "f",
              min_pc: float = 0.9, alpha: float = 0.5) -> list[SchemeEval]:
    """Greedy DNF (union-of-predicates) scheme — candidate pair iff ANY
    chosen predicate holds (ref train_blocking.py:266-445)."""
    # empty DNF admits nothing: rr=1, pc=0
    return _learn_greedy(pairs, candidate_preds, lambda a, b: a | b,
                         F.lit(False), (1.0, 0.0), match_col, max_terms,
                         min_gain, gain, min_pc, alpha)


def learn_cnf(pairs: DataFrame, candidate_preds: list[str],
              match_col: str = "match", max_terms: int = 4,
              min_gain: float = 1e-9, gain: str = "f",
              min_pc: float = 0.9, alpha: float = 0.5) -> list[SchemeEval]:
    """Greedy CNF (intersection-of-predicates) scheme — candidate pair iff
    EVERY chosen predicate holds (ref train_blocking.py:81-263's CNF
    variant): starts from the all-pairs scheme and conjoins the predicate
    with the best gain each step, trading PC for RR."""
    # empty CNF admits everything: rr=0, pc=1
    return _learn_greedy(pairs, candidate_preds, lambda a, b: a & b,
                         F.lit(True), (0.0, 1.0), match_col, max_terms,
                         min_gain, gain, min_pc, alpha)
