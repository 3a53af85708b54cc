"""Cannot-link constraint for transitive clustering (SURVEY §2.5 W2, §2.8
C2): pure connected components can transitively merge two name-INCOMPATIBLE
mentions through an initial-only middleman ("J Smith" bridges "John Smith"
and "Jane Smith"). The reference prevents this twice: the greedy neighbor
filter rejects a candidate unless it is similar to ALL already-kept
neighbors (dao/author_block.py:488-498), and cluster expansion re-checks
candidates against current cluster members (clustering/dbscan.py:49-60).

Distributed re-expression: run unconstrained CC first (cheap, bounds the
work), then replay each component's edges through a constrained union-find
— an edge merges two sub-clusters only if EVERY cross pair of their name
signatures is compatible, so every final cluster is all-pairs
name-consistent (the invariant the reference's greedy maintains
order-sensitively; here the order is the sorted edge list, deterministic
across engines, partitionings and reruns).

Cost: signatures are sets of distinct (first, middle) variants — a handful
per entity — so each merge check is O(|sig_a| * |sig_b|), not
O(|cluster_a| * |cluster_b|). Components are entity-sized by construction
(blocking + scoring), so per-component replay parallelizes across
components with no skew wall.

Shared kernel: the NumPy oracle calls ``constrained_components`` directly;
the engine calls it inside a per-component ``applyInPandas``
(webr/cluster.py). Same code, same edge order -> identical clusters.
"""

from __future__ import annotations

from webr.textproc import names_compatible


def _sig_compatible(sig_a: frozenset, sig_b: frozenset) -> bool:
    """All cross pairs of name variants compatible (first, middle)."""
    for fa, ma in sig_a:
        for fb, mb in sig_b:
            if not names_compatible(fa, ma, fb, mb):
                return False
    return True


def constrained_components(
        names: dict[str, tuple[str, str]],
        edges: list[tuple[str, str]]) -> dict[str, str]:
    """names: url -> (first, middle); edges: candidate links (score-passed).
    Returns url -> representative (min url of its constrained sub-cluster)
    for every url in ``names``. Edges whose endpoints lack a names entry
    are ignored (defensive: membership and edges derive from one frame).

    Union-by-min + path compression; edges processed in sorted order so the
    greedy outcome is deterministic. A union is SKIPPED when the merged
    cluster would contain an incompatible name pair — the cannot-link
    replay of ref dao/author_block.py:488-498."""
    parent: dict[str, str] = {u: u for u in names}
    sig: dict[str, frozenset] = {
        u: frozenset([fm]) for u, fm in names.items()}

    def find(x: str) -> str:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in sorted(edges):
        if a not in parent or b not in parent:
            continue
        ra, rb = find(a), find(b)
        if ra == rb:
            continue
        if not _sig_compatible(sig[ra], sig[rb]):
            continue
        if rb < ra:
            ra, rb = rb, ra
        parent[rb] = ra
        sig[ra] = sig[ra] | sig.pop(rb)
    return {u: find(u) for u in names}
