"""Blank-node-invariant RDF graph isomorphism for the test harness.

The reference compares positive toRdf cases with ``assert_rdf_isomorphic``
(test/acceptance/w3c/to_rdf_test.exs:75-87). We implement deterministic
iterative color refinement with small-scale backtracking — sufficient for
suite-sized graphs (SURVEY.md §7 hard part 7), not full URDNA2015.
"""

from __future__ import annotations

import hashlib
from itertools import permutations


def _ground(term: tuple) -> tuple:
    return term if term[0] != "bnode" else ("bnode",)


def _signature(quads: list[tuple]) -> set:
    """Quads with bnodes erased — quick necessary condition."""
    return {
        (_ground(s), _ground(p), _ground(o), _ground(g) if g else None)
        for s, p, o, g in quads
    }


def _bnodes(quads: list[tuple]) -> set[str]:
    out = set()
    for q in quads:
        for t in q:
            if t is not None and t[0] == "bnode":
                out.add(t[1])
    return out


def _refine(quads: list[tuple], labels: set[str]) -> dict[str, str]:
    """Iterative hash refinement: color each bnode by its neighborhood."""
    colors = {b: "" for b in labels}
    for _ in range(len(labels) + 2):
        new = {}
        for b in labels:
            parts = []
            for s, p, o, g in quads:
                row = []
                for pos, t in (("s", s), ("p", p), ("o", o), ("g", g)):
                    if t is None:
                        row.append("∅")
                    elif t[0] == "bnode":
                        row.append(f"{pos}:{colors[t[1]]}" if t[1] != b else f"{pos}:SELF")
                    else:
                        row.append(repr(t))
                if any(t is not None and t[0] == "bnode" and t[1] == b for t in (s, p, o, g)):
                    parts.append("|".join(row))
            parts.sort()
            new[b] = hashlib.sha256("\n".join(parts).encode()).hexdigest()
        if new == colors:
            break
        colors = new
    return colors


def _canonical(quads: list[tuple], mapping: dict[str, str]) -> frozenset:
    def m(t):
        if t is None:
            return None
        if t[0] == "bnode":
            return ("bnode", mapping[t[1]])
        return t

    return frozenset((m(s), m(p), m(o), m(g)) for s, p, o, g in quads)


def isomorphic(a: list[tuple], b: list[tuple]) -> bool:
    a, b = list(set(a)), list(set(b))
    if len(a) != len(b):
        return False
    if _signature(a) != _signature(b):
        return False
    ba, bb = _bnodes(a), _bnodes(b)
    if len(ba) != len(bb):
        return False
    if not ba:
        return set(a) == set(b)

    ca, cb = _refine(a, ba), _refine(b, bb)
    if sorted(ca.values()) != sorted(cb.values()):
        return False

    # group by color; unique colors map directly, ambiguous groups get
    # brute-force permutation (suite graphs keep these tiny)
    groups_a: dict[str, list[str]] = {}
    groups_b: dict[str, list[str]] = {}
    for n, c in ca.items():
        groups_a.setdefault(c, []).append(n)
    for n, c in cb.items():
        groups_b.setdefault(c, []).append(n)

    ambiguous = [(sorted(groups_a[c]), sorted(groups_b[c])) for c in groups_a if len(groups_a[c]) > 1]
    base_map = {groups_a[c][0]: groups_b[c][0] for c in groups_a if len(groups_a[c]) == 1}

    if not ambiguous:
        mapping = dict(base_map)
        return _apply(a, mapping) == set(b)

    # bound the product of permutations; refuse pathological cases
    total = 1
    for ga, _ in ambiguous:
        total *= max(1, _fact(len(ga)))
        if total > 50000:
            return _canonical(a, ca) == _canonical(b, cb)  # best effort

    return _search(a, set(b), base_map, ambiguous, 0)


def _fact(n: int) -> int:
    r = 1
    for i in range(2, n + 1):
        r *= i
    return r


def _search(a, b_set, mapping, ambiguous, idx) -> bool:
    if idx == len(ambiguous):
        return _apply(a, mapping) == b_set
    ga, gb = ambiguous[idx]
    for perm in permutations(gb):
        m2 = dict(mapping)
        m2.update(zip(ga, perm))
        if _search(a, b_set, m2, ambiguous, idx + 1):
            return True
    return False


def _apply(quads, mapping) -> set:
    def m(t):
        if t is None:
            return None
        if t[0] == "bnode":
            return ("bnode", mapping.get(t[1], t[1]))
        return t

    return {(m(s), m(p), m(o), m(g)) for s, p, o, g in quads}
