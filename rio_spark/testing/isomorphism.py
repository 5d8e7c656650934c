"""Blank-node-renaming-invariant dataset equality (the conformance oracle).

Re-implements, in Python and from the published algorithm idea (signature
hashing to prune a backtracking search), the semantics of the reference's
``are_datasets_isomorphic`` (/root/reference/testsuite/src/isomorphism.rs:
45-280): two RDF datasets are isomorphic iff a bijection between their blank
nodes maps one quad set onto the other. Used only on small per-document
graphs (SURVEY.md §7.3), so worst-case exponential backtracking is bounded
in practice by the signature buckets.

Input quads are canonical N-Triples strings as produced by
``rio_spark.model.serialize_triples``.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from itertools import permutations


def _read_term(s: str, i: int):
    """Parse one canonical term starting at s[i] -> (tree, next_i).
    tree: plain str for ground terms, ('b', id), or ('t', s, p, o)."""
    if s.startswith("<< ", i):
        a, i = _read_term(s, i + 3)
        b, i = _read_term(s, i + 1)
        c, i = _read_term(s, i + 1)
        assert s.startswith(" >>", i), f"bad quoted triple at {i}: {s!r}"
        return ("t", a, b, c), i + 3
    if s.startswith("_:", i):
        j = i
        n = len(s)
        while j < n and s[j] != " ":
            j += 1
        return ("b", s[i:j]), j
    if s[i] == "<":
        j = s.index(">", i)
        return s[i : j + 1], j + 1
    if s[i] == '"':
        j = i + 1
        n = len(s)
        while j < n:
            if s[j] == "\\":
                j += 2
            elif s[j] == '"':
                j += 1
                break
            else:
                j += 1
        # lang / datatype suffix runs to the next space
        while j < n and s[j] != " ":
            j += 1
        return s[i:j], j
    raise ValueError(f"unreadable term at {i} in {s!r}")


def parse_canonical_term(s: str):
    t, i = _read_term(s, 0)
    assert i == len(s), f"trailing garbage in term: {s!r}"
    return t


def _normalize(quads) -> frozenset:
    out = set()
    for q in quads:
        row = tuple(parse_canonical_term(t) if t is not None else None for t in q)
        if len(row) == 3:
            row = row + (None,)
        out.add(row)
    return frozenset(out)


def _bnodes_of(tree, acc: set) -> None:
    if isinstance(tree, tuple):
        if tree[0] == "b":
            acc.add(tree[1])
        elif tree[0] == "t":
            for x in tree[1:]:
                _bnodes_of(x, acc)


def _subst(tree, mapping):
    if isinstance(tree, tuple):
        if tree[0] == "b":
            return ("b", mapping.get(tree[1], tree[1]))
        if tree[0] == "t":
            return ("t",) + tuple(_subst(x, mapping) for x in tree[1:])
    return tree


def _ground_view(tree, target: str):
    """Tree with `target` replaced by a marker and all other bnodes wildcarded —
    the per-bnode signature ingredient."""
    if isinstance(tree, tuple):
        if tree[0] == "b":
            return "§SELF" if tree[1] == target else "§BNODE"
        if tree[0] == "t":
            return ("t",) + tuple(_ground_view(x, target) for x in tree[1:])
    return tree


def _signatures(quads: frozenset, rounds: int = 2) -> dict[str, int]:
    """Iteratively refined neighborhood hashes for every blank node."""
    all_b: set[str] = set()
    for q in quads:
        for t in q:
            if t is not None:
                _bnodes_of(t, all_b)
    sig = {b: 0 for b in all_b}
    by_bnode: dict[str, list] = defaultdict(list)
    for q in quads:
        qb: set[str] = set()
        for t in q:
            if t is not None:
                _bnodes_of(t, qb)
        for b in qb:
            by_bnode[b].append(q)
    for _ in range(rounds):
        nxt = {}
        for b in all_b:
            items = []
            for q in by_bnode[b]:
                shape = tuple(_ground_view(t, b) if t is not None else None for t in q)
                other = tuple(sorted(sig[x] for x in _quad_bnodes(q) if x != b))
                items.append((shape, other))
            nxt[b] = hash(tuple(sorted(map(repr, items))))
        sig = nxt
    return sig


def _quad_bnodes(q) -> set[str]:
    acc: set = set()
    for t in q:
        if t is not None:
            _bnodes_of(t, acc)
    return acc


def are_isomorphic(quads_a, quads_b) -> bool:
    a, b = _normalize(quads_a), _normalize(quads_b)
    if len(a) != len(b):
        return False
    ba, bb = set(), set()
    for q in a:
        ba |= _quad_bnodes(q)
    for q in b:
        bb |= _quad_bnodes(q)
    if len(ba) != len(bb):
        return False
    # ground quads must match exactly
    ga = {q for q in a if not _quad_bnodes(q)}
    gb = {q for q in b if not _quad_bnodes(q)}
    if ga != gb:
        return False
    if not ba:
        return True
    sa, sb = _signatures(a), _signatures(b)
    if Counter(sa.values()) != Counter(sb.values()):
        return False
    buckets_a: dict[int, list[str]] = defaultdict(list)
    buckets_b: dict[int, list[str]] = defaultdict(list)
    for n, h in sa.items():
        buckets_a[h].append(n)
    for n, h in sb.items():
        buckets_b[h].append(n)
    na = {q for q in a if _quad_bnodes(q)}
    nb = {q for q in b if _quad_bnodes(q)}

    # backtrack over per-bucket bijections (permutation only within equal-hash
    # buckets, same pruning idea as the reference's search)
    hashes = sorted(buckets_a, key=lambda h: len(buckets_a[h]))

    def try_bucket(idx: int, mapping: dict[str, str]) -> bool:
        if idx == len(hashes):
            mapped = {tuple(_subst(t, mapping) if t is not None else None for t in q) for q in na}
            return mapped == nb
        h = hashes[idx]
        xs, ys = buckets_a[h], buckets_b[h]
        for perm in permutations(ys):
            mapping.update(zip(xs, perm))
            if try_bucket(idx + 1, mapping):
                return True
        for x in xs:
            mapping.pop(x, None)
        return False

    return try_bucket(0, {})


def precision_recall(emitted, golden) -> tuple[float, float]:
    """Set-based P/R for ground quads plus greedy isomorphic credit for
    bnode quads — used for the aggregate P/R >= 0.95 gate across many docs
    (per-doc exact isomorphism is checked separately where goldens exist)."""
    a, b = _normalize(emitted), _normalize(golden)
    if not a and not b:
        return 1.0, 1.0
    if are_isomorphic(emitted, golden):
        return 1.0, 1.0
    ga = {q for q in a if not _quad_bnodes(q)}
    gb = {q for q in b if not _quad_bnodes(q)}
    inter = len(ga & gb)
    # bnode quads: credit min counts per bnode-wildcarded shape
    wa = Counter(tuple(_ground_view(t, "") if t is not None else None for t in q)
                 for q in a - ga)
    wb = Counter(tuple(_ground_view(t, "") if t is not None else None for t in q)
                 for q in b - gb)
    inter += sum(min(wa[k], wb[k]) for k in wa.keys() & wb.keys())
    p = inter / len(a) if a else 0.0
    r = inter / len(b) if b else 0.0
    return p, r
