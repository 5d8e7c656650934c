"""Byte-level fuzz analogue of the reference's fuzz targets
(/root/reference/fuzz/fuzz_targets/{ntriples,nquads,turtle,trig,rdf_xml}.rs:
arbitrary bytes in, assert the parser never panics).

Here the contract is one notch stronger than "no panic": every kernel must
return ``(triples, error_rows)`` — malformed input becomes positioned error
ROWS, never an exception — because at 100 TB an uncaught exception in a
mapInPandas batch kills the task and, after retries, the job.

Strategy: seeded byte-level mutations (flip/insert/delete/duplicate/splice/
truncate, libfuzzer's classic menu) of real conformance-corpus documents,
decoded back to str with errors="replace" (parquet string columns are always
valid UTF-8, so str-level is exactly what production kernels can see).
Deterministic seeds — any crash found becomes a pinned regression case by
copying its (kernel, doc index, mutation seed) triple into
test_pinned_regressions.
"""

from __future__ import annotations

import random

import pytest

from rio_spark.kernels import (
    parse_generalized_nquads,
    parse_gtrig,
    parse_ntriples,
    parse_nquads,
    parse_rdfxml,
    parse_trig,
    parse_turtle,
)
from rio_spark.testing.corpus import load_corpus

KERNELS = {
    "ntriples": lambda t: parse_ntriples(t),
    "nquads": lambda t: parse_nquads(t),
    "turtle": lambda t: parse_turtle(t, base_iri="http://fuzz.example/"),
    "trig": lambda t: parse_trig(t, base_iri="http://fuzz.example/"),
    "rdfxml": lambda t: parse_rdfxml(t, base_iri="http://fuzz.example/"),
    # generalized kernels (S6/S7) share the sweep — the reference has no
    # dedicated fuzzer for them, but ours are separate code paths
    "gnq": parse_generalized_nquads,
    "gtrig": lambda t: parse_gtrig(t, base_iri="http://fuzz.example/"),
}

# cap mutated bodies: fuzz value is in boundary garbage, not megabytes of
# well-formed middle; keeps the 10k+ sweep under a couple of minutes
MAX_BODY = 2048


def _mutate(body: bytes, donor: bytes, rng: random.Random) -> bytes:
    op = rng.randrange(7)
    if not body:
        return donor[: rng.randrange(32)]
    if op == 0:  # flip random bytes
        b = bytearray(body)
        for _ in range(rng.randint(1, 8)):
            b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        return bytes(b)
    if op == 1:  # insert random bytes
        i = rng.randrange(len(body) + 1)
        junk = bytes(rng.randrange(256) for _ in range(rng.randint(1, 16)))
        return body[:i] + junk + body[i:]
    if op == 2:  # delete a span
        i = rng.randrange(len(body))
        j = min(len(body), i + rng.randint(1, 64))
        return body[:i] + body[j:]
    if op == 3:  # duplicate a span
        i = rng.randrange(len(body))
        j = min(len(body), i + rng.randint(1, 64))
        return body[:j] + body[i:j] + body[j:]
    if op == 4:  # splice with another document
        i = rng.randrange(len(body))
        k = rng.randrange(len(donor) + 1)
        return body[:i] + donor[k:]
    if op == 5:  # truncate mid-token
        return body[: rng.randrange(len(body))]
    # op == 6: stack several mutations
    out = body
    for _ in range(rng.randint(2, 5)):
        out = _mutate(out, donor, rng)
    return out


def _sweep(kernel_name: str, n_mutations: int, seed: int) -> int:
    parse = KERNELS[kernel_name]
    corpus = load_corpus()
    bodies = [d.body.encode("utf-8")[:MAX_BODY] for d in corpus]
    rng = random.Random(seed)
    n_error_docs = 0
    for i in range(n_mutations):
        body = bodies[i % len(bodies)]
        donor = bodies[rng.randrange(len(bodies))]
        mutated = _mutate(body, donor, rng).decode("utf-8", errors="replace")
        try:
            triples, errors = parse(mutated)
        except Exception as exc:  # pragma: no cover - the failure this pins
            pytest.fail(
                f"{kernel_name} kernel raised {type(exc).__name__} on mutation "
                f"#{i} (seed {seed}) of doc {corpus[i % len(corpus)].name}: {exc}"
            )
        assert isinstance(triples, list) and isinstance(errors, list)
        for e in errors:
            assert "line" in e and "msg" in e, f"unpositioned error row: {e}"
        n_error_docs += bool(errors)
    return n_error_docs


@pytest.mark.parametrize("kernel", sorted(KERNELS))
def test_fuzz_mutated_corpus_never_raises(kernel):
    """>=3000 seeded mutations per kernel (7 kernels -> >=21k docs total):
    error rows always, exceptions never; and the sweep must actually EXERCISE
    the error path (mutations that all parse clean would be a broken fuzzer,
    not a robust kernel)."""
    n_error_docs = _sweep(kernel, n_mutations=3000, seed=0xC0FFEE)
    assert n_error_docs > 100


def test_pinned_regressions():
    """Crashes the sweep has found, pinned forever.

    * gnq, seed 0xC0FFEE mutation #4 (truncate): a statement ending after
      its first term indexed past end-of-line in _parse_generalized_term.
    """
    triples, errors = parse_generalized_nquads("<foo>")
    assert triples == [] and len(errors) == 1 and errors[0]["line"] == 1
    triples, errors = parse_generalized_nquads("<a> <b>")
    assert triples == [] and len(errors) == 1


def test_fuzz_pure_garbage_never_raises():
    """The reference fuzzers also feed unstructured bytes (no corpus seed);
    mirror that with random printable/binary soup through every kernel."""
    rng = random.Random(1234)
    for i in range(700):
        n = rng.randrange(0, 400)
        raw = bytes(rng.randrange(256) for _ in range(n))
        text = raw.decode("utf-8", errors="replace")
        for name, parse in KERNELS.items():
            triples, errors = parse(text)
            assert isinstance(triples, list) and isinstance(errors, list)
