#!/usr/bin/env python
"""Implementation-report generator over W3C-style test manifests.

Counterpart of the reference's report binary (testsuite/src/main.rs:11-56):
point it at a suite root + manifest URL (or one of the shorthand suite names)
and it walks the manifest with rio_spark.testing.manifest, runs every parser
test, and prints one EARL-ish line per test plus a JSON summary — the format
CI can diff. The W3C rdf-tests shorthands resolve once that suite is vendored
(same layout the reference consumes); the serd/rio suites shipped with the
reference snapshot work today:

    python jobs/conformance_report.py serd-good
    python jobs/conformance_report.py serd-bad
    python jobs/conformance_report.py rio
    python jobs/conformance_report.py <root_path> <manifest_url> <url_prefix>
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from rio_spark.testing.manifest import (  # noqa: E402
    KNOWN_DIVERGENCES,
    run_manifest,
    url_mapper,
)

TESTSUITE = Path("/root/reference/testsuite")

SUITES = {
    # in-repo W3C-style suite (tests/w3c_style) — always available, no
    # reference checkout needed
    "w3c-style": (Path(__file__).resolve().parent.parent / "tests" / "w3c_style",
                  "http://rio-spark.test/w3c-style",
                  "http://rio-spark.test/w3c-style/manifest.ttl"),
    "serd-good": (TESTSUITE / "serd-tests", "http://drobilla.net/sw/serd/test",
                  "http://drobilla.net/sw/serd/test/good/manifest.ttl"),
    "serd-bad": (TESTSUITE / "serd-tests", "http://drobilla.net/sw/serd/test",
                 "http://drobilla.net/sw/serd/test/bad/manifest.ttl"),
    "rio": (TESTSUITE / "rio-tests", "http://rio.test",
            "http://rio.test/manifest.ttl"),
    # W3C rdf-tests shorthands (reference main.rs:21-26); vendor the suite at
    # <root>/rdf-tests for these to resolve
    "nt": (TESTSUITE / "rdf-tests", "http://w3c.github.io/rdf-tests",
           "http://w3c.github.io/rdf-tests/ntriples/manifest.ttl"),
    "nq": (TESTSUITE / "rdf-tests", "http://w3c.github.io/rdf-tests",
           "http://w3c.github.io/rdf-tests/nquads/manifest.ttl"),
    "ttl": (TESTSUITE / "rdf-tests", "http://w3c.github.io/rdf-tests",
            "http://w3c.github.io/rdf-tests/turtle/manifest.ttl"),
    "trig": (TESTSUITE / "rdf-tests", "http://w3c.github.io/rdf-tests",
             "http://w3c.github.io/rdf-tests/trig/manifest.ttl"),
    "rdf": (TESTSUITE / "rdf-tests", "http://w3c.github.io/rdf-tests",
            "http://w3c.github.io/rdf-tests/rdf-xml/manifest.ttl"),
}


def main() -> int:
    args = sys.argv[1:]
    if len(args) == 1 and args[0] in SUITES:
        root, prefix, manifest_url = SUITES[args[0]]
    elif len(args) == 3:
        root, manifest_url, prefix = Path(args[0]), args[1], args[2]
    else:
        print(__doc__)
        return 2
    if not root.exists():
        print(f"suite root {root} not present (vendor it first)", file=sys.stderr)
        return 1
    outcomes = run_manifest(manifest_url, url_mapper(prefix, root))
    passed = skipped = 0
    for o in outcomes:
        if not o.passed and o.test.id in KNOWN_DIVERGENCES:
            print(f"{o.test.id}: skipped ({KNOWN_DIVERGENCES[o.test.id]})")
            skipped += 1
            continue
        status = "passed" if o.passed else f"failed: {o.detail}"
        print(f"{o.test.id}: {status}")
        passed += o.passed
    failed = len(outcomes) - passed - skipped
    print(json.dumps({
        "manifest": manifest_url,
        "total": len(outcomes),
        "passed": passed,
        "skipped_known_divergence": skipped,
        "failed": failed,
        "pass_rate": round(passed / (len(outcomes) - skipped), 4)
                     if len(outcomes) > skipped else None,
    }))
    return 0 if failed == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
