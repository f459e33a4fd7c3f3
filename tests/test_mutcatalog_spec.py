"""Fast mutation-catalog drift guard (r12 verdict item 7).

``tools/mutcheck.py`` exits 1 on a drifted spec, but only when the
16-minute full sweep is invoked. An entry edit that orphans a mutation
spec (the ``old`` text no longer matches, or the key vanished from
``queries()``) must fail the ROUND BATTERY immediately, so this test
re-checks the catalog's static invariants with no Spark session:

* every ``Mut.old`` occurs exactly ``Mut.count`` times in its file;
* every ``Mut.key`` is a real ``queries()`` key;
* every ``queries()`` key carries >= 2 mutations (the r12 catalog
  floor — a NEW entry added without extending the catalog fails here,
  not at the next full sweep);
* ``old != new`` and both non-empty (a no-op mutation would record a
  fake kill).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, REPO)

from mutcatalog import MUTATIONS  # noqa: E402


def _entry_keys():
    import __spark_entry__ as entry

    return set(entry.queries().keys())


def test_every_mutation_old_text_matches_exactly():
    drifted = []
    cache: dict[str, str] = {}
    for m in MUTATIONS:
        if m.path not in cache:
            with open(os.path.join(REPO, m.path)) as f:
                cache[m.path] = f.read()
        n = cache[m.path].count(m.old)
        if n != m.count:
            drifted.append(f"{m.key}/{m.name}: matched {n}x, spec says {m.count}")
    assert not drifted, (
        "mutation specs drifted from source (fix the spec alongside the"
        " entry edit):\n" + "\n".join(drifted)
    )


def test_every_mutation_key_exists_and_every_key_covered():
    keys = _entry_keys()
    spec_keys = {m.key for m in MUTATIONS}
    orphans = sorted(spec_keys - keys)
    assert not orphans, f"catalog names keys not in queries(): {orphans}"
    thin = sorted(
        k for k in keys if sum(1 for m in MUTATIONS if m.key == k) < 2
    )
    assert not thin, (
        "entries below the 2-mutation catalog floor (extend"
        f" tools/mutcatalog.py): {thin}"
    )


def test_no_noop_or_empty_mutations():
    bad = [
        f"{m.key}/{m.name}"
        for m in MUTATIONS
        if not m.old or m.old == m.new or m.count < 1
    ]
    assert not bad, f"no-op / empty mutation specs: {bad}"
