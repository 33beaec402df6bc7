"""Driver-contract invariants for ``__spark_entry__``.

The external driver consumes ``queries()``/``oracle_sql()`` and samples a
prefix of the registry for its correctness snapshot — these tests pin the
structural properties that make that contract reliable without running
Spark (pure registry introspection, fast).
"""

from __future__ import annotations

import __spark_entry__ as ent


def test_registry_shape():
    qs = ent.queries()
    orc = ent.oracle_sql()
    assert len(qs) >= 110
    assert set(orc) <= set(qs)
    # every callable is (spark, sf_dir) -> DataFrame; spot-check arity
    import inspect

    for name, fn in qs.items():
        assert len(inspect.signature(fn).parameters) == 2, name


def test_priority_prefix_is_complete_and_deduplicated():
    qs = list(ent.queries())
    assert len(set(qs)) == len(qs)
    missing = [n for n in ent._PRIORITY if n not in qs]
    assert not missing, f"_PRIORITY names absent from registry: {missing}"
    assert qs[: len(ent._PRIORITY)] == ent._PRIORITY


def test_any_50_prefix_covers_every_operator_family():
    """The driver snapshots the first 50 registry rows; that prefix must
    exercise the ETL spine AND the scale block, not just whichever module
    imports first."""
    first50 = list(ent.queries())[:50]
    fams = {n.split("_")[0] for n in first50}
    for fam in ("c1", "m1", "s3", "g1", "events", "dedup", "similarity", "text"):
        assert any(n.startswith(fam.split("1")[0]) for n in first50), fam
    llm = [
        n
        for n in first50
        if n.split("_")[0]
        in ("dedup", "similarity", "text", "clustering", "curation", "multimodal")
    ]
    assert len(llm) >= 10, f"only {len(llm)} LLM-block rows in the first 50"
    orc = ent.oracle_sql()
    assert all(n in orc for n in first50), "sampled prefix must be value-checkable"
