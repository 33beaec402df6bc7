"""Self-test for the integer-exact correctness harness (round-4 hardening).

Round 3 shipped a red driver row (``dedup_simhash``) because the DuckDB
oracle's ``sum(1::BIGINT << bit)`` returned HUGEINT, which ``fetchdf()``
renders as float64 — destroying the low bits of 60-bit fingerprints above
2^53 — while the local gate coerced BOTH sides to float64 and so rounded
identically, masking the corruption.  These tests pin the hardened
behavior of ``tools/check_correctness.compare``:

1. perturbing one low bit of a >2^53 integer MUST fail the compare;
2. an int64 column paired with a float64 column that lost precision
   upstream MUST fail (the exact shipped-bug shape);
3. the uncast HUGEINT simhash-oracle idiom MUST fail against its own
   CAST(... AS BIGINT) twin when run through DuckDB + the harness;
4. legitimate equal integers (including >2^53) and float columns keep
   passing.
"""

import sys
from pathlib import Path

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from check_correctness import compare  # noqa: E402

BIG = (1 << 60) | 1  # 60-bit fingerprint with a low bit set: not float64-exact


def test_low_bit_perturbation_above_2_53_fails():
    a = pd.DataFrame({"id": [1, 2], "fp": pd.array([BIG, BIG], dtype="int64")})
    b = pd.DataFrame({"id": [1, 2], "fp": pd.array([BIG, BIG ^ 1], dtype="int64")})
    assert compare("perturb", a, b), "one-low-bit flip above 2^53 must FAIL"


def test_int_vs_float64_precision_loss_fails():
    # the r3 shape: Spark exact int64, oracle HUGEINT -> fetchdf float64
    a = pd.DataFrame({"fp": pd.array([BIG], dtype="int64")})
    b = pd.DataFrame({"fp": [float(BIG)]})  # float64(BIG) == 2^60, low bit gone
    assert compare("floatloss", a, b), "float64-rounded >2^53 int must FAIL"


def test_uncast_hugeint_oracle_idiom_fails_against_cast_twin():
    con = duckdb.connect()
    # 500 synthetic 60-bit fingerprints assembled bit-by-bit, like the
    # simhash oracle: sum(1::BIGINT << bit) over 60 rows -> HUGEINT.
    base = """
        WITH docs AS (SELECT unnest(generate_series(1, 500)) AS id),
        bits AS (
          SELECT id, b.bit,
                 ('0x' || substr(md5(id::VARCHAR || '-' || b.bit::VARCHAR), 1, 1))::BIGINT % 2 AS v
          FROM docs, (SELECT unnest(generate_series(0, 59)) AS bit) b
        )
        SELECT id, {expr} AS fp FROM bits GROUP BY id
    """
    raw = "sum(CASE WHEN v = 1 THEN (1::BIGINT << bit) ELSE 0 END)"
    uncast = con.execute(base.format(expr=raw)).fetchdf()
    cast = con.execute(base.format(expr=f"CAST({raw} AS BIGINT)")).fetchdf()
    assert str(uncast["fp"].dtype) == "float64", "fetchdf must render HUGEINT as float64"
    assert pd.api.types.is_integer_dtype(cast["fp"]), "cast twin must stay integer"
    assert (cast["fp"] > 2**53).any(), "fixture must exercise the >2^53 range"
    assert compare("hugeint", cast, uncast), (
        "the uncast HUGEINT idiom must FAIL the hardened compare"
    )
    # and the cast twin agrees with itself, integer-exact
    assert not compare("hugeint_ok", cast, cast.copy())


def test_equal_big_integers_pass():
    a = pd.DataFrame({"fp": pd.array([BIG, 7, None], dtype="Int64")})
    b = pd.DataFrame({"fp": pd.array([BIG, 7, None], dtype="Int64")})
    assert not compare("equal", a, b)


def test_int32_vs_int64_same_values_pass():
    a = pd.DataFrame({"n": pd.array([1, 2], dtype="int32")})
    b = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    assert not compare("widths", a, b)


def test_float_columns_still_compare_as_floats():
    a = pd.DataFrame({"x": [0.5, 1.25]})
    b = pd.DataFrame({"x": [0.5, 1.25]})
    assert not compare("floats", a, b)
    c = pd.DataFrame({"x": [0.5, 1.5]})
    assert compare("floats_neq", a, c)


def test_int_vs_nonintegral_float_fails():
    a = pd.DataFrame({"n": pd.array([1], dtype="int64")})
    b = pd.DataFrame({"n": [0.5]})
    assert compare("nonintegral", a, b)


def test_repo_has_no_uncast_fingerprint_sums():
    """Verdict item 3: no oracle may build fingerprints with an uncast
    ``sum(1::BIGINT << ...)`` — every site must wrap in CAST(... AS BIGINT)."""
    pkg = Path(__file__).resolve().parent.parent / "phenoxtract_spark"
    offenders = []
    for py in sorted(pkg.rglob("*.py")):
        for i, line in enumerate(py.read_text().splitlines(), 1):
            if "1::BIGINT <<" in line and "CAST(sum" not in line:
                offenders.append(f"{py.name}:{i}")
    assert not offenders, f"uncast fingerprint sums: {offenders}"


def test_integral_int_vs_float_dtype_divergence_fails():
    """R4 verdict item 2 (the events_json_props ship): integer-identical
    values delivered as int64 by one engine and float64 by the other MUST
    fail — the driver hashes rendered values ("99111" vs "99111.0")."""
    a = pd.DataFrame({"sum_k": pd.array([99111, 42], dtype="int64")})
    b = pd.DataFrame({"sum_k": [99111.0, 42.0]})
    probs = compare("divergence", a, b)
    assert probs, "int-vs-float dtype divergence must FAIL even with equal values"
    assert any("dtype divergence" in p for p in probs)
    # both sides float with the same values still passes
    af = pd.DataFrame({"sum_k": [99111.0, 42.0]})
    assert not compare("both_float", af, b)


def test_null_vs_value_in_nullable_int_fails():
    """ADVICE r4 (high): with nullable Int64, null-vs-value comparisons
    yield pd.NA which nullable-boolean sum() skips — the compare must
    fill NA to False so the mismatch is counted."""
    a = pd.DataFrame({"n": pd.array([5, None], dtype="Int64")})
    b = pd.DataFrame({"n": pd.array([5, 7], dtype="Int64")})
    assert compare("null_vs_value", a, b), "null-vs-value must FAIL"
    assert compare("value_vs_null", b, a), "value-vs-null must FAIL"
    # equal nulls still pass
    assert not compare("null_eq", a, a.copy())


def test_no_oracle_emits_hugeint_columns():
    """R4 verdict item 1, type-level: bind every ``oracle_sql()`` statement
    (no execution) and assert no output column is HUGEINT/UHUGEINT —
    ``fetchdf`` renders those as float64, which the driver hashes
    differently from Spark's bigint.  This makes the whole class
    unshippable, unlike the idiom grep above."""
    import __spark_entry__ as ent

    sf_dir = "/root/testdata/sf0.01"
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    offenders = []
    for name, sql in ent.oracle_sql().items():
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            if "HUGEINT" in str(typ).upper():
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, f"HUGEINT-typed oracle columns: {offenders}"


def test_null_dates_normalize_identically_across_containers():
    """sf0.1 regression (g10_packet_flat): a null timestamp is NaT in a
    datetime64 column but None in an object column — both are nulls and
    must compare equal; a null-vs-real-date mismatch must still FAIL."""
    ts = pd.Timestamp("1995-03-15")
    a = pd.DataFrame({"d": pd.to_datetime([ts, None])})          # datetime64, NaT
    b = pd.DataFrame({"d": [ts.to_pydatetime(), None]})          # object, None
    assert not compare("null_dates_eq", a, b)
    c = pd.DataFrame({"d": pd.to_datetime([ts, ts])})
    assert compare("null_vs_real_date", c, b)


def test_list_valued_result_columns_fail_as_driver_fatal():
    """The external driver canonicalizes with a raw pandas sort_values —
    list-valued cells cannot be factorized and CRASH its compare (the r5
    multimodal_features red row).  The local gate must therefore FAIL any
    query whose result holds list/array cells on either side, even when
    the values are identical — green-locally/red-in-driver is exactly the
    gap this pins shut."""
    import numpy as np

    a = pd.DataFrame({"id": [1], "feature": [[0.0, 0.11765, 0.51373]]})
    b = pd.DataFrame({"id": [1], "feature": [np.array([0.0, 0.11765, 0.51373])]})
    problems = compare("arrays_driver_fatal", a, b)
    assert problems and any("CRASHES" in p for p in problems)
    # scalar-only results with equal values still pass
    c = pd.DataFrame({"id": [1], "v": [0.5]})
    d = pd.DataFrame({"id": [1], "v": [0.5]})
    assert not compare("scalars_eq", c, d)


def test_decimal_object_cells_fail_as_driver_render_unsafe():
    """The r9 red-row class: Spark toPandas delivers DECIMAL sums as
    decimal.Decimal objects (scale-padded render '…4900') while DuckDB's
    fetchdf degrades its DECIMAL to float64 ('…49') — identical values,
    divergent driver hash.  The gate must FAIL Decimal cells on EITHER
    side regardless of the other side's dtype (the type is banned at the
    registry surface; test_driver_contract pins the schema-level twin)."""
    import decimal

    dec = decimal.Decimal("168636624.4900")
    a = pd.DataFrame({"id": [1], "revenue": [dec]})
    b = pd.DataFrame({"id": [1], "revenue": [168636624.49]})
    problems = compare("decimal_vs_float", a, b)
    assert problems and any("decimal.Decimal" in p for p in problems)
    # Decimal on BOTH sides is still banned: scales (and thus renders)
    # are engine-dependent even when values agree
    c = pd.DataFrame({"id": [1], "revenue": [decimal.Decimal("1.4900")]})
    d = pd.DataFrame({"id": [1], "revenue": [decimal.Decimal("1.49")]})
    assert compare("decimal_both_sides", c, d)


def test_numeric_object_vs_numeric_dtype_divergence_fails():
    """Generic class fix (r10): numeric OBJECTS in an object column on one
    side vs a real numeric dtype on the other render through different
    str() paths — the compare must flag the dtype split itself instead of
    forgiving it through pd.to_numeric."""
    a = pd.DataFrame({"v": pd.array([1.5, 2.5], dtype=object)})
    b = pd.DataFrame({"v": pd.array([1.5, 2.5], dtype="float64")})
    problems = compare("obj_float_vs_float64", a, b)
    assert problems and any("numeric OBJECTS" in p for p in problems)
    # plain string object columns keep passing against themselves
    c = pd.DataFrame({"v": ["x", "y"]})
    d = pd.DataFrame({"v": ["x", "y"]})
    assert not compare("strings_eq", c, d)


def test_check_correctness_rejects_unknown_flags():
    """The r6 lesson: an unrecognized flag used to act as a query-name
    filter and print a deceptively green '0 ok, 0 fail'.  It must exit 2
    before any Spark work."""
    import subprocess
    import sys

    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(repo / "tools" / "check_correctness.py"),
         "--no-such-flag"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 2
    assert "unknown flag" in r.stdout


def test_check_correctness_sf_dir_without_value_exits_cleanly():
    """``--sf-dir`` as the LAST argument must print a clear error and
    exit 2, not die with a raw IndexError traceback (r6 ADVICE)."""
    import subprocess
    import sys

    repo = Path(__file__).resolve().parent.parent
    r = subprocess.run(
        [sys.executable, str(repo / "tools" / "check_correctness.py"),
         "--sf-dir"],
        capture_output=True, text=True, timeout=60,
    )
    assert r.returncode == 2
    assert "--sf-dir requires a path" in r.stdout
    assert "IndexError" not in r.stderr


def test_check_correctness_conf_without_value_exits_cleanly():
    """``--conf`` without a key=value (missing entirely, or not of the
    k=v shape) must print a clear error and exit 2 before any Spark
    work — same fail-fast discipline as --sf-dir."""
    import subprocess
    import sys

    repo = Path(__file__).resolve().parent.parent
    for tail in (["--conf"], ["--conf", "no-equals-sign"]):
        r = subprocess.run(
            [sys.executable, str(repo / "tools" / "check_correctness.py")]
            + tail,
            capture_output=True, text=True, timeout=60,
        )
        assert r.returncode == 2, tail
        assert "--conf requires key=value" in r.stdout
