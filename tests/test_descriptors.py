"""Descriptor layer: identifier resolution (P1), CDF invariants (V1-V3).
Mirrors the reference's identifier tests (config/table_context.rs:419-509)."""

import pytest

from phenoxtract_spark.descriptors import (
    Context,
    ContextKind,
    ContextualizedDataFrame,
    Identifier,
    SeriesContext,
    TableContext,
    ValidationError,
)


def test_identifier_single_exact_only():
    ident = Identifier.of("hpo_1")
    assert ident.resolve(["hpo_1", "hpo_10", "xhpo_1"]) == ["hpo_1"]


def test_identifier_regex_is_match():
    ident = Identifier.rx(r"^hpo_\d+$")
    assert ident.resolve(["hpo_1", "hpo_22", "nope", "hpo_x"]) == ["hpo_1", "hpo_22"]


def test_identifier_multi_preserves_column_order():
    # match order = table column order, not identifier order (ref test :504-508)
    ident = Identifier.of(["b", "a"])
    assert ident.resolve(["a", "b", "c"]) == ["a", "b"]


def test_identifier_exactly_one_kind():
    with pytest.raises(ValueError):
        Identifier(single="x", regex="y")
    with pytest.raises(ValueError):
        Identifier()


def _ctx(*scs):
    return TableContext(name="t", series_contexts=list(scs))


def _subject_sc(name="sid"):
    return SeriesContext(identifier=Identifier.of(name), data_context=Context.subject_id())


def test_cdf_requires_exactly_one_subject(spark):
    df = spark.createDataFrame([("p1", 1)], "sid string, v int")
    ContextualizedDataFrame(df=df, context=_ctx(_subject_sc()))  # ok
    with pytest.raises(ValidationError):
        ContextualizedDataFrame(df=df, context=_ctx())  # none
    with pytest.raises(ValidationError):
        two = _ctx(
            _subject_sc("sid"),
            SeriesContext(identifier=Identifier.of("v"), data_context=Context.subject_id()),
        )
        ContextualizedDataFrame(df=df, context=two)


def test_cdf_rejects_dangling_series_context(spark):
    df = spark.createDataFrame([("p1",)], "sid string")
    ctx = _ctx(
        _subject_sc(),
        SeriesContext(identifier=Identifier.of("missing"), data_context=Context(ContextKind.HPO)),
    )
    with pytest.raises(ValidationError):
        ContextualizedDataFrame(df=df, context=ctx)


def test_cdf_null_subject_check(spark):
    df = spark.createDataFrame([("p1", 1), (None, 2)], "sid string, v int")
    cdf = ContextualizedDataFrame(df=df, context=_ctx(_subject_sc()))
    with pytest.raises(ValidationError):
        cdf.validate_subject_not_null()


def test_columns_with_kind(spark):
    df = spark.createDataFrame([("p1", "fever", "x")], "sid string, hpo1 string, other string")
    ctx = _ctx(
        _subject_sc(),
        SeriesContext(identifier=Identifier.rx("^hpo"), data_context=Context(ContextKind.HPO)),
    )
    cdf = ContextualizedDataFrame(df=df, context=ctx)
    assert cdf.columns_with_kind(ContextKind.HPO) == ["hpo1"]
    assert cdf.subject_col == "sid"
