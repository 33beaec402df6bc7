"""Deferred error ledger: multiple strict strategies validate in ONE job
with a combined report; clean data passes silently."""

import pytest

from phenoxtract_spark.descriptors import (
    Context,
    ContextKind,
    ContextualizedDataFrame,
    Identifier,
    SeriesContext,
    TableContext,
)
from phenoxtract_spark.errors import ErrorLedger, PipelineValidationError
from phenoxtract_spark.operators import mapping, ontology
from phenoxtract_spark.plans.pipeline import Pipeline
from phenoxtract_spark.plans.strategies import MappingStrategy, OntologyNormaliserStrategy


def _cdf(spark, rows):
    df = spark.createDataFrame(rows, "sid string, sex string, hpo string")
    ctx = TableContext(
        name="t",
        series_contexts=[
            SeriesContext(identifier=Identifier.of("sid"), data_context=Context.subject_id()),
            SeriesContext(identifier=Identifier.of("sex"), data_context=Context(ContextKind.SUBJECT_SEX)),
            SeriesContext(identifier=Identifier.of("hpo"), data_context=Context(ContextKind.HPO)),
        ],
    )
    return ContextualizedDataFrame(df=df, context=ctx)


def _pipe(spark, ledger):
    hpo_dim = ontology.bidict_dim(spark, ontology.MINI_HPO).select("key", "id")
    pipe = Pipeline(ledger=ledger)
    pipe.add_strategy(
        MappingStrategy(spark, ContextKind.SUBJECT_SEX, mapping.SEX_MAP, ledger=ledger)
    )
    pipe.add_strategy(
        OntologyNormaliserStrategy(ontology_dim=hpo_dim, kinds=(ContextKind.HPO,), ledger=ledger)
    )
    return pipe


def test_combined_report_lists_every_failing_check(spark):
    ledger = ErrorLedger()
    pipe = _pipe(spark, ledger)
    bad = _cdf(spark, [("P1", "marsian", "not_a_phenotype")])
    with pytest.raises(PipelineValidationError) as e:
        pipe.run([bad])
    failures = e.value.failures
    assert any(k.startswith("unmapped:sex") for k in failures)
    assert any(k.startswith("unmapped_ontology:hpo") for k in failures)
    assert "marsian" in str(e.value) and "not_a_phenotype" in str(e.value)


def test_clean_data_passes_in_deferred_mode(spark):
    ledger = ErrorLedger()
    pipe = _pipe(spark, ledger)
    ok = _cdf(spark, [("P1", "male", "Fever")])
    out = {r["subject_id"] for r in pipe.run([ok]).collect()}
    assert out == {"P1"}


def test_ledger_is_single_use_and_reusable(spark):
    ledger = ErrorLedger()
    df = spark.createDataFrame([("x",)], "v string")
    ledger.add_check("c1", df)
    with pytest.raises(PipelineValidationError):
        ledger.validate()
    # checks cleared after validate — second call is a no-op
    ledger.validate()
