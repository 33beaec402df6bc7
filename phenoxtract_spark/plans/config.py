"""Config → Pipeline compiler (EP1 parity; SURVEY §3 EP1, §7.1(3)).

The reference's documented entry point is a YAML/TOML/JSON config that
declares table contexts and an ordered strategy list
(~ config/phenoxtract_config.rs:351-358, config/try_from_config.rs:59-142).
This module compiles the same declaration surface to a :class:`Pipeline`:

```yaml
cohort: MYCOHORT
tables:
  demographics:
    subject_id: pid                  # shorthand for a subject column
    columns:
      - identifier: sex              # single (exact) identifier
        context: subject_sex
      - identifier: {regex: "^HP:"}  # regex identifier
        context: observation_status
        header_context: hpo
        building_block: A
      - identifier: {multi: [hpo1, hpo2]}
        context: hpo
        alias_map: {no_info: null}
strategies:
  - kind: alias_map
  - kind: mapping
    context: subject_sex
    dictionary: {m: MALE, f: FEMALE}
  - kind: date_to_age
```

Contexts are named by their ``ContextKind`` value, with optional
``time_type`` (age|date), ``boundary`` (start|end), ``assay_id``,
``unit_ontology_id`` parameters.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import SparkSession

from ..descriptors import (
    Boundary,
    Context,
    ContextKind,
    ContextualizedDataFrame,
    Identifier,
    SeriesContext,
    TableContext,
    TimeElementType,
)
from .pipeline import Pipeline
from .strategies import build_strategy


class ConfigError(ValueError):
    pass


def _parse_identifier(spec: Any) -> Identifier:
    if isinstance(spec, str):
        return Identifier.of(spec)
    if isinstance(spec, (list, tuple)):
        return Identifier.of(list(spec))
    if isinstance(spec, dict):
        if "regex" in spec:
            return Identifier.rx(spec["regex"])
        if "multi" in spec:
            return Identifier.of(list(spec["multi"]))
        if "single" in spec:
            return Identifier.of(spec["single"])
    raise ConfigError(f"bad identifier spec: {spec!r}")


def _parse_context(spec: Any) -> Context:
    if isinstance(spec, str):
        name, params = spec, {}
    elif isinstance(spec, dict):
        name = spec.get("kind")
        params = {k: v for k, v in spec.items() if k != "kind"}
    else:
        raise ConfigError(f"bad context spec: {spec!r}")
    try:
        kind = ContextKind(name)
    except ValueError as e:
        raise ConfigError(
            f"unknown context kind {name!r}; known: {[k.value for k in ContextKind]}"
        ) from e
    kwargs = {}
    if "time_type" in params:
        kwargs["time_type"] = TimeElementType(params["time_type"])
    if "boundary" in params:
        kwargs["boundary"] = Boundary(params["boundary"])
    for p in ("assay_id", "unit_ontology_id"):
        if p in params:
            kwargs[p] = params[p]
    return Context(kind, **kwargs)


def parse_table_context(name: str, spec: dict) -> TableContext:
    scs: list[SeriesContext] = []
    if "subject_id" in spec:
        scs.append(
            SeriesContext(
                identifier=_parse_identifier(spec["subject_id"]),
                data_context=Context.subject_id(),
            )
        )
    for col in spec.get("columns", []):
        scs.append(
            SeriesContext(
                identifier=_parse_identifier(col["identifier"]),
                data_context=_parse_context(col.get("context", "none")),
                header_context=(
                    _parse_context(col["header_context"]) if "header_context" in col else None
                ),
                building_block_id=col.get("building_block"),
                alias_map=col.get("alias_map"),
                fill_missing=col.get("fill_missing"),
            )
        )
    return TableContext(name=name, series_contexts=scs)


def compile_pipeline(
    config: dict,
    spark: SparkSession,
    dimensions: Optional[dict] = None,
) -> tuple[Pipeline, dict[str, TableContext]]:
    """Compile a config dict (from ``sources.readers.load_config`` or inline)
    into a Pipeline + the declared table contexts.

    ``dimensions`` supplies named ontology dimension DataFrames referenced
    by ``ontology_normaliser``/``hpo_disease_splitter`` strategies via their
    ``ontology``/``hpo_dim``/``disease_dim`` config keys — the offline
    replacement for the reference's network-built bidict registry."""
    dimensions = dimensions or {}
    contexts = {
        name: parse_table_context(name, spec)
        for name, spec in config.get("tables", {}).items()
    }
    pipe = Pipeline(cohort=config.get("cohort"))
    for s in config.get("strategies", []):
        kind = s.get("kind")
        kwargs: dict[str, Any] = {}
        if kind == "mapping":
            kwargs = {
                "spark": spark,
                "kind": ContextKind(s["context"]),
                "dictionary": s["dictionary"],
                "strict": s.get("strict", True),
            }
        elif kind == "ontology_normaliser":
            dim_name = s["ontology"]
            if dim_name not in dimensions:
                raise ConfigError(f"unknown ontology dimension {dim_name!r}")
            kwargs = {
                "ontology_dim": dimensions[dim_name],
                "strict": s.get("strict", True),
            }
            if "contexts" in s:
                kwargs["kinds"] = tuple(ContextKind(c) for c in s["contexts"])
        elif kind == "hpo_disease_splitter":
            kwargs = {
                "hpo_dim": dimensions[s["hpo_dim"]],
                "disease_dim": dimensions[s["disease_dim"]],
            }
        elif kind == "date_to_age":
            kwargs = {"strict": s.get("strict", True)}
        elif kind == "multi_hpo_col_expansion":
            if "max_width" in s:
                kwargs = {"max_width": s["max_width"]}
        pipe.add_strategy(build_strategy(kind, **kwargs))
    return pipe, contexts


def run_from_config(
    config: dict,
    spark: SparkSession,
    tables: dict[str, Any],
    dimensions: Optional[dict] = None,
):
    """EP1 end-to-end: config + named DataFrames → packet JSON DataFrame."""
    pipe, contexts = compile_pipeline(config, spark, dimensions)
    missing = set(contexts) - set(tables)
    if missing:
        raise ConfigError(f"config declares tables with no DataFrame supplied: {sorted(missing)}")
    cdfs = [
        ContextualizedDataFrame(df=tables[name], context=ctx)
        for name, ctx in contexts.items()
    ]
    return pipe.run(cdfs)
