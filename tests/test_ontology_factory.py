"""X6 ontology factory: OBO / obographs-JSON parse + parquet disk cache
(~ ontology_factory.rs:42-397, fixture-driven, no network)."""

import json
import os

from phenoxtract_spark.operators import ontology

ASSETS = os.path.join(os.path.dirname(__file__), "assets", "integration_test")


def test_parse_obo_terms():
    terms = {t.id: t for t in ontology.parse_obo(os.path.join(ASSETS, "mini_hp.obo"))}
    assert terms["HP:0001945"].label == "Fever"
    assert "increased size of head" in terms["HP:0000256"].synonyms
    assert "HP:9999999" not in terms  # obsolete skipped


def test_parse_obograph_json(tmp_path):
    doc = {
        "graphs": [
            {
                "nodes": [
                    {
                        "id": "http://purl.obolibrary.org/obo/HP_0001945",
                        "lbl": "Fever",
                        "type": "CLASS",
                        "meta": {"synonyms": [{"pred": "hasExactSynonym", "val": "pyrexia"}]},
                    },
                    {
                        "id": "http://purl.obolibrary.org/obo/HP_0000001",
                        "lbl": "Dead term",
                        "type": "CLASS",
                        "meta": {"deprecated": True},
                    },
                    {"id": "http://example.com/other", "lbl": "Not OBO"},
                ]
            }
        ]
    }
    p = tmp_path / "hp.json"
    p.write_text(json.dumps(doc))
    terms = {t.id: t for t in ontology.parse_obograph_json(str(p))}
    assert terms == {
        "HP:0001945": ontology.OntologyTerm("HP:0001945", "Fever", ("pyrexia",))
    }


def test_factory_parquet_cache_roundtrip(spark, tmp_path):
    cache = str(tmp_path / "onto_cache")
    src = os.path.join(ASSETS, "mini_hp.obo")
    dim1 = ontology.ontology_factory(spark, src, resource="hp", cache_dir=cache)
    cached_files = os.listdir(cache)
    assert len(cached_files) == 1 and cached_files[0].endswith(".parquet")
    # second load hits the cache (same rows, no re-parse needed)
    dim2 = ontology.ontology_factory(spark, src, resource="hp", cache_dir=cache)
    rows1 = {tuple(r) for r in dim1.collect()}
    rows2 = {tuple(r) for r in dim2.collect()}
    assert rows1 == rows2
    keys = {r["key"] for r in dim1.filter("id = 'HP:0002045'").collect()}
    assert "abnormally low body temperature" in keys


def test_factory_rejects_empty(spark, tmp_path):
    p = tmp_path / "empty.obo"
    p.write_text("format-version: 1.2\n")
    import pytest

    with pytest.raises(ValueError, match="no ontology terms"):
        ontology.ontology_factory(spark, str(p))
