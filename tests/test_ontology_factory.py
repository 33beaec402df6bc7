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


MINI_OBO_BYTES = open(os.path.join(ASSETS, "mini_hp.obo"), "rb").read()


def test_fetch_and_cache_downloads_once_then_serves_cache(spark, tmp_path):
    """First call fetches through the transport and caches the document;
    a second call (no max_age) never touches the transport again."""
    calls = []

    def transport(url, etag):
        calls.append((url, etag))
        return 200, MINI_OBO_BYTES, 'W/"v1"'

    dim = ontology.fetch_and_cache_ontology(
        spark, "http://purl.example/hp.obo", str(tmp_path), transport
    )
    assert {r["id"] for r in dim.filter("kind = 'id'").collect()} >= {"HP:0001945"}
    assert len(calls) == 1
    dim2 = ontology.fetch_and_cache_ontology(
        spark, "http://purl.example/hp.obo", str(tmp_path), transport
    )
    assert len(calls) == 1  # cache hit, no re-fetch
    assert dim2.count() == dim.count()


def test_fetch_and_cache_revalidates_with_etag(tmp_path, spark):
    """A stale copy revalidates with its stored ETag: 304 keeps the
    cached bytes and refreshes their age; 200 replaces them."""
    clock = [1000.0]
    seen = []

    def transport(url, etag):
        seen.append(etag)
        if len(seen) == 1:
            return 200, MINI_OBO_BYTES, 'W/"v1"'
        return 304, None, None

    kw = dict(transport=transport, max_age_s=10.0, clock=lambda: clock[0])
    ontology.fetch_and_cache_ontology(
        spark, "http://purl.example/hp2.obo", str(tmp_path), **kw)
    clock[0] += 100  # past max_age: must revalidate
    dim = ontology.fetch_and_cache_ontology(
        spark, "http://purl.example/hp2.obo", str(tmp_path), **kw)
    assert seen == [None, 'W/"v1"']  # second call sent the stored ETag
    assert dim.filter("kind = 'id'").count() > 0
    # revalidation refreshed the age: a third call within max_age skips
    clock[0] += 5
    ontology.fetch_and_cache_ontology(
        spark, "http://purl.example/hp2.obo", str(tmp_path), **kw)
    assert len(seen) == 2


def test_fetch_and_cache_stale_fallback_and_hard_failure(tmp_path, spark):
    """A failing transport falls back to the stale cached copy; with no
    cached copy at all it raises."""
    import pytest

    ok = lambda url, etag: (200, MINI_OBO_BYTES, None)
    boom = lambda url, etag: (503, None, None)
    clock = [0.0]
    kw = dict(max_age_s=1.0, clock=lambda: clock[0])
    ontology.fetch_and_cache_ontology(
        spark, "http://purl.example/hp3.obo", str(tmp_path), ok, **kw)
    clock[0] += 100
    dim = ontology.fetch_and_cache_ontology(
        spark, "http://purl.example/hp3.obo", str(tmp_path), boom, **kw)
    assert dim.filter("kind = 'id'").count() > 0  # stale copy served
    with pytest.raises(RuntimeError, match="no cached copy"):
        ontology.fetch_and_cache_ontology(
            spark, "http://purl.example/never-fetched.obo", str(tmp_path),
            boom, **kw)
