"""URL canonicalization — the web-curation step that makes crawl-level
dedup work: the same page arrives under dozens of surface forms
(case-varied scheme/host, default ports, tracking parameters, unsorted
query strings, trailing slashes, fragments), and deduplicating by RAW
url silently keeps them all.

Everything here is a fixed tree of built-in string expressions
(regexp_extract / filter / array_sort — whole-stage codegen, no UDF), so
canonicalization runs at scan speed and replays exactly in the DuckDB
oracles.  The rules implemented (the common subset of RFC 3986
normalization + tracker stripping used by crawl pipelines):

- scheme and host lowercased; a ``www.`` host prefix dropped
- userinfo (``user:pass@``) dropped
- default ports stripped (``:80`` for http, ``:443`` for https)
- fragment dropped
- tracking parameters dropped (``utm_*``, ``gclid``, ``fbclid``,
  ``msclkid``, ``ref``), remaining parameters SORTED bytewise
- trailing slashes stripped from non-root paths; empty path → ``/``

Out of scope (documented, not silently wrong): percent-encoding
normalization, IDN/punycode, path ``.``/``..`` collapsing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

TRACKING_PARAM_RE = "^(utm_[^=]*|gclid|fbclid|msclkid|ref)(=.*)?$"


def url_parts(url: Column) -> dict[str, Column]:
    """Split a URL into (scheme, host, port, path, query) expression
    columns.  Host is lowercased with userinfo and a ``www.`` prefix
    removed; the fragment is discarded during extraction."""
    scheme = F.lower(F.regexp_extract(url, r"^\s*([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    authority = F.regexp_extract(url, r"^\s*[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    hostport = F.regexp_replace(authority, r"^[^@]*@", "")
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    port = F.regexp_extract(hostport, r":([0-9]+)$", 1)
    pathq = F.regexp_extract(
        url, r"^\s*[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1
    )
    path = F.regexp_extract(pathq, r"^([^?]*)", 1)
    query = F.regexp_extract(pathq, r"\?(.*)$", 1)
    return {"scheme": scheme, "host": host, "port": port,
            "path": path, "query": query}


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL under the module-docstring rules, as one
    codegen'd expression tree."""
    p = url_parts(url)
    default_port = (
        ((p["scheme"] == "http") & (p["port"] == "80"))
        | ((p["scheme"] == "https") & (p["port"] == "443"))
    )
    portpart = F.when(
        (p["port"] == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), p["port"]))
    path = F.regexp_replace(p["path"], r"/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    params = F.filter(
        F.split(p["query"], "&"),
        lambda s: (s != "") & ~s.rlike(TRACKING_PARAM_RE),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    return F.concat(
        p["scheme"], F.lit("://"), p["host"], portpart, path,
        F.when(qcanon == "", F.lit("")).otherwise(F.concat(F.lit("?"), qcanon)),
    )
