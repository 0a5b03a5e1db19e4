"""URL canonicalization for web-crawl corpora (pure Column, engine-
portable).

Common-Crawl-style pipelines dedup by canonical URL before any content
dedup (same page fetched as http/https, with/without ``www.``, with
tracking parameters, fragments, or an explicit default port). The
reference engine has no URL functions (its closest surface is the
source-URL parser, reference: shared/database/connection.py:36-88,
which parses CONNECTION urls, not data); this is a training-data
operator for the north-rule input shape (url:string per page).

Every step is a regexp the DuckDB oracle replays verbatim
(``duckdb_canonical_url_sql``): no lookarounds (RE2), unmatched groups
substitute '' in both engines, and the one all-occurrences replace
(tracking params) carries DuckDB's 'g' flag. Kept deliberately out of
scope (server-dependent semantics, documented not forgotten): trailing
slashes, percent-encoding normalization, query-param reordering, IDN.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: a tracking query parameter (utm_*, gclid, fbclid). Stripping runs in
#: TWO separator-consuming passes so no repair step is needed: pass 1
#: removes a RUN of tracking params each followed by '&' (keeping the
#: run's leading separator, which now joins the next real param); pass 2
#: removes a single trailing tracking param together with its leading
#: separator. The old single-pass form left a leading '&' and promoted
#: it to '?' unconditionally — rewriting query-less URLs with a literal
#: '&' in the path (legal per RFC 3986), merging distinct pages
#: (ADVICE r4).
_TRACKING_PARAM = r"(utm_[^&#]*|gclid=[^&#]*|fbclid=[^&#]*)"
_SCHEME_HOST = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://[^/?#]*"


def canonical_url(col: Column) -> Column:
    """Canonical form of a URL: fragment stripped, scheme+host
    lowercased, default ports (https:443 / http:80) dropped, leading
    ``www.`` dropped, tracking params (utm_*, gclid, fbclid) removed
    with their own separators consumed (two-pass — see _TRACKING_PARAM;
    a path-literal '&' is never touched). NULL in → NULL out; a string
    with no scheme passes through the host steps unchanged."""
    u = F.regexp_replace(col, "#.*", "")
    head = F.regexp_extract(u, _SCHEME_HOST, 0)
    u = F.concat(F.lower(head), u.substr(F.length(head) + 1, F.length(u)))
    u = F.regexp_replace(
        u, r"^(https://[^/?#:]*):443([/?#].*)?$", "$1$2")
    u = F.regexp_replace(
        u, r"^(http://[^/?#:]*):80([/?#].*)?$", "$1$2")
    u = F.regexp_replace(u, r"^(https?://)www\.", "$1")
    u = F.regexp_replace(u, r"([?&])(" + _TRACKING_PARAM + "&)+", "$1")
    u = F.regexp_replace(u, r"[?&]" + _TRACKING_PARAM + "$", "")
    u = F.regexp_replace(u, r"[?&]$", "")
    return u


def duckdb_canonical_url_sql(expr: str) -> str:
    """The same normalization as ``canonical_url`` as a DuckDB SQL
    expression over ``expr`` — the oracle replays each regexp step
    (Spark regexp_replace is all-occurrences; DuckDB defaults to first
    occurrence, so only the tracking-param step needs 'g' — every other
    pattern is anchored or consumes to end-of-string)."""
    u = f"regexp_replace({expr}, '#.*', '')"
    head = f"regexp_extract({u}, '{_SCHEME_HOST}', 0)"
    u = f"concat(lower({head}), substr({u}, length({head}) + 1))"
    u = (f"regexp_replace({u}, "
         r"'^(https://[^/?#:]*):443([/?#].*)?$', '\1\2')")
    u = (f"regexp_replace({u}, "
         r"'^(http://[^/?#:]*):80([/?#].*)?$', '\1\2')")
    u = f"regexp_replace({u}, '^(https?://)www\\.', '\\1')"
    u = (f"regexp_replace({u}, '([?&])({_TRACKING_PARAM}&)+', "
         "'\\1', 'g')")
    u = f"regexp_replace({u}, '[?&]{_TRACKING_PARAM}$', '')"
    u = f"regexp_replace({u}, '[?&]$', '')"
    return u
