"""URL functions for crawl-curation pipelines.

URL-level exact dedup is the FIRST stage of the public RefinedWeb /
CommonCrawl recipes (Penedo et al. 2023 §3.1 run URL dedup before any
content-based stage, because it removes re-crawls of the same page at
the cost of one string groupBy — orders of magnitude cheaper than
MinHash over the same rows). The normalizer canonicalizes the
variants crawlers actually see (scheme/host case, ``www.`` prefix,
tracking query params, fragments, trailing slash) so the groupBy key
collapses them.

Everything here is a **pure Column expression** built from chained
``regexp_replace`` / ``regexp_extract`` in the Java-regex ∩ RE2
subset (no lookarounds) — JVM-side, whole-stage-codegen'd, zero
Python, with an exact DuckDB twin for the oracle gate (same design as
:mod:`cs533_big_data_data_mining_spark.functions.text`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: query parameters that never change page content — stripped by the
#: normalizer. Kept as a regex alternation so the whole strip is one
#: codegen'd regexp_replace.
TRACKING_PARAM_RE = r"(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref|ref_src)"

#: ``scheme://host[:port]`` prefix (the case-insensitive part of a URL
#: per RFC 3986; path/query stay case-sensitive).
_PREFIX_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*)"


def normalize_url(col: str | Column) -> Column:
    """Canonical form of a URL for exact URL-level dedup:

    1. drop the ``#fragment`` (never sent to the server);
    2. lowercase the ``scheme://host`` prefix (case-insensitive per
       RFC 3986) and drop a ``www.`` host prefix;
    3. remove tracking query params (:data:`TRACKING_PARAM_RE`),
       re-anchoring the first surviving param to ``?``;
    4. drop an empty trailing ``?`` and a trailing ``/``.

    Non-URL strings pass through mostly untouched (no scheme prefix →
    step 2 is a no-op); null stays null. Pure Column — composes into
    the scan stage at any scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    # 1. fragment
    c = F.regexp_replace(c, r"#.*$", "")
    # 2. lowercase scheme://host, strip www. — rebuild as
    #    lower(prefix) + remainder (substring is 1-based; prefix match
    #    at position 1 by construction)
    prefix = F.regexp_extract(c, _PREFIX_RE, 1)
    rest = F.substring(c, F.length(prefix) + F.lit(1), F.length(c))
    c = F.concat(F.regexp_replace(F.lower(prefix), r"://www\.", "://"), rest)
    # 3. tracking params: each match consumes its LEADING ? or &, so
    #    removal never leaves doubled separators; if the first
    #    surviving param lost its ?, re-anchor it
    c = F.regexp_replace(c, r"[?&]" + TRACKING_PARAM_RE + r"=[^&#]*", "")
    c = F.regexp_replace(c, r"^([^?]*)&", "$1?")
    # 4. empty query, then the slash that ends the PATH — either at
    #    end of string or right before the query
    c = F.regexp_replace(c, r"\?$", "")
    c = F.regexp_replace(c, r"/\?", "?")
    c = F.regexp_replace(c, r"/$", "")
    return c
