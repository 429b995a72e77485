"""URL normalization and domain filtering — the curation step every
web-scale corpus runs between crawl ingest and dedup (CCNet, RefinedWeb,
C4 all key their URL-level dedup and blocklists on a CANONICAL url).

Pure column expressions end to end: regexp part-splitting, a
higher-order filter over query params, conditional default-port
stripping — all inside whole-stage codegen, zero UDFs, zero shuffles.
The regex subset used (anchored classes, alternation, no lookaround) is
shared by Java regex and RE2, so the DuckDB oracle (q77) reimplements
the same semantics independently in SQL — the gate pins the
normalization contract, not a shared implementation.

Normalization contract (documented so dedup keys are stable):
- scheme and host lowercased; fragment dropped
- the scheme's DEFAULT port stripped (http:80 / https:443); any other
  explicit port kept
- a single leading ``www.`` label dropped
- trailing slashes stripped from the path (root collapses to no path)
- tracking params dropped (``utm_*``, ``fbclid``, ``gclid``); surviving
  params SORTED lexicographically; an emptied query string dropped

At 100 TB this all stays a narrow projection on the scan; the blocklist
filter broadcasts (a domain blocklist is KBs–MBs, never fact-sized).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Minimal public-suffix overrides: two-label suffixes under which the
# registered domain is THREE labels (news.example.co.uk -> example.co.uk).
# A production deployment swaps in the full PSL as a broadcast dimension;
# the logic is identical.
MULTI_LABEL_SUFFIXES = ("co.uk", "org.uk", "ac.uk", "com.au", "co.jp", "com.br")

_TRACKING_RE = "^(utm_[^=]*|fbclid|gclid)(=.*)?$"


def _scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def _hostport(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))


def normalize_url(url: Column) -> Column:
    """Canonical form of ``url`` per the module-docstring contract."""
    scheme = _scheme(url)
    hostport = _hostport(url)
    # default-port strip is scheme-conditional; other ports survive
    hostport = (
        F.when(scheme == "http", F.regexp_replace(hostport, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(hostport, ":443$", ""))
        .otherwise(hostport)
    )
    hostport = F.regexp_replace(hostport, r"^www\.", "")
    rest = F.regexp_replace(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    path = F.regexp_replace(F.regexp_extract(rest, r"^([^?#]*)", 1), "/+$", "")
    rawq = F.regexp_extract(rest, r"\?([^#]*)", 1)
    params = F.array_sort(
        F.filter(
            F.split(rawq, "&"),
            lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
        )
    )
    query = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        hostport,
        path,
        F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
    )


def url_host(url: Column) -> Column:
    """Lowercased host of ``url`` (port and leading ``www.`` removed)."""
    host = F.regexp_replace(_hostport(url), ":[0-9]+$", "")
    return F.regexp_replace(host, r"^www\.", "")


def registered_domain(host: Column) -> Column:
    """The registrable domain of a host: the last two labels, or three
    when the two-label tail is a known multi-label public suffix
    (``news.example.co.uk`` -> ``example.co.uk``)."""
    labels = F.split(host, r"\.")
    n = F.size(labels)
    tail2 = F.concat_ws(".", F.element_at(labels, -2), F.element_at(labels, -1))
    tail3 = F.concat_ws(
        ".", F.element_at(labels, -3), F.element_at(labels, -2), F.element_at(labels, -1)
    )
    is_multi = tail2.isin(*MULTI_LABEL_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(is_multi & (n >= 3), tail3)
        .otherwise(tail2)
    )


def domain_blocklist_filter(
    df: DataFrame, url_col: str, blocked: Sequence[str], keep_col: str | None = None
) -> DataFrame:
    """Filter (or flag, when ``keep_col`` is given) rows whose URL's
    registered domain is on ``blocked``. The literal IN-list form here is
    right for the usual KB-scale blocklist; a list big enough to matter
    becomes a broadcast anti-join on the same ``registered_domain`` key —
    either way the fact table is never shuffled."""
    dom = registered_domain(url_host(F.col(url_col)))
    keep = ~dom.isin(*[b.lower() for b in blocked])
    if keep_col is not None:
        return df.withColumn(keep_col, keep.cast("int"))
    return df.filter(keep)
