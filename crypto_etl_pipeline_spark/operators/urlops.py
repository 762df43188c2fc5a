"""URL/host canonicalization — the CCNet §2 / C4 dedup-by-URL stage.

Web-curation pipelines (CCNet, C4, RefinedWeb) dedup by NORMALIZED URL
before any content hashing: the same page refetched under tracking
parameters, case-variant hosts, default ports, or fragment anchors
must collapse to one canonical key, and that key is pure string
algebra — no network, no parsing library — so it runs expression-level
inside the scan projection at 100 TB (zero shuffle; the dedup itself
is one groupBy on the canonical key, exactly like fingerprint dedup).

The reference has no URL surface at all (SURVEY §1.1 — its only
"web" interaction is one REST GET, P:52-58); this module is
north-star extension surface (VERDICT r12 "worth adding" #1).

Canonicalization steps (each expressible identically in Spark SQL and
DuckDB, which is what keeps the oracle exact):

1. trim; drop the fragment (``#...`` — never reaches the server)
2. lowercase the scheme; default a missing scheme to ``http``
3. lowercase the host; strip a leading ``www.``; strip the scheme's
   default port (``:80`` http, ``:443`` https)
4. strip trailing ``/`` from the path; empty path -> ``/``
5. drop tracking query params (``utm_*`` prefix + the explicit
   click-id set below); sort surviving ``k=v`` pairs bytewise; drop
   the ``?`` entirely when none survive

Engine-parity notes: every regex below is valid and semantically
identical in Java regex (Spark) and RE2 (DuckDB) — no ``\\s`` classes
(the r12 ADVICE drift), no backreferences, no lookaround. Query-pair
sorting is bytewise in both (Spark array_sort / DuckDB list_sort with
default binary collation).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: explicit tracking params dropped by canonicalization (utm_* is
#: handled as a prefix match); the CCNet/C4-era click-id set
TRACKING_PARAMS = (
    "gclid",
    "fbclid",
    "msclkid",
    "igshid",
    "mc_cid",
    "mc_eid",
    "ref",
    "ref_src",
)

_SCHEME_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://"


def _scheme(u: Column) -> Column:
    s = F.lower(F.regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    return F.when(s == "", F.lit("http")).otherwise(s)


def canonical_url(url: Column | str) -> Column:
    """Spark expression computing the canonical form of ``url``.

    Pure column algebra over one row — composes into the scan
    projection; the DuckDB twin is :func:`canonical_url_sql`,
    generated from the same TRACKING_PARAMS table."""
    u = F.col(url) if isinstance(url, str) else url
    u = F.regexp_replace(F.trim(u), "#.*", "")
    scheme = _scheme(u)
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, "^[^/?]*", 0))
    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.substring(host, F.lit(1), F.length(host) - F.lit(3)),
    ).otherwise(
        F.when(
            (scheme == "https") & host.endswith(":443"),
            F.substring(host, F.lit(1), F.length(host) - F.lit(4)),
        ).otherwise(host)
    )
    # length(rest) as the slice length = "to end of string" with no
    # magic cap — symmetric with the twin's 2-arg substring, so a
    # pathological >1 MiB URL cannot make the engines diverge
    pq = F.substring(rest, F.length(hostport) + F.lit(1), F.length(rest))
    path = F.regexp_extract(pq, "^[^?]*", 0)
    path = F.regexp_replace(path, "/+$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    qraw = F.regexp_extract(pq, r"\?(.*)", 1)
    keep = F.filter(
        F.split(qraw, "&"),
        lambda p: (p != "")
        & ~p.startswith("utm_")
        & ~F.split_part(p, F.lit("="), F.lit(1)).isin(*TRACKING_PARAMS),
    )
    q = F.array_join(F.array_sort(keep), "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(q == "", F.lit("")).otherwise(F.concat(F.lit("?"), q)),
    )


def canonical_url_sql(expr: str) -> str:
    """DuckDB expression computing EXACTLY :func:`canonical_url` of
    ``expr`` — generated from the same tracking-param table so the two
    engines cannot drift. ``expr`` must be a bare column/identifier
    (it is spliced repeatedly)."""
    in_list = ", ".join(f"'{p}'" for p in TRACKING_PARAMS)
    u = f"regexp_replace(trim({expr}), '#.*', '')"
    scheme = (
        "CASE WHEN regexp_extract("
        + u
        + ", '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1) = '' THEN 'http' "
        "ELSE lower(regexp_extract(" + u + ", '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) END"
    )
    rest = f"regexp_replace({u}, '{_SCHEME_RE}', '')"
    hostport = f"lower(regexp_extract({rest}, '^[^/?]*', 0))"
    host0 = f"regexp_replace({hostport}, '^www\\.', '')"
    host = (
        f"CASE WHEN {scheme} = 'http' AND {host0} LIKE '%:80' "
        f"THEN substring({host0}, 1, length({host0}) - 3) "
        f"WHEN {scheme} = 'https' AND {host0} LIKE '%:443' "
        f"THEN substring({host0}, 1, length({host0}) - 4) "
        f"ELSE {host0} END"
    )
    pq = f"substring({rest}, length({hostport}) + 1)"
    path0 = f"regexp_replace(regexp_extract({pq}, '^[^?]*', 0), '/+$', '')"
    path = f"CASE WHEN {path0} = '' THEN '/' ELSE {path0} END"
    qraw = f"regexp_extract({pq}, '\\?(.*)', 1)"
    keep = (
        f"list_filter(string_split({qraw}, '&'), p -> p <> '' "
        f"AND NOT starts_with(p, 'utm_') "
        f"AND string_split(p, '=')[1] NOT IN ({in_list}))"
    )
    # coalesce: DuckDB array_to_string([]) is NULL where Spark
    # array_join([]) is '' — the one empty-case divergence
    q = f"coalesce(array_to_string(list_sort({keep}), '&'), '')"
    return (
        f"({scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {q} = '' THEN '' ELSE '?' || {q} END)"
    )
