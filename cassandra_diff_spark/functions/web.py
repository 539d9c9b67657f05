"""URL / domain scalar functions for web-corpus curation — all Catalyst
``regexp_extract`` expressions (JVM-side, codegen'd, zero Python), each
with a DuckDB SQL twin so every operator built on them stays
oracle-checkable.

Patterns are RE2-compatible (no lookaround/backreferences) so the same
literal pattern runs identically under Java regex (Spark) and RE2
(DuckDB) — the cross-engine property the twins rely on.

``registered_domain`` is the last-two-labels heuristic, NOT the Public
Suffix List: `a.b.co.uk` yields `co.uk`. Real pipelines that need PSL
accuracy should map hosts through a broadcast PSL table; the heuristic is
kept dependency-free and deterministic here.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: scheme '://' [userinfo '@'] host [':' port] [path] ['?' query]
_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/:?#]+)"
_PORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?[^/:?#]+:([0-9]+)"
_PATH_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*(/[^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_REG_DOMAIN_RE = r"([^.]+\.[^.]+)$"


def url_scheme(url: Column) -> Column:
    return F.regexp_extract(url, _SCHEME_RE, 1)


def url_host(url: Column) -> Column:
    return F.regexp_extract(url, _HOST_RE, 1)


def url_port(url: Column) -> Column:
    """Port as a string; empty when absent (regexp_extract's no-match
    convention, kept so the twins agree on the empty-string encoding)."""
    return F.regexp_extract(url, _PORT_RE, 1)


def url_path(url: Column) -> Column:
    return F.regexp_extract(url, _PATH_RE, 1)


def url_query(url: Column) -> Column:
    return F.regexp_extract(url, _QUERY_RE, 1)


def registered_domain(host: Column) -> Column:
    """Last-two-labels registered domain (heuristic — see module doc)."""
    return F.regexp_extract(host, _REG_DOMAIN_RE, 1)


def url_parts(url: Column) -> Column:
    """All parts as one struct — one pass over the string per part, all
    inside whole-stage codegen."""
    return F.struct(
        url_scheme(url).alias("scheme"),
        url_host(url).alias("host"),
        url_port(url).alias("port"),
        url_path(url).alias("path"),
        url_query(url).alias("query"),
        registered_domain(url_host(url)).alias("domain"),
    )


# ------------------------------------------------------------- SQL twins

def _sql(expr: str, pattern: str) -> str:
    # DuckDB regexp_extract(col, pattern, group) returns '' on no match —
    # same convention as Spark's regexp_extract
    escaped = pattern.replace("'", "''")
    return f"regexp_extract({expr}, '{escaped}', 1)"


def url_scheme_sql(expr: str) -> str:
    return _sql(expr, _SCHEME_RE)


def url_host_sql(expr: str) -> str:
    return _sql(expr, _HOST_RE)


def url_port_sql(expr: str) -> str:
    return _sql(expr, _PORT_RE)


def url_path_sql(expr: str) -> str:
    return _sql(expr, _PATH_RE)


def url_query_sql(expr: str) -> str:
    return _sql(expr, _QUERY_RE)


def registered_domain_sql(host_expr: str) -> str:
    return _sql(host_expr, _REG_DOMAIN_RE)


#: query params that never change content: analytics/click tracking
_TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|ref|ref_src)(=.*)?$"
#: fragment (never sent to the server)
_FRAGMENT_RE = r"#.*$"


def canonical_url(url: Column) -> Column:
    """Canonical form for URL-level dedup of a web corpus — two crawls
    of the same page must collapse to ONE key:

    * scheme and host lowercase; userinfo dropped,
    * default ports stripped (``http:80`` / ``https:443``), others kept,
    * fragment dropped (never reaches the server),
    * tracking params (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``,
      ``ref``, ``ref_src``) removed; surviving params SORTED so
      ``?b=2&a=1`` == ``?a=1&b=2``,
    * trailing path slash trimmed (except the root path).

    Pure Catalyst (``regexp_extract`` + array ``filter``/``sort``),
    RE2-compatible patterns — same bits from the DuckDB twin. Non-URL
    strings (no ``scheme://``) return NULL: filter first.
    """
    nofrag = F.regexp_replace(url, _FRAGMENT_RE, "")
    scheme = F.lower(F.regexp_extract(nofrag, _SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(nofrag, _HOST_RE, 1))
    port = F.regexp_extract(nofrag, _PORT_RE, 1)
    path = F.regexp_extract(nofrag, _PATH_RE, 1)
    query = F.regexp_extract(nofrag, _QUERY_RE, 1)

    keep_port = F.when(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443")),
        F.lit(""),
    ).otherwise(F.concat(F.lit(":"), port))
    clean_path = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"(.)/$", r"$1")
    )
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING_RE),
    )
    qpart = F.when(
        F.size(params) == 0, F.lit("")
    ).otherwise(F.concat(F.lit("?"), F.array_join(F.array_sort(params), "&")))
    return F.when(
        scheme == "", F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, keep_port, clean_path, qpart))


def canonical_url_sql(expr: str) -> str:
    """DuckDB twin of :func:`canonical_url`."""
    nofrag = f"regexp_replace({expr}, '#.*$', '')"
    scheme = f"lower({_sql(nofrag, _SCHEME_RE)})"
    host = f"lower({_sql(nofrag, _HOST_RE)})"
    port = _sql(nofrag, _PORT_RE)
    path = _sql(nofrag, _PATH_RE)
    query = _sql(nofrag, _QUERY_RE)
    keep_port = (
        f"CASE WHEN coalesce({port}, '') = '' "
        f"  OR ({scheme} = 'http' AND {port} = '80') "
        f"  OR ({scheme} = 'https' AND {port} = '443') THEN '' "
        f"ELSE ':' || {port} END"
    )
    clean_path = (
        f"CASE WHEN coalesce({path}, '') = '' THEN '/' "
        f"ELSE regexp_replace({path}, '(.)/$', '\\1') END"
    )
    params = (
        f"[p for p in regexp_split_to_array(coalesce({query}, ''), '&') "
        f"if p <> '' and not regexp_matches(p, '{_TRACKING_RE}')]"
    )
    qpart = (
        f"CASE WHEN len({params}) = 0 THEN '' "
        f"ELSE '?' || array_to_string(list_sort({params}), '&') END"
    )
    return (
        f"CASE WHEN coalesce({scheme}, '') = '' THEN NULL "
        f"ELSE {scheme} || '://' || {host} || {keep_port} "
        f"|| {clean_path} || {qpart} END"
    )


# ------------------------------------------------------------- HTML strip

#: tag-strip steps, applied in order. RE2-compatible (lazy quantifiers,
#: inline flags, NO lookaround/backreferences) so Spark (Java regex) and
#: DuckDB (RE2) produce identical text; '\s' is avoided because Java and
#: RE2 disagree on \x0B membership — the explicit class below is the
#: engine-stable spelling.
_HTML_TAG_STEPS = (
    (r"(?s)<!--.*?-->", " "),                 # comments first (may hide tags)
    (r"(?is)<script[^>]*>.*?</script>", " "), # script bodies are not text
    (r"(?is)<style[^>]*>.*?</style>", " "),
    (r"(?s)<[^>]*>", " "),                    # any remaining tag
)
#: minimal entity decode (the high-frequency web five + nbsp); '&amp;'
#: LAST so '&amp;lt;' decodes to the literal '&lt;' like a single-pass
#: HTML parser would.
_HTML_ENTITY_STEPS = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
)
_WS_RUN = r"[ \t\n\r\f]+"


def strip_html(col: Column) -> Column:
    """Markup-to-text for crawled documents: drop comments, script and
    style bodies, then every remaining tag; decode the six dominant
    entities; collapse whitespace runs to single spaces and trim.

    Pure Catalyst ``regexp_replace`` chain — JVM-side, codegen'd, zero
    Python — with a bit-identical DuckDB twin (:func:`strip_html_sql`).
    This is the dependency-free extraction step (trafilatura-class
    boilerplate/readability extraction needs a DOM; pair this with
    ``curate.strip_boilerplate_lines`` for the corpus-frequency cut).
    """
    x = col
    for pat, rep in _HTML_TAG_STEPS:
        x = F.regexp_replace(x, pat, rep)
    for ent, rep in _HTML_ENTITY_STEPS:
        x = F.regexp_replace(x, ent, rep)
    return F.trim(F.regexp_replace(x, _WS_RUN, " "))


def strip_html_sql(expr: str) -> str:
    def q(s: str) -> str:
        return s.replace("'", "''")

    x = expr
    for pat, rep in _HTML_TAG_STEPS:
        x = f"regexp_replace({x}, '{q(pat)}', '{q(rep)}', 'g')"
    for ent, rep in _HTML_ENTITY_STEPS:
        x = f"regexp_replace({x}, '{q(ent)}', '{q(rep)}', 'g')"
    return f"trim(regexp_replace({x}, '{q(_WS_RUN)}', ' ', 'g'))"
