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
