"""URL canonicalization for web-scale corpora.

Common-Crawl-style pipelines key dedup, host rollups, and
cross-snapshot joins on a CANONICAL url (the reference's analog is
its deterministic CURIE identity discipline, curie_utils.py — same
role: one stable join key per entity). Rules implemented here, all
native Column expressions (whole-stage codegen; the DuckDB oracle
mirrors each regex verbatim):

1. scheme and host lowercased;
2. default ports dropped (http:80, https:443), explicit others kept;
3. fragment removed;
4. tracking params dropped (utm_*, gclid, fbclid), the rest SORTED
   byte-wise so param order can't split a dedup group;
5. empty path -> '/';
6. strings without a '<scheme>://' prefix pass through trimmed
   (opaque ids stay joinable).

At 100 TB this runs in the scan projection (no shuffle); the
canonical url then REPLACES the raw url as the partition/dedup key
so hot raw-variant families (utm-tagged syndication blasts) collapse
before the first shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
REST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://(.*)$"
TRACKING_RE = r"^(utm_[^=]*|gclid|fbclid)="


def canonical_url(c: Column) -> Column:
    """Canonical form of a URL column (rules in the module doc)."""
    s = F.trim(c)
    scheme = F.lower(F.regexp_extract(s, SCHEME_RE, 1))
    rest = F.regexp_extract(s, REST_RE, 1)
    nofrag = F.regexp_extract(rest, r"^([^#]*)", 1)
    authority = F.regexp_extract(nofrag, r"^([^/?]*)", 1)
    path = F.regexp_extract(nofrag, r"^[^/?]*([^?]*)", 1)
    query = F.regexp_extract(nofrag, r"\?(.*)$", 1)
    host = F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))
    port = F.regexp_extract(authority, r":(\d+)$", 1)
    keep_port = (port != "") & ~(
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_RE),
        )
    )
    q_str = F.when(
        F.size(params) > 0, F.concat(F.lit("?"), F.array_join(params, "&"))
    ).otherwise(F.lit(""))
    port_str = F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit(""))
    path_n = F.when(path == "", F.lit("/")).otherwise(path)
    return F.when(scheme == "", s).otherwise(
        F.concat(scheme, F.lit("://"), host, port_str, path_n, q_str)
    )


def url_host(c: Column) -> Column:
    """Lowercased host (no port) — the rollup/salting key."""
    s = F.trim(c)
    authority = F.regexp_extract(
        F.regexp_extract(s, REST_RE, 1), r"^([^/?#]*)", 1
    )
    return F.lower(F.regexp_extract(authority, r"^([^:]*)", 1))


# The same rules as a DuckDB subquery (for oracle rendering): wraps
# ``inner_sql`` (which must expose ``raw_col``) and adds a
# ``url_canonical`` column. Each nesting level mirrors one step of
# :func:`canonical_url`; regex literals are shared constants (DuckDB
# standard string literals pass backslashes through untouched, so
# the identical pattern text reaches RE2 and the Java regex engine).
def canonical_url_sql(inner_sql: str, raw_col: str) -> str:
    return f"""
    SELECT * EXCLUDE (u_s, u_scheme, u_nofrag, u_auth, u_path, u_query,
                      u_host, u_port, u_params),
      CASE WHEN u_scheme = '' THEN u_s ELSE
        u_scheme || '://' || u_host ||
        CASE WHEN u_port <> ''
              AND NOT ((u_scheme = 'http' AND u_port = '80')
                    OR (u_scheme = 'https' AND u_port = '443'))
             THEN ':' || u_port ELSE '' END ||
        CASE WHEN u_path = '' THEN '/' ELSE u_path END ||
        CASE WHEN len(u_params) > 0
             THEN '?' || array_to_string(u_params, '&') ELSE '' END
      END AS url_canonical
    FROM (
      SELECT *,
        lower(regexp_extract(u_auth, '^([^:]*)', 1)) AS u_host,
        regexp_extract(u_auth, ':(\\d+)$', 1) AS u_port,
        list_sort(list_filter(string_split(u_query, '&'),
          p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_RE}'))) AS u_params
      FROM (
        SELECT *,
          regexp_extract(u_nofrag, '^([^/?]*)', 1) AS u_auth,
          regexp_extract(u_nofrag, '^[^/?]*([^?]*)', 1) AS u_path,
          regexp_extract(u_nofrag, '\\?(.*)$', 1) AS u_query
        FROM (
          SELECT *,
            lower(regexp_extract(u_s, '{SCHEME_RE}', 1)) AS u_scheme,
            regexp_extract(regexp_extract(u_s, '{REST_RE}', 1),
                           '^([^#]*)', 1) AS u_nofrag
          FROM (SELECT *, trim({raw_col}) AS u_s FROM ({inner_sql}))
        )
      )
    )
    """
