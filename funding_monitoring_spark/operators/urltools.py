"""URL canonicalization, entirely JVM-side (no UDF, no Python worker).

Web-scale dedup starts at the URL: the same resource arrives under
scheme/host case variants, explicit default ports, dot-segment paths,
shuffled query parameters and fragments. canonicalize_url folds all
of that to one normal form with built-in expressions only — regexps
for the split, lower() for case, an aggregate() fold with an ARRAY
accumulator for RFC 3986 dot-segment removal (Catalyst allows a
different accumulator type than the element type, so the segment
stack stays in codegen), array_sort for query params.

Normal form: lowercase scheme and host, userinfo stripped
(user:pass@host identifies the same resource as host), default ports
stripped (http:80 / https:443), path dot-segments resolved ('.'
dropped, '..' pops, leading '/' preserved, empty path becomes '/'),
query params sorted lexicographically ('?' dropped when empty),
fragment dropped. IPv6 literal authorities ('[::1]:8080') are OUT OF
PROFILE and refuse loudly row-level via raise_error — the bracket
syntax needs its own host grammar, and silently mis-splitting it
would collapse distinct resources."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonicalize_url"]

_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# anchored through the pre-fragment prefix: a '?' INSIDE the fragment
# (legal per RFC 3986) must not be read as a query string
_QUERY = r"^[^#?]*\?([^#]*)"


def _resolve_dots(path: Column) -> Column:
    """RFC 3986 remove_dot_segments as an aggregate fold: split on
    '/', push plain segments, pop on '..', drop '.' and empties, then
    rejoin under a leading '/'."""
    segs = F.split(path, "/")
    stack = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, s: (
            # '..' pops; past the root it clamps (RFC 3986 5.2.4)
            F.when(
                s == "..",
                F.when(F.size(acc) > 0,
                       F.slice(acc, 1, F.size(acc) - 1))
                .otherwise(acc),
            )
            .when((s == ".") | (s == ""), acc)
            .otherwise(F.concat(acc, F.array(s)))
        ),
    )
    return F.concat(F.lit("/"), F.array_join(stack, "/"))


def canonicalize_url(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    scheme = F.lower(F.regexp_extract(c, _SCHEME, 1))
    authority = F.lower(F.regexp_extract(c, _AUTHORITY, 1))
    # userinfo ('user:pass@') folds away — same resource; stripping it
    # BEFORE the host/port split also keeps 'user:pass@host' from
    # mis-parsing as host='user' port-less (ADVICE r10)
    bare = F.regexp_replace(authority, r"^[^@]*@", "")
    # IPv6 literals need the bracket grammar; refuse loudly row-level
    # (raise_error inside when/otherwise — not pruned, no extra scan)
    bare = F.when(
        bare.startswith("["),
        F.raise_error(
            F.concat(
                F.lit("canonicalize_url: IPv6 literal authority "
                      "out of profile: "),
                bare,
            )
        ),
    ).otherwise(bare)
    host = F.regexp_extract(bare, r"^([^:]*)", 1)
    port = F.regexp_extract(bare, r":(\d+)$", 1)
    default_port = (
        ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
        | (port == "")
    )
    netloc = F.when(default_port, host).otherwise(
        F.concat(host, F.lit(":"), port)
    )
    path = _resolve_dots(F.regexp_extract(c, _PATH, 1))
    query = F.regexp_extract(c, _QUERY, 1)
    sorted_query = F.array_join(
        F.array_sort(F.split(query, "&")), "&"
    )
    return F.concat(
        scheme,
        F.lit("://"),
        netloc,
        path,
        F.when(query == "", F.lit("")).otherwise(
            F.concat(F.lit("?"), sorted_query)
        ),
    )
