"""URL canonicalization + host extraction (web-curation tier).

A Common-Crawl-style corpus reaches the same page through many raw URL
forms — scheme/host case, default ports, `www.` prefixes, tracking
params, fragments, trailing slashes. Canonicalizing before host-level
dup statistics is a standard pre-dedup step (the URL-level rung BELOW
the content ladder: exact digest -> MinHash/LSH -> ...): two rows with
equal canonical URLs are re-crawls by construction, no content pass
needed.

Everything here is a shared ``*_sql()`` helper (the cross-engine hard
rule): the SAME expression string runs as Spark ``F.expr`` and inside
the DuckDB oracle. Cross-engine regex discipline:
  - no backslash escapes (Spark string literals consume them; DuckDB
    does not) — character classes like ``[?]`` instead;
  - no backreferences (Java ``$1`` vs RE2 ``\\1``) — literal
    ``replace()`` for the port / www steps;
  - every regex is end-anchored and single-occurrence, so DuckDB's
    replace-first and Spark's replace-all agree.

Scale shape: canonicalization is pure per-row string expressions —
whole-stage codegen, zero UDF, zero shuffle. The host-level stats agg
is a partial+final hash aggregate; COUNT(DISTINCT canonical) expands to
the standard two-phase (host, canonical) pre-aggregate, so a hot host
(popular domain — the reference's hot-cell skew case, handled the same
way) never concentrates raw rows on one task.

The raw-URL derivation synthesises the mess DETERMINISTICALLY from
doc_id (documents carry no url column; same device as the q35 point
derivation): consecutive groups of six doc_ids are six raw forms of ONE
canonical page on one host, so per-host dup rates are exact by
construction and any canonicalization defect breaks the q66 hash.
"""

from __future__ import annotations

N_URL_HOSTS = 23

# the six raw forms, keyed by doc_id % 6 (group id = doc_id - doc_id % 6):
#   0 clean | 1 upper-cased scheme+host | 2 explicit default :443 |
#   3 www. prefix | 4 trailing slash + utm tracking param | 5 fragment


def _dom_sql(id_col: str) -> str:
    """Host id: derived from the GROUP id so all six raw forms of a page
    live on the same host."""
    return f"((({id_col} - {id_col} % 6) * 131 + 7) % {N_URL_HOSTS})"


def raw_url_sql(id_col: str = "doc_id") -> str:
    dom = f"CAST({_dom_sql(id_col)} AS STRING)"
    pid = f"CAST({id_col} - {id_col} % 6 AS STRING)"
    lo_host = f"'d' || {dom} || '.example.com'"
    up_host = f"'D' || {dom} || '.EXAMPLE.COM'"
    path = f"'/p/' || {pid}"
    return (
        f"CASE CAST({id_col} % 6 AS INT) "
        f"WHEN 0 THEN 'https://' || {lo_host} || {path} "
        f"WHEN 1 THEN 'HTTPS://' || {up_host} || {path} "
        f"WHEN 2 THEN 'https://' || {lo_host} || ':443' || {path} "
        f"WHEN 3 THEN 'https://www.' || {lo_host} || {path} "
        f"WHEN 4 THEN 'https://' || {lo_host} || {path} || '/?utm_source=feed' "
        f"ELSE 'https://' || {lo_host} || {path} || '#section-2' END"
    )


def canonical_url_sql(url_sql: str) -> str:
    """Canonical form: strip fragment, strip the (trailing-position)
    tracking param, lowercase, drop explicit default port and ``www.``,
    drop trailing slashes. Production corpora would parse the query
    string into a map and filter a tracking-key set; the single-param
    regex here keeps the expression engine-portable (see module
    docstring) with identical semantics on this derivation."""
    s = f"split_part({url_sql}, '#', 1)"
    s = f"regexp_replace({s}, '[?]utm_[a-z_]+=[a-z]*$', '')"
    s = f"lower({s})"
    s = f"replace({s}, ':443/', '/')"
    s = f"replace({s}, '://www.', '://')"
    return f"regexp_replace({s}, '/+$', '')"


def host_sql(canonical_sql: str) -> str:
    return f"split_part(split_part({canonical_sql}, '://', 2), '/', 1)"


def warc_ts_sql(id_col: str = "doc_id") -> str:
    """Epoch-second crawl timestamp, deterministic and NON-monotone in
    doc_id (jitter step 40503 shares only a factor 3 with the 86400-s
    day, so consecutive ids in a six-form group land on distinct
    seconds in scrambled order) — the latest-snapshot winner is never
    just ``max(doc_id)``, which would let an argmax-on-the-wrong-column
    bug pass the contract. Fits int64 far past 10^12 docs."""
    return f"(1690000000 + ({id_col} * 40503 + 13) % 86400)"


N_OUT_LINKS = 3


def link_target_sql(id_col: str, j: int) -> str:
    """Host id of the j-th out-link (j in 1..N_OUT_LINKS) of the page
    containing ``id_col``. Derived from the canonical GROUP id (all six
    raw forms link identically) with an offset in [1, N-1], so a page
    NEVER links to its own host — the self-loop filter is by
    construction, not a predicate. Two links of one page MAY hit the
    same target host (real corpora do); the host-edge collapse
    deduplicates. Engine-portable integer arithmetic only."""
    if not 1 <= j <= N_OUT_LINKS:
        raise ValueError(f"j must be in 1..{N_OUT_LINKS}")
    g = f"({id_col} - {id_col} % 6)"
    src = _dom_sql(id_col)
    off = f"(1 + ({g} * {17 + j} + {j * j * 5}) % {N_URL_HOSTS - 1})"
    return f"(({src} + {off}) % {N_URL_HOSTS})"


def intdiv_sql(a_sql: str, b_sql: str) -> str:
    """Portable exact integer division for 0 <= a < 2^53: Spark has no
    ``//`` and DuckDB's ``/`` is float division, but (a - a % b) is
    exactly divisible so the quotient is an integer-valued double in
    BOTH engines — the final cast is exact, no round-vs-truncate
    hazard (the CLAUDE.md CAST rule does not bite on integers)."""
    return f"CAST((({a_sql}) - ({a_sql}) % ({b_sql})) / ({b_sql}) AS BIGINT)"


def host_name_sql(dom_sql: str) -> str:
    """Host id -> the canonical host string (matches host_sql output)."""
    return f"('d' || CAST({dom_sql} AS STRING) || '.example.com')"


def round_ratio_sql(num_sql: str, den_sql: str) -> str:
    """Exact small-int ratio, rounded once at the end — both engines
    compute the identical double (the dup_rate_sql device, generalized).
    Caller guarantees den > 0."""
    return (
        f"round(CAST({num_sql} AS DOUBLE) / CAST({den_sql} AS DOUBLE), 9)"
    )


def dup_rate_sql(n_col: str = "n_pages", canon_col: str = "n_canonical") -> str:
    """Exact small-int division, rounded once at the end (both engines
    compute the identical double)."""
    return (
        f"round(CAST({n_col} - {canon_col} AS DOUBLE) / "
        f"CAST({n_col} AS DOUBLE), 9)"
    )
