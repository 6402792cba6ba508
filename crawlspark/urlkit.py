"""URL kernel — canonicalization, host extraction, 64-bit hashing.

All pure native column expressions (whole-stage-codegen-able, BASELINE.json:15
"no per-row Python").  The canonicalization pipeline is deliberately written
with `regexp_extract`/`regexp_replace`/higher-order array functions only, so
the DuckDB oracle SQL in __spark_entry__.py can mirror it token-for-token
(DuckDB has no parse_url).

Reference behavior note: the reference builds URLs by template arithmetic so
they are canonical by construction [SURVEY.md §2 C1]; the target mandates an
explicit canonicalize + xxhash64 step (BASELINE.json:6 "URL canonicalization
+ 64-bit hashing").
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Query params dropped during canonicalization (tracking noise).
_DROP_PARAM_RE = r"^(utm_[^=]*|ref|fbclid|gclid)="
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"


def strip_fragment(url: Column) -> Column:
    return F.regexp_replace(F.trim(url), r"#.*", "")


_HEX_DIGITS = "0123456789ABCDEF"
_UNRESERVED_RE = r"^[A-Za-z0-9._~\-]$"


def pct_normalize(url: Column) -> Column:
    """RFC 3986 §6.2.2 percent-encoding normalization, in pure native
    expressions: decode escapes of UNRESERVED characters (%7E ≡ ~, %41 ≡ A)
    and uppercase the hex of every escape that must stay encoded (%2f →
    %2F).  Decoding an unreserved char can never introduce a URL delimiter,
    so this is safe to apply to the whole string before component parsing.
    Malformed escapes ('%G1', trailing '%') pass through verbatim.
    Idempotent (property-tested)."""
    parts = F.split(url, "%", -1)

    def piece(p: Column) -> Column:
        hx = p.substr(1, 2)
        rest = p.substr(F.lit(3), F.length(p))
        valid = hx.rlike("^[0-9A-Fa-f]{2}$")
        code = (
            (F.instr(F.lit(_HEX_DIGITS), F.upper(p.substr(1, 1))) - 1) * 16
            + F.instr(F.lit(_HEX_DIGITS), F.upper(p.substr(2, 1)))
            - 1
        )
        ch = F.char(code)
        return (
            F.when(valid & ch.rlike(_UNRESERVED_RE), F.concat(ch, rest))
            .when(valid, F.concat(F.lit("%"), F.upper(hx), rest))
            .otherwise(F.concat(F.lit("%"), p))
        )

    tail = F.slice(parts, 2, F.greatest(F.size(parts) - 1, F.lit(0)))
    normalized = F.concat(
        F.element_at(parts, 1), F.array_join(F.transform(tail, piece), "")
    )
    # fast path: URLs with no '%' skip the split/transform machinery entirely
    # (measured ~35% of the whole canonicalize cost on escape-free URLs —
    # the transform lambda is interpreted per element); the guard changes
    # nothing semantically because normalization is the identity there
    return F.when(F.instr(url, F.lit("%")) == 0, url).otherwise(normalized)


def scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, _SCHEME_RE, 1))


def hostport(url: Column) -> Column:
    return F.lower(F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]+)", 1))


def host(url: Column) -> Column:
    """Host without port, lowercased."""
    return F.regexp_replace(hostport(strip_fragment(url)), r":\d+$", "")


def _port(hp: Column) -> Column:
    return F.regexp_extract(hp, r":(\d+)$", 1)


def _path(url: Column) -> Column:
    p = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+([^?#]*)", 1)
    p = F.regexp_replace(p, r"/+$", "")
    return F.when(p == "", F.lit("/")).otherwise(p)


def _query(url: Column) -> Column:
    q = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda x: (x != "") & ~x.rlike(_DROP_PARAM_RE),
        )
    )
    return F.array_join(kept, "&")


def canonicalize(url: Column) -> Column:
    """Canonical URL: lowercase scheme+host, default port stripped, fragment
    stripped, percent-escapes normalized (unreserved decoded, kept escapes
    upper-hexed), trailing slashes trimmed, tracking params dropped,
    remaining query params sorted.  Idempotent (property-tested).

    IDN contract: this native pipeline case-folds hosts (``F.lower`` is
    unicode-aware) but does NOT punycode them — punycode/NFC are not
    expressible in native column expressions.  On corpora with
    international hosts, apply ``idn_normalize_hosts`` first (Arrow-batched,
    ASCII fast path stays native) so ``münchen.example`` and
    ``xn--mnchen-3ya.example`` share one url_h.

    COMPILE-COST NOTE: this expression form substitutes the (large)
    pct_normalize tree at every one of the ~6 component references below —
    fine in expression contexts, but DataFrame callers should prefer
    ``with_canonical``, whose projection boundary keeps the tree linear
    (measured ~5× less driver compile time, identical values)."""
    return _canonical_from_norm(pct_normalize(strip_fragment(url)))


def _canonical_from_norm(u: Column) -> Column:
    """Component assembly of ``canonicalize`` over an ALREADY
    fragment-stripped, pct-normalized url expression — the one definition
    shared by the expression form and the staged DataFrame form."""
    sch = scheme(u)
    hp = hostport(u)
    hst = F.regexp_replace(hp, r":\d+$", "")
    prt = _port(hp)
    keep_port = (
        (prt != "")
        & ~((sch == F.lit("https")) & (prt == "443"))
        & ~((sch == F.lit("http")) & (prt == "80"))
    )
    q = _query(u)
    return F.concat(
        sch,
        F.lit("://"),
        hst,
        F.when(keep_port, F.concat(F.lit(":"), prt)).otherwise(F.lit("")),
        _path(u),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def with_canonical(df, url_col: str = "url", out_col: str = "url_canon"):
    """DataFrame-level ``canonicalize`` with a projection boundary after the
    pct-normalization stage: the normalized url is a named column, so the
    component expressions reference an attribute instead of re-inlining the
    whole pct_normalize tree ~6 times.  Values are identical to
    ``canonicalize`` (equality-tested); driver compile time is ~5× lower
    (CLAUDE.md expression-composition trap — measured 1.47s → 0.31s).
    CollapseProject will not undo the boundary: the normalized column is a
    non-cheap expression referenced more than once."""
    tmp = f"__{out_col}_norm"
    return (
        df.withColumn(tmp, pct_normalize(strip_fragment(F.col(url_col))))
        .withColumn(out_col, _canonical_from_norm(F.col(tmp)))
        .drop(tmp)
    )


def _idn_host_ascii_one(h: str | None) -> str | None:
    """IDNA ToASCII for one host: NFC + casefold, then per-label punycode
    via Python's built-in idna codec (IDNA 2003 nameprep — public stdlib).
    Hosts the codec rejects (empty labels, oversize labels, stray
    whitespace) fall back to the NFC+casefolded form — still deterministic
    and still unifying the case/normalization-form variants."""
    import unicodedata

    if h is None:
        return None
    h2 = unicodedata.normalize("NFC", h).casefold()
    if h2.isascii():
        return h2
    try:
        return h2.encode("idna").decode("ascii")
    except UnicodeError:
        return h2


def idn_normalize_hosts(df, url_col: str = "url"):
    """Rewrite each URL's host to its IDN-normalized ASCII (punycode) form,
    so a unicode host and its punycode twin canonicalize to the SAME url —
    and therefore the same url_h — instead of being fetched twice
    (``münchen.example`` ≡ ``xn--mnchen-3ya.example``, composed ≡
    decomposed umlauts, casefold beyond ASCII).

    Contract (also stated in ``canonicalize``): the pure-native pipeline
    performs unicode CASE-FOLDING only (``F.lower`` is unicode-aware);
    punycode/NFC are not expressible in native column expressions, so this
    step is an Arrow-batched pandas UDF applied to the HOST substring only,
    with a native non-ASCII SPLIT — ASCII URLs (the overwhelming majority
    of a web corpus) go down a branch whose plan contains no Python stage
    at all.  (A ``F.when(needs, udf(...))`` gate would NOT achieve that:
    Spark hoists the pandas UDF into an unconditional ArrowEvalPython node
    and applies the CASE WHEN afterward — measured, every ASCII row still
    paid the Python round-trip — hence the filter/union shape.)  A
    ``user@host`` userinfo prefix is preserved verbatim and excluded from
    punycoding.  Run this BEFORE canonicalize on corpora with international
    hosts; it is idempotent and composes with canonicalize's own
    idempotence (both property-tested)."""
    # explicit functionType: the module's postponed annotations would leave
    # pandas_udf's type-hint inference with unresolvable string hints
    _idn_ascii = F.pandas_udf(
        lambda hs: hs.map(_idn_host_ascii_one), "string"
    )

    u = F.trim(F.col(url_col))
    hp = hostport(u)
    # userinfo (user@) is not part of the IDN host; keep it verbatim
    ui = F.regexp_extract(hp, r"^([^@]*@)", 1)
    hst = F.regexp_replace(F.regexp_replace(hp, r"^[^@]*@", ""), r":\d+$", "")
    needs = hst.rlike(r"[^\x00-\x7F]")
    sch = scheme(u)
    prt = _port(hp)
    rest = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+(.*)", 1)
    rebuilt = F.concat(
        sch,
        F.lit("://"),
        ui,
        _idn_ascii(hst),
        F.when(prt != "", F.concat(F.lit(":"), prt)).otherwise(F.lit("")),
        rest,
    )
    # The ASCII-branch predicate is NULL-guarded: rlike is NULL for a NULL
    # url, and a NULL predicate would fail BOTH filter(~needs) and
    # filter(needs), silently dropping the row (ADVICE r3).  The guard lives
    # on the ASCII side only, so null/hostless rows pass through unchanged
    # while the Python stage's input filter stays a bare RLIKE (the
    # plan-shape contract: ArrowEvalPython directly above Filter(RLIKE)).
    ascii_side = df.filter(~F.coalesce(needs, F.lit(False)))
    intl_side = df.filter(needs).withColumn(url_col, rebuilt)
    return ascii_side.unionByName(intl_side)


def hash64(url: Column) -> Column:
    """Signed 64-bit xxhash64 of the (already canonical) URL — the engine's
    universal URL key (BASELINE.json:6 '64-bit hashing')."""
    return F.xxhash64(url)


def with_url_key(df, url_col: str = "url"):
    """Attach canonical form + hash: the standard pre-frontier projection
    (staged canonicalize — see with_canonical)."""
    return with_canonical(df, url_col).withColumn(
        "url_h", hash64(F.col("url_canon"))
    )


def resolve(base: Column, href: Column) -> Column:
    """RFC 3986 §5 reference resolution in native expressions: absolutize a
    discovered link against its page URL — the step between link extraction
    and canonicalize in a real crawl (hrefs are mostly relative).

    Handles absolute URLs, scheme-relative (//host/x), root-relative (/x),
    and path-relative (x, ./x, ../x) references, including dot-segment
    removal via an aggregate fold over path segments (push/pop — bounded by
    path depth, so the interpreted-lambda cost is a few steps per URL).
    Query-only ('?q') and fragment-only refs keep the base path.  Tested
    against Python's urllib.parse.urljoin on a seeded reference corpus."""
    raw_path = _resolve_raw_path(F.trim(base), F.trim(href))
    # dot-segment removal on the path component only
    o2 = F.regexp_extract(raw_path, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+)", 1)
    p2 = F.regexp_extract(raw_path, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+([^?#]*)", 1)
    tail = F.regexp_extract(raw_path, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+[^?#]*([?#].*)?$", 1)
    return _resolve_merge(o2, p2, tail)


def _resolve_raw_path(b: Column, h: Column) -> Column:
    """Absolutized-but-unnormalized target URL (RFC 3986 §5.3 merge) —
    shared by the expression and staged forms of resolve."""
    origin = F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+)", 1)
    bpath = F.regexp_extract(b, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+([^?#]*)", 1)
    bdir = F.when(
        bpath.rlike("/"), F.regexp_replace(bpath, r"[^/]*$", "")
    ).otherwise(F.lit("/"))
    sch = F.regexp_extract(b, _SCHEME_RE, 1)

    bquery = F.regexp_extract(b, r"(\?[^#]*)", 1)
    return (
        F.when(h.rlike(_SCHEME_RE), h)  # already absolute
        .when(h.startswith("//"), F.concat(sch, F.lit(":"), h))
        .when(h.startswith("/"), F.concat(origin, h))
        .when(h.startswith("?"), F.concat(origin, bpath, h))
        # fragment-only and empty refs keep the base QUERY too (RFC 3986 §5.3)
        .when(h.startswith("#"), F.concat(origin, bpath, bquery, h))
        .when(h == "", F.concat(origin, bpath, bquery))
        .otherwise(F.concat(origin, bdir, h))
    )


def _resolve_merge(o2: Column, p2: Column, tail: Column) -> Column:
    """Dot-segment removal + reassembly over the (origin, path, ?#-tail)
    components — shared by both resolve forms."""
    segs = F.split(p2, "/")
    folded = F.aggregate(
        segs,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(x == ".", acc)
        .when(
            x == "..",
            F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))),
        )
        .otherwise(F.concat(acc, F.array(x))),
    )
    # a trailing '.' or '..' segment leaves a directory path (trailing slash)
    dir_tail = F.element_at(segs, -1).isin(".", "..")
    clean = F.concat(
        F.array_join(folded, "/"), F.when(dir_tail, F.lit("/")).otherwise(F.lit(""))
    )
    clean = F.when(clean.startswith("/"), clean).otherwise(F.concat(F.lit("/"), clean))
    return F.when(
        p2 == "", F.concat(o2, F.when(tail.isNull(), F.lit("")).otherwise(tail))
    ).otherwise(F.concat(o2, clean, F.when(tail.isNull(), F.lit("")).otherwise(tail)))


def with_resolved(df, base_col: str, href_col: str, out_col: str = "url_res"):
    """DataFrame-level ``resolve`` with projection boundaries between its
    stages (raw-path merge, then component extraction, then dot-segment
    fold): identical values to the expression form — both build from the
    same _resolve_raw_path/_resolve_merge pieces — but each stage
    references named columns instead of re-inlining the previous stage's
    tree at every use (the CLAUDE.md expression-composition trap; the
    expression form substitutes raw_path 3× and compounds through the
    fold's re-references)."""
    rp, c_o, c_p, c_t = (f"__{out_col}_{s}" for s in ("rp", "o", "p", "t"))
    d = df.withColumn(
        rp, _resolve_raw_path(F.trim(F.col(base_col)), F.trim(F.col(href_col)))
    )
    d = (
        d.withColumn(
            c_o, F.regexp_extract(F.col(rp), r"^([A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+)", 1)
        )
        .withColumn(
            c_p, F.regexp_extract(F.col(rp), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+([^?#]*)", 1)
        )
        .withColumn(
            c_t,
            F.regexp_extract(
                F.col(rp), r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]+[^?#]*([?#].*)?$", 1
            ),
        )
    )
    return d.withColumn(
        out_col, _resolve_merge(F.col(c_o), F.col(c_p), F.col(c_t))
    ).drop(rp, c_o, c_p, c_t)
