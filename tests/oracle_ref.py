"""FROZEN sequential oracle simulator — the executable stand-in for the
(absent) reference `tokawah/TripAdvisor-Crawling-Suite`.

Pure Python, ZERO Spark imports.  Encodes exactly the reference semantics
pinned by BASELINE.json:6/14/15 (the reference tree at /root/reference was
empty in this sandbox — SURVEY.md §0):

  * a single sequential fetch loop (one in-flight request),
  * seed hotel-ID list driving a hotelID -> overview -> review-page fanout,
  * listing pages (oa offsets) fetched before review-detail pages,
  * an in-memory URL-seen set (skip re-fetch),
  * robots disallow-prefix rules honored before fetch,
  * a per-host virtual politeness clock (token bucket: `burst` free slots,
    then t += 1/effective_rate per fetch),
  * per-document ordered span sequences (kind, text, media_ref, offset).

FREEZE RULE (SURVEY.md §5.2): this file defines the reference for this repo.
It must never be edited in the same change as engine code.

All site content comes from crawlspark.pagegen (shared pure functions).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Set, Tuple

from crawlspark import pagegen as pg

BASE_TS_ISO = "2024-01-01T00:00:00"  # virtual clock epoch (FIXTURES.md §6)
DEFAULT_MAX_RPS = 2.0
HOT_HOST_MAX_RPS = 0.5
BURST = 4


def budget_for(host: str) -> Tuple[float, int]:
    """(max_rps, burst) per FIXTURES.md §4."""
    return (HOT_HOST_MAX_RPS if host == pg.HOT_HOST else DEFAULT_MAX_RPS, BURST)


def effective_rate(host: str) -> float:
    """Politeness rate after robots crawl-delay (min of the two)."""
    rate, _ = budget_for(host)
    if host == pg.CRAWL_DELAY_HOST:
        rate = min(rate, 1000.0 / pg.CRAWL_DELAY_MS)
    return rate


def token_bucket_offset(n: int, rate: float, burst: int) -> float:
    """Virtual-clock offset (seconds) of the n-th (0-based) fetch on a host:
    the first `burst` fetches are immediate, then one per 1/rate seconds.
    The Spark engine computes the IDENTICAL arithmetic as a native column
    expression (crawlspark/polite.py) — shared semantics, one definition."""
    if n < burst:
        return 0.0
    return (n - burst + 1) / rate


def robots_disallowed(url: str) -> bool:
    host = url.split("://", 1)[1].split("/", 1)[0]
    if host not in pg.ROBOTS_HOSTS:
        return False
    path = pg.url_path(url)
    return any(path.startswith(p) for p in pg.DISALLOW_PREFIXES)


@dataclass
class OracleResult:
    crawl_order: List[Tuple[int, str]] = field(default_factory=list)  # (seq, url) 1-based
    seen: Set[int] = field(default_factory=set)  # signed xxh64 of fetched URLs
    documents: Dict[str, List[Tuple[str, Optional[str], Optional[str], int]]] = field(
        default_factory=dict
    )
    blocked: Set[str] = field(default_factory=set)  # robots-blocked URLs
    fetch_offsets: Dict[str, float] = field(default_factory=dict)  # url -> virtual clock offset


def run_oracle(n_hotels: int = 100) -> OracleResult:
    res = OracleResult()
    seq = 0
    host_n: Dict[str, int] = {}  # per-host fetch count (token-bucket index)

    def fetch(url: str) -> bool:
        nonlocal seq
        h = pg.url_hash(url)
        if h in res.seen:
            return False
        if robots_disallowed(url):
            res.blocked.add(url)
            return False
        res.seen.add(h)
        seq += 1
        res.crawl_order.append((seq, url))
        host = url.split("://", 1)[1].split("/", 1)[0]
        n = host_n.get(host, 0)
        host_n[host] = n + 1
        rate = effective_rate(host)
        _, burst = budget_for(host)
        res.fetch_offsets[url] = token_bucket_offset(n, rate, burst)
        return True

    # ---- stage 1: all listing pages, oa-offset order, then host order ----
    listed: Set[int] = set()
    max_pages = max(len(pg.listing_offsets(n_hotels, h)) for h in pg.HOSTS)
    for k in range(max_pages):
        for host in pg.HOSTS:  # HOSTS is lexicographically ordered
            offs = pg.listing_offsets(n_hotels, host)
            if k < len(offs):
                if fetch(pg.listing_url(host, offs[k])):
                    for r in pg.listing_page_hotels(n_hotels, host, offs[k]):
                        listed.add(r)

    # ---- stages 2+3: per seed(listing_rank) order: overview, then its
    # review pages in or-offset order (BASELINE.json:6 fanout) ----
    for rank in sorted(listed):
        hid = pg.hotel_id(rank)
        host = pg.hotel_host(rank)
        if not fetch(pg.overview_url(host, hid)):
            continue  # blocked/dup ⇒ review pages never discovered
        did = pg.doc_id_for(rank)
        p = pg.n_review_pages(hid)
        m = p + 1  # total pages carrying this document's spans
        spans = list(pg.page_spans(did, 0, m))
        for k in range(p):
            if fetch(pg.review_url(host, hid, pg.REVIEW_STEP * k)):
                spans += pg.page_spans(did, k + 1, m)
        res.documents[did] = sorted(spans, key=lambda s: s[3])
    return res
