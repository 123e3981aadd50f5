"""Deterministic synthetic web — the crawl environment.

Replaces the live network (Playwright ``scrape_website``,
scrape_eccomerce.py:28-159; ``content_scraper.scrape_website``,
util/scraper/content_scraper.py:9-106) with a *pure function of the
URL*: every URL deterministically resolves to an interleaved span
sequence (heading/text/code/image/video — the reference's four content
modalities plus the ordered H1/H2/H3/P privacy-policy stream,
scrape_pp.py:105-110) and a set of outlinks (the reference's
``soup.select`` link harvest + pagination, extract_product_urls.py:
104-133).

Because page content is a pure function, the web needs no storage and
scales to a 10^10-URL frontier: fetching is ``mapInPandas`` over
frontier partitions, embarrassingly parallel, no broadcast state.

The same functions are called one-URL-at-a-time by the sequential
reference oracle (plans/oracle.py) — the environment is shared fixture;
the engine under test is the distributed ordering/dedup/politeness/state
machinery.
"""

from __future__ import annotations

import hashlib

import pandas as pd

WEB_SEED = "synthweb-42"
N_HOSTS = 20                      # host-000 … host-018 + hot host
HOT_HOST = "hot.example.com"
UNIVERSE = 400                    # item ids per regular host
HOT_UNIVERSE = 4000               # hot host is 10x bigger (skew)
_VOCAB = (
    "sensor device hub camera thermostat lock plug bulb gateway router "
    "privacy policy data collects shares retains temperature motion "
    "humidity energy usage account email location audio video firmware "
    "cloud local encryption consent vendor manufacturer model spec"
).split()
_HEADINGS = (
    "Overview Specifications Privacy Data-Collection Features Reviews "
    "Compatibility Warranty Security Setup"
).split()
_PREDICATES = ["manufactures", "collects", "observes", "contains", "supports"]


# Bench-scale web profile: many hosts so politeness never caps the
# measured throughput; host identity is derivable from the URL alone,
# so the web stays a pure function at any scale.
BENCH_DOMAIN = ".bench.example.com"
BENCH_HOSTS = 4096
BENCH_UNIVERSE = 100_000
BENCH_HOT = f"h0{BENCH_DOMAIN}"


def hosts() -> list[str]:
    return [HOT_HOST] + [f"host-{i:03d}.example.com" for i in range(N_HOSTS - 1)]


def bench_seed_urls(n_seeds: int) -> list[str]:
    """Seeds over the 4096-host bench web; h0 is the hot host (~25%)."""
    out = []
    for i in range(n_seeds):
        d = _digest("bench-seed", i)
        k = 0 if d[0] % 4 == 0 else int.from_bytes(d[1:3], "big") % BENCH_HOSTS
        item = int.from_bytes(d[3:7], "big") % BENCH_UNIVERSE
        out.append(f"https://h{k}{BENCH_DOMAIN}/item/{item}")
    return out


def bench_robots_rows() -> list[dict]:
    rows = []
    for k in range(BENCH_HOSTS):
        d = _digest("bench-robots", k)
        rows.append(
            {
                "host": f"h{k}{BENCH_DOMAIN}",
                "disallow_prefix": "/private" if d[0] % 4 == 0 else None,
                "crawl_delay_ms": 100 + (d[1] % 4) * 100,
            }
        )
    return rows


def _digest(*parts: object) -> bytes:
    return hashlib.sha1("|".join(str(p) for p in (WEB_SEED, *parts)).encode()).digest()


def _universe(host: str) -> int:
    if host.endswith(BENCH_DOMAIN):
        return BENCH_UNIVERSE
    return HOT_UNIVERSE if host == HOT_HOST else UNIVERSE


def item_url(host: str, k: int) -> str:
    return f"https://{host}/item/{k}"


def seed_urls(n_seeds: int = 100) -> list[str]:
    """Seed list with canonicalization noise (mixed-case hosts, ref=/qid=
    tracking params, fragments) — mirrors the reference's Amazon seed
    files (server/scripts/Amazon_product_urls.txt)."""
    out = []
    hs = hosts()
    for i in range(n_seeds):
        d = _digest("seed", i)
        # hot host owns ~40% of seeds (skew)
        host = HOT_HOST if d[0] % 5 < 2 else hs[1 + d[1] % (len(hs) - 1)]
        k = int.from_bytes(d[2:6], "big") % _universe(host)
        url = item_url(host, k)
        noise = d[6] % 4
        if noise == 0:
            url = url.replace("https://", "https://") + "?ref=sr_1&qid=12345"
        elif noise == 1:
            url = url.replace(host, host.upper()) + "#reviews"
        elif noise == 2:
            url += "?utm_source=feed&b=2&a=1"
        out.append(url)
    return out


def _words(d: bytes, lo: int, hi: int, salt: int) -> str:
    n = lo + d[(salt * 3) % 20] % (hi - lo + 1)
    return " ".join(
        _VOCAB[d[(salt * 7 + j) % 20] % len(_VOCAB)] for j in range(n)
    )


def page_spans(canonical_url: str) -> list[dict]:
    """Interleaved span sequence for a URL — pure function.

    Shape mirrors the reference's page model: an ordered stream of
    heading/text runs (scrape_pp.py:105-110), plus image/code/video
    spans (content_scraper.py:62-102; video transcript in ``text``,
    media_downloader.py:44-46).  ``offset`` is dense document order.
    """
    d = _digest("page", canonical_url)
    n = 3 + d[0] % 8
    spans: list[dict] = []
    for j in range(n):
        b = d[(j + 1) % 20]
        kind_roll = b % 10
        if kind_roll < 2:
            spans.append(
                {
                    "kind": "heading",
                    "text": _HEADINGS[b % len(_HEADINGS)],
                    "media_ref": None,
                }
            )
        elif kind_roll < 7:
            spans.append(
                {"kind": "text", "text": _words(d, 4, 12, j), "media_ref": None}
            )
        elif kind_roll < 8:
            spans.append(
                {
                    "kind": "code",
                    "text": f"cfg = {{'model': '{_VOCAB[b % len(_VOCAB)]}'}}",
                    "media_ref": None,
                }
            )
        elif kind_roll < 9:
            spans.append(
                {
                    "kind": "image",
                    "text": None,
                    "media_ref": f"{canonical_url}/img/{b}.jpg",
                }
            )
        else:
            spans.append(
                {
                    "kind": "video",
                    "text": _words(d, 3, 8, j + 11),  # whisper-transcript analog
                    "media_ref": f"{canonical_url}/vid/{b}.mp4",
                }
            )
    # ~25% of pages carry a spec table (the reference's post-click
    # pd.read_html path, scrape_eccomerce.py:126-142) — shallow
    # machine-generated <tr>/<td> markup, parsed by
    # operators/htmltables.table_rows_text (F19)
    if d[1] % 4 == 0:
        n_rows = 2 + d[2] % 3
        rows = "".join(
            f"<tr><td>{_HEADINGS[d[(3 + r) % 20] % len(_HEADINGS)]}</td>"
            f"<td>{_words(d, 2, 4, r + 17)}</td></tr>"
            for r in range(n_rows)
        )
        spans.append(
            {"kind": "table", "text": f"<table>{rows}</table>", "media_ref": None}
        )
    for off, s in enumerate(spans):
        s["offset"] = off
    return spans


def page_outlinks(canonical_url: str) -> list[str]:
    """Raw outlinks for a URL — pure function; includes relative hrefs
    and tracking noise so the crawler's canonicalization is exercised
    (extract_product_urls.py:114-132)."""
    d = _digest("links", canonical_url)
    host = canonical_url.split("/")[2]
    uni = _universe(host)
    fanout = 2 + d[0] % 4
    links: list[str] = []
    for j in range(fanout):
        k = int.from_bytes(d[4 * j + 1 : 4 * j + 5], "big") % uni
        href = f"/item/{k}"
        noise = d[(j + 9) % 20] % 5
        if noise == 0:
            href += "?qid=999&ref=pd"
        elif noise == 1:
            href = f"https://{host}/item/{k}"
        elif noise == 2:
            href = f"https://{host.upper()}/item/{k}#desc"
        links.append(href)
    # cross-host edge — mostly pointing AT the hot host (skew source)
    if host.endswith(BENCH_DOMAIN):
        if d[17] % 3 != 2:
            k = 0 if d[18] % 4 == 0 else int.from_bytes(d[14:16], "big") % BENCH_HOSTS
            links.append(
                f"https://h{k}{BENCH_DOMAIN}/item/"
                f"{int.from_bytes(d[10:14], 'big') % BENCH_UNIVERSE}"
            )
    elif d[17] % 3 == 0:
        links.append(item_url(HOT_HOST, int.from_bytes(d[14:18], "big") % HOT_UNIVERSE))
    elif d[17] % 3 == 1:
        other = hosts()[1 + d[18] % (N_HOSTS - 1)]
        links.append(item_url(other, int.from_bytes(d[14:18], "big") % UNIVERSE))
    # occasional robots-disallowed path (exercises the robots gate)
    if d[19] % 7 == 0:
        links.append(f"https://{host}/private/{d[19]}")
    return links


def robots_rows() -> list[dict]:
    """Per-host politeness rules (north-rule addition; the reference has
    no robots handling — only fixed sleeps, scrape_eccomerce.py:55,
    121-124)."""
    rows = []
    for h in hosts():
        d = _digest("robots", h)
        rows.append(
            {
                "host": h,
                "disallow_prefix": "/private" if d[0] % 2 == 0 else None,
                # hot host gets a short delay (it can absorb load);
                # others 250..2250 ms
                "crawl_delay_ms": 100 if h == HOT_HOST else 250 + (d[1] % 5) * 500,
            }
        )
    return rows


# ---- vectorized fetch (the mapInPandas kernel) -------------------------

def fetch_batch(urls: pd.Series) -> pd.DataFrame:
    """Vectorized fetch+extract: canonical URLs -> (doc_id, spans,
    outlinks).  Called inside mapInPandas over frontier partitions —
    the Arrow-batched replacement for the reference's per-URL
    ``scrape_website`` loop (scrape_eccomerce.py:179-292)."""
    return pd.DataFrame(
        {
            "doc_id": urls.values,
            "spans": [page_spans(u) for u in urls],
            "outlinks": [page_outlinks(u) for u in urls],
        }
    )


def transient_ok(url: str, attempt: int, fail_mod: int, fail_attempts: int) -> bool:
    """Deterministic transient-failure model: URLs whose flaky-hash is
    ≡ 0 (mod ``fail_mod``) FAIL on attempts 0..fail_attempts-1 and
    succeed from attempt ``fail_attempts`` on (set fail_attempts ≥ the
    crawler's max_attempts for a permanent failure).  fail_mod ≤ 0
    disables the model entirely — the default crawl never fails, so
    the reference-equality contract (crawl ordering / seen set / span
    sequences) is untouched.  The analog of the reference's transient
    fetch errors behind its RETRIES=3 loops (scrape_eccomerce.py:26,
    251; entity_analysis.py:13,31)."""
    if fail_mod <= 0:
        return True
    h = int(hashlib.md5(f"flaky:{url}".encode()).hexdigest()[:15], 16)
    return not (h % fail_mod == 0 and attempt < fail_attempts)
