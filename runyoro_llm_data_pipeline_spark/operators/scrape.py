"""Web-scrape connector (S7 static / S8 dynamic) — fetch + extract.

The reference scrapes with requests+BeautifulSoup (static,
``scripts/core_components.py:45-61``) or Selenium-rendered page source
(dynamic, ``:63-81``), then takes the main content block —
``<article>``, else ``<main>``, else ``<div class="content">``, else the
whole document — as ``get_text(separator=" ", strip=True)``.

Spark-first split:

* **fetch** is I/O against the outside world — a ``mapInPandas`` stage
  with a pluggable ``url -> html`` kernel (``fetch_pages``). ``requests``
  IS importable here and ``requests_fetch_kernel`` below is the real
  static-branch kernel (exercised against a localhost ``http.server``
  fixture in ``tests/test_scrape.py`` — status codes, redirects,
  per-row error capture, no external network); selenium is absent, so
  the dynamic branch stays kernel-pluggable with the deterministic fake
  as the offline default. Batch shape, schema, and error columns are
  real either way.
  Politeness (per-domain rate limits) belongs in the kernel; partition
  by domain (``F.parse_url``-style projection) so one task owns one
  domain's budget.
* **extract** is pure string work — JVM column expressions
  (``html_main_content`` / ``html_to_text``), whole-stage-codegen'd, no
  Python. Patterns are RE2-compatible (no backreferences) so the DuckDB
  oracle runs the identical regexes (query ``scrape_extract``).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FETCH_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("html", T.StringType(), True),
        T.StructField("fetch_error", T.StringType(), True),
    ]
)


def fake_fetch_kernel(url: str) -> str:
    """Deterministic offline stand-in for requests/selenium: hash-derived
    HTML with the canonical main-content shapes."""
    import hashlib

    h = hashlib.md5(url.encode()).hexdigest()
    body = f"<p>content {h[:12]} for {url}</p>"
    shape = int(h[0], 16) % 3
    if shape == 0:
        return f"<html><body><nav>menu</nav><article>{body}</article></body></html>"
    if shape == 1:
        return f"<html><body><main>{body}</main><footer>f</footer></body></html>"
    return f"<html><body>{body}</body></html>"


def requests_fetch_kernel(
    timeout: float = 10.0, max_redirects: int = 5
) -> Callable[[str], str]:
    """The real static-scrape kernel (reference
    ``scripts/core_components.py:45-58``): ``requests.get`` with a
    bounded timeout, redirects followed up to ``max_redirects``, and
    ``raise_for_status`` so HTTP errors surface as per-row
    ``fetch_error`` values via ``fetch_pages``'s capture — one Session
    per executor task (connection pooling / keep-alive within a
    partition, the per-domain politeness unit)."""
    import requests

    session = requests.Session()
    session.max_redirects = max_redirects

    def kernel(url: str) -> str:
        resp = session.get(url, timeout=timeout)
        resp.raise_for_status()
        return resp.text

    return kernel


def fetch_pages(
    urls: DataFrame,
    kernel: Callable[[str], str] = fake_fetch_kernel,
    url_col: str = "url",
) -> DataFrame:
    """Arrow-batched fetch stage: one kernel call per URL, whole batches
    in/out, failures captured per-row in ``fetch_error`` instead of
    failing the task (the reference logs-and-returns-empty,
    ``core_components.py:56-61``)."""
    import pandas as pd

    sel = urls.select(F.col(url_col).alias("url"))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            htmls, errs = [], []
            for u in pdf["url"]:
                try:
                    htmls.append(kernel(u))
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — kernel is untrusted I/O
                    htmls.append(None)
                    errs.append(str(e)[:500])
            yield pd.DataFrame(
                {"url": pdf["url"], "html": htmls, "fetch_error": errs}
            )

    return sel.mapInPandas(run, schema=FETCH_SCHEMA)


def _nonempty(c: Column) -> Column:
    return F.when(F.length(c) > 0, c)


def html_main_content(html: Column) -> Column:
    """The soup ``find("article") or find("main") or find("div",
    class_="content")`` preference chain as RE2-safe regexp extraction;
    falls back to the whole document exactly like the reference."""
    article = F.regexp_extract(html, r"(?s)<article[^>]*>(.*?)</article>", 1)
    main = F.regexp_extract(html, r"(?s)<main[^>]*>(.*?)</main>", 1)
    divc = F.regexp_extract(
        html, r'(?s)<div[^>]*class="content"[^>]*>(.*?)</div>', 1
    )
    return F.coalesce(
        _nonempty(article), _nonempty(main), _nonempty(divc), html
    )


def html_to_text(html: Column) -> Column:
    """``get_text(separator=" ", strip=True)`` analogue: drop script/style
    subtrees (separate patterns — RE2 has no backreferences), strip tags,
    unescape the basic entities, collapse whitespace, trim."""
    x = F.regexp_replace(html, r"(?s)<script[^>]*>.*?</script>", " ")
    x = F.regexp_replace(x, r"(?s)<style[^>]*>.*?</style>", " ")
    x = F.regexp_replace(x, r"<[^>]+>", " ")
    # &amp; must unescape LAST (html.unescape parity): doing it first turns
    # '&amp;lt;' into '&lt;' and then into '<' — a double-unescape
    x = F.replace(x, F.lit("&lt;"), F.lit("<"))
    x = F.replace(x, F.lit("&gt;"), F.lit(">"))
    x = F.replace(x, F.lit("&nbsp;"), F.lit(" "))
    x = F.replace(x, F.lit("&amp;"), F.lit("&"))
    x = F.regexp_replace(x, r"\s+", " ")
    return F.trim(x)


def scrape_text(html: Column) -> Column:
    """Full extract pipeline: main-content preference → text."""
    return html_to_text(html_main_content(html))


def canonical_url(url: Column) -> Column:
    """Syntactic URL canonicalization for the web-source dedup key
    (reference ``scripts/orchestrator.py:26-31`` resolves redirects so
    ``http://X`` and ``https://x/`` dedup together; this is the
    no-network half of that identity, pure JVM column expressions):

    1. trim, drop the ``#fragment``;
    2. lowercase scheme and host (path/query case preserved);
    3. strip the scheme's default port (``http:80``, ``https:443``);
    4. empty path → ``/``; any other trailing ``/``-run stripped
       (``/a/`` ≡ ``/a``, but ``host`` alone ≡ ``host/``).

    Strings without a ``scheme://`` are returned trimmed-as-is. The
    network half (redirect following) is the ``resolve_redirects``
    kernel stage. All patterns RE2-safe and oracle-mirrored
    (query ``url_canonical``)."""
    u = F.regexp_replace(F.trim(url), r"#.*$", "")
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://", "")
    hostport = F.regexp_extract(rest, r"^([^/?]*)", 1)
    host = F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1))
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    authority = F.when(
        (port == "") | default_port, host
    ).otherwise(F.concat(host, F.lit(":"), port))
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    query = F.regexp_extract(rest, r"(\?.*)$", 1)
    stripped = F.regexp_replace(path, r"/+$", "")
    norm_path = F.when(stripped == "", F.lit("/")).otherwise(stripped)
    canon = F.concat(scheme, F.lit("://"), authority, norm_path, query)
    return F.when(scheme == "", F.trim(url)).otherwise(canon)


def url_dedup_key(url: Column) -> Column:
    """The web-source dedup identity: md5 of the canonical URL — pairs
    with the content fingerprint (A1) so two spellings of one page
    dedup together even before fetching."""
    return F.md5(canonical_url(url))


def resolve_redirects(
    urls: DataFrame,
    kernel: Callable[[str], str] | None = None,
    url_col: str = "url",
) -> DataFrame:
    """The network half of URL identity (the reference's HTTP-HEAD
    ``allow_redirects=True`` probe): an Arrow-batched ``url →
    final_url`` kernel stage, same shape as ``fetch_pages``. The default
    kernel is the identity (no network in this container); a real
    deployment passes ``lambda u: requests.head(u,
    allow_redirects=True, timeout=10).url``. Failures land per-row in
    ``resolve_error``; the input URL is kept so the pipeline can fall
    back to the syntactic canonical form."""
    import pandas as pd

    sel = urls.select(F.col(url_col).alias("url"))
    schema = T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("final_url", T.StringType(), True),
            T.StructField("resolve_error", T.StringType(), True),
        ]
    )
    k = kernel if kernel is not None else (lambda u: u)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs, errs = [], []
            for u in pdf["url"]:
                try:
                    outs.append(k(u))
                    errs.append(None)
                except Exception as e:  # noqa: BLE001 — kernel is untrusted I/O
                    outs.append(u)
                    errs.append(str(e)[:500])
            yield pd.DataFrame(
                {"url": pdf["url"], "final_url": outs, "resolve_error": errs}
            )

    return sel.mapInPandas(run, schema=schema)
