"""S7/S8 scrape connector: pluggable fetch kernel + JVM extraction."""

from pyspark.sql import functions as F

from runyoro_llm_data_pipeline_spark.operators.scrape import (
    fetch_pages,
    html_main_content,
    html_to_text,
    scrape_text,
)


def test_fetch_pages_fake_kernel_and_error_capture(spark):
    urls = spark.createDataFrame(
        [("https://a.example/x",), ("https://b.example/y",), ("boom://z",)],
        "url string",
    )

    def kernel(u: str) -> str:
        if u.startswith("boom"):
            raise RuntimeError("connection refused")
        return f"<html><body><article><p>page {u}</p></article></body></html>"

    got = {r["url"]: r for r in fetch_pages(urls, kernel=kernel).collect()}
    assert got["https://a.example/x"]["html"].startswith("<html>")
    assert got["https://a.example/x"]["fetch_error"] is None
    # failures land in fetch_error, not task failure (reference logs+skips)
    assert got["boom://z"]["html"] is None
    assert "connection refused" in got["boom://z"]["fetch_error"]

    # deterministic default kernel: same URL → same page
    a = fetch_pages(urls.limit(1)).collect()[0]["html"]
    b = fetch_pages(urls.limit(1)).collect()[0]["html"]
    assert a == b


def test_extraction_preference_chain(spark):
    cases = [
        # article wins over surrounding noise incl. script subtree
        ("<html><body><nav>m</nav><article><p>A &amp; B</p></article>"
         "<script>var x=1;</script></body></html>", "A & B"),
        # main is the fallback after article
        ("<html><body><main><h1>T</h1><p>body text</p></main>"
         "<footer>f</footer></body></html>", "T body text"),
        # div.content third
        ('<html><body><div class="content"><p>inner</p></div>'
         "<div>outer</div></body></html>", "inner"),
        # nothing matches → whole document text (reference fallback)
        ("<html><body><div class=\"nav\">MENU</div><p>x  y</p></body></html>",
         "MENU x y"),
        # style subtree dropped, entities unescaped, whitespace collapsed
        ("<html><style>p{color:red}</style><body><p>a&lt;b&nbsp;&gt;c</p>"
         "</body></html>", "a<b >c"),
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(cases)], "i int, html string"
    )
    got = {
        r["i"]: r["t"]
        for r in df.select("i", scrape_text(F.col("html")).alias("t")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, got[i], want)


def test_extract_is_jvm_only(spark):
    """The extraction pipeline must stay in whole-stage codegen (no
    Python eval nodes) — scrape extraction at 100 TB is regex over
    billions of pages."""
    df = spark.range(10).select(
        F.concat(F.lit("<html><body><p>t"), F.col("id"), F.lit("</p></body></html>")).alias("html")
    )
    plan = df.select(html_to_text(html_main_content(F.col("html"))).alias("t"))
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_canonical_url_rules(spark):
    """Round-3 (VERDICT item 5): syntactic URL canonicalization — the
    no-network half of the reference's redirect-resolved dedup identity."""
    from runyoro_llm_data_pipeline_spark.operators.scrape import canonical_url

    cases = [
        ("HTTP://Example.COM:80/Docs/7/", "http://example.com/Docs/7"),
        ("https://EXAMPLE.com:443/a", "https://example.com/a"),
        ("https://example.com/a#frag", "https://example.com/a"),
        ("http://example.com:8080/a?q=A&b=2", "http://example.com:8080/a?q=A&b=2"),
        ("HTTPS://Sub.Example.COM", "https://sub.example.com/"),
        ("  http://example.com/a//b///  ", "http://example.com/a//b"),
        ("ftp://Files.Example.com:21/Data/1", "ftp://files.example.com:21/Data/1"),
        ("not a url 3 ", "not a url 3"),
        ("http://x/", "http://x/"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i int, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url(F.col("url")).alias("c")).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, (u, got[i], want)


def test_canonical_url_is_jvm_only(spark):
    from runyoro_llm_data_pipeline_spark.operators.scrape import canonical_url

    df = spark.range(10).select(
        F.concat(F.lit("http://Example.com:80/p/"), F.col("id")).alias("url")
    )
    plan = df.select(canonical_url(F.col("url")).alias("c"))
    s = plan._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in s and "ArrowEvalPython" not in s


def test_resolve_redirects_kernel_and_errors(spark):
    """Redirect-resolve stage: kernel applied per row, failures captured
    per-row (input URL kept) — task never dies on a bad URL."""
    from runyoro_llm_data_pipeline_spark.operators.scrape import resolve_redirects

    def kernel(u):
        if "boom" in u:
            raise RuntimeError("connection refused")
        return u.replace("http://", "https://www.")

    df = spark.createDataFrame(
        [("http://a.com/x",), ("http://boom.com/y",)], ["url"]
    )
    rows = {r["url"]: r for r in resolve_redirects(df, kernel=kernel).collect()}
    assert rows["http://a.com/x"]["final_url"] == "https://www.a.com/x"
    assert rows["http://a.com/x"]["resolve_error"] is None
    assert rows["http://boom.com/y"]["final_url"] == "http://boom.com/y"
    assert "connection refused" in rows["http://boom.com/y"]["resolve_error"]


def test_requests_kernel_against_localhost_http_server(spark):
    """S7 through a REAL HTTP boundary (no external network): a stdlib
    http.server on 127.0.0.1 serves pages, a redirect, and a 404;
    ``requests_fetch_kernel`` (reference core_components.py:45-58) rides
    ``fetch_pages``'s mapInPandas stage — success rows carry the body,
    the redirect is followed transparently, and the 404 lands in
    ``fetch_error`` instead of failing the task."""
    import http.server
    import threading

    from runyoro_llm_data_pipeline_spark.operators.scrape import (
        requests_fetch_kernel,
    )

    PAGE = (
        "<html><body><article><p>served over real http</p></article>"
        "</body></html>"
    )

    class Handler(http.server.BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/page":
                body = PAGE.encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            elif self.path == "/redirect":
                self.send_response(301)
                self.send_header("Location", "/page")
                self.send_header("Content-Length", "0")
                self.end_headers()
            else:
                self.send_error(404, "not found")

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{port}"
        urls = spark.createDataFrame(
            [(f"{base}/page",), (f"{base}/redirect",), (f"{base}/missing",)],
            "url string",
        )
        got = {
            r["url"]: r
            for r in fetch_pages(
                urls, kernel=requests_fetch_kernel(timeout=5.0)
            ).collect()
        }
        assert got[f"{base}/page"]["html"] == PAGE
        assert got[f"{base}/page"]["fetch_error"] is None
        # 301 followed to /page — same body, no error
        assert got[f"{base}/redirect"]["html"] == PAGE
        assert got[f"{base}/redirect"]["fetch_error"] is None
        # HTTP error captured per-row (raise_for_status → fetch_error)
        assert got[f"{base}/missing"]["html"] is None
        assert "404" in got[f"{base}/missing"]["fetch_error"]
        # and the extract stage runs unchanged on the real fetch output
        ok = fetch_pages(
            urls.limit(1), kernel=requests_fetch_kernel(timeout=5.0)
        ).select(scrape_text(F.col("html")).alias("t")).collect()[0]["t"]
        assert ok == "served over real http"
    finally:
        srv.shutdown()
        srv.server_close()
