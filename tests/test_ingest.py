"""WARC parsing + HTML text extraction (operators/ingest.py): constructed
archives incl. per-record gzip members, malformed-archive routing, and
the html.parser extraction contract. The catalog entries
t_warc_ingest_real / t_html_extract_real value-check the Spark pipeline
against DuckDB; these tests pin the operator-level edge cases the
construct-in-query oracle can't express (gzip, corruption, nesting)."""

from __future__ import annotations

import gzip

import pandas as pd
import pytest

from surge_spark.operators.ingest import (
    extract_html_text,
    extract_warc_records,
    html_to_text,
    parse_warc,
)


def _record(warc_type: str, body: bytes, uri: str = "") -> bytes:
    hdr = f"WARC/1.0\r\nWARC-Type: {warc_type}\r\n"
    if uri:
        hdr += f"WARC-Target-URI: {uri}\r\n"
    hdr += f"Content-Length: {len(body)}\r\n\r\n"
    return hdr.encode() + body + b"\r\n\r\n"


def _http(body: bytes, status: int = 200, ctype: str = "text/plain") -> bytes:
    return (
        f"HTTP/1.1 {status} OK\r\nContent-Type: {ctype}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode() + body


def test_parse_warc_multi_record_http_split():
    payload = (
        _record("warcinfo", b"software: test\r\n")
        + _record("request", b"GET / HTTP/1.1\r\n\r\n", uri="http://a/")
        + _record("response", _http(b"hello world", 404, "text/html"),
                  uri="http://a/")
    )
    recs = parse_warc(payload)
    assert [r["warc_type"] for r in recs] == ["warcinfo", "request", "response"]
    resp = recs[2]
    assert resp["target_uri"] == "http://a/"
    assert resp["http_status"] == 404
    assert resp["content_type"] == "text/html"
    assert resp["body"] == b"hello world"
    # the request record embeds an HTTP message too, but not a response:
    # no status parsed, body intact
    assert recs[1]["http_status"] is None


def test_parse_warc_gzip_members_commoncrawl_layout():
    r1 = _record("response", _http(b"alpha"), uri="http://a/")
    r2 = _record("response", _http(b"beta"), uri="http://b/")
    payload = gzip.compress(r1) + gzip.compress(r2)  # one member per record
    recs = parse_warc(payload)
    assert [r["body"] for r in recs] == [b"alpha", b"beta"]
    assert [r["target_uri"] for r in recs] == ["http://a/", "http://b/"]


def test_parse_warc_corruption_raises_value_error():
    good = _record("response", _http(b"x"), uri="http://a/")
    with pytest.raises(ValueError):
        parse_warc(b"NOTWARC/1.0\r\n\r\n")
    with pytest.raises(ValueError):
        parse_warc(good[: len(good) // 2])  # truncated body
    # declared length beyond the payload
    bad = good.replace(b"Content-Length: ", b"Content-Length: 9")
    with pytest.raises(ValueError):
        parse_warc(bad)
    # corrupt gzip member
    with pytest.raises(ValueError):
        parse_warc(b"\x1f\x8b" + b"\x00" * 40)


def test_extract_html_text_skips_and_counts():
    text, title, n_links = extract_html_text(
        "<html><head><title>T  i</title><style>p{}</style></head><body>"
        "<script>var a = '<p>not text</p>';</script>"
        "<p>one   two</p><div>three<noscript>nope</noscript></div>"
        '<a href="u">link</a><a name="x">not a link</a></body></html>'
    )
    # anchor text IS visible text; only href-carrying anchors count as links
    assert text == "one two three link not a link"
    assert title == "T i"
    assert n_links == 1


def test_extract_html_script_is_cdata_first_close_wins():
    """html.parser treats <script> content as CDATA (the browser rule:
    script elements cannot nest) — the inner '<script>' never registers
    as a tag and the FIRST '</script>' ends the element, so 'z' is
    visible and the stray close must not underflow the skip depth."""
    text, _, _ = extract_html_text(
        "<body>a<script>x<script>y</script>z</script>b</body>"
    )
    assert text == "a z b"


def test_extract_warc_records_spark_fan_out_and_error_row(spark):
    good = _record("response", _http(b"hello"), uri="http://a/") + _record(
        "response", _http(b"bye"), uri="http://b/"
    )
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2], "payload": [good, b"garbage"]})
    )
    out = extract_warc_records(df).toPandas().sort_values(
        ["id", "record_index"]
    )
    ok = out[out.id == 1]
    assert list(ok.record_index) == [0, 1]
    assert list(ok.target_uri) == ["http://a/", "http://b/"]
    assert [bytes(b) for b in ok.body] == [b"hello", b"bye"]
    err = out[out.id == 2].iloc[0]
    assert err.record_index == -1 and err.warc_type.startswith("error:")


def test_html_to_text_spark(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "id": [1],
                "html": ["<title>t</title><p>a  b</p><a href='x'></a>"],
            }
        )
    )
    row = html_to_text(df).collect()[0]
    assert (row.text, row.title, row.n_links, row.n_chars) == ("a b", "t", 1, 3)


def test_parse_sitemap_namespace_gzip_and_dtd_rejection():
    import gzip as _gz

    from surge_spark.operators.ingest import parse_sitemap

    xml = (
        b'<?xml version="1.0"?>'
        b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        b"<url><loc>http://a/1</loc><lastmod>2024-01-01</lastmod></url>"
        b"<url><loc> http://a/2 </loc></url>"
        b"<url><lastmod>no-loc-dropped</lastmod></url>"
        b"</urlset>"
    )
    for payload in (xml, _gz.compress(xml)):
        urls = parse_sitemap(payload)
        assert [u["loc"] for u in urls] == ["http://a/1", "http://a/2"]
        assert urls[0]["lastmod"] == "2024-01-01" and urls[1]["lastmod"] is None
    # namespace-less variant parses identically
    bare = xml.replace(b' xmlns="http://www.sitemaps.org/schemas/sitemap/0.9"', b"")
    assert [u["loc"] for u in parse_sitemap(bare)] == ["http://a/1", "http://a/2"]
    with pytest.raises(ValueError, match="DTD"):
        parse_sitemap(b'<?xml version="1.0"?><!DOCTYPE x [<!ENTITY a "b">]><urlset/>')
    with pytest.raises(ValueError):
        parse_sitemap(b"<urlset><url>")  # malformed XML


def test_review_fixes_warc_framing_and_folding():
    """r10 third-review regressions: (a) an LF-framed record whose BODY
    carries an HTTP header block must not swallow the body into the WARC
    headers (earliest terminator wins); (b) obs-fold HTTP continuation
    lines append to the previous value instead of failing the archive;
    (c) the per-member gzip clamp must not reject multi-member archives
    past 64 MB TOTAL (only per-member growth counts)."""
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\nhello"
    lf_rec = (
        b"WARC/1.0\nWARC-Type: response\nWARC-Target-URI: http://a/\n"
        + b"Content-Length: %d\n\n" % len(http)
        + http
        + b"\n\n"
    )
    recs = parse_warc(lf_rec)
    assert recs[0]["http_status"] == 200 and recs[0]["body"] == b"hello"

    folded = (
        b"HTTP/1.1 200 OK\r\nX-Long: part one\r\n\t and two\r\n"
        b"Content-Type: text/css\r\n\r\nbody"
    )
    recs = parse_warc(_record("response", folded, uri="http://a/"))
    assert recs[0]["content_type"] == "text/css"
    assert recs[0]["body"] == b"body"

    big = _record("response", _http(b"z" * 1_000_000), uri="http://a/")
    payload = b"".join(gzip.compress(big, compresslevel=1) for _ in range(70))
    recs = parse_warc(payload)  # ~70 MB total, each member ~1 MB: fine
    assert len(recs) == 70


def test_review_fixes_sitemap_dtd_anywhere_and_head_text():
    from surge_spark.operators.ingest import parse_sitemap

    pad = b"<!-- " + b"x" * 5000 + b" -->"
    with pytest.raises(ValueError, match="DTD"):
        parse_sitemap(
            b'<?xml version="1.0"?>' + pad
            + b'<!DOCTYPE urlset [<!ENTITY b "bb">]><urlset/>'
        )
    # head text (outside title) is dropped; unclosed head still yields body
    text, title, _ = extract_html_text(
        "<head><meta x>LEAKED<title>t</title><body>real</body>"
    )
    assert text == "real" and title == "t"


def test_stream_warc_records_end_to_end(spark, tmp_path):
    """Streaming ingestion: two archives (one per-record-gzipped) land in
    a watched directory; every record comes out exactly once with true
    fields, keyed by a stable path hash."""
    import gzip as _gz

    from surge_spark.operators.ingest import stream_warc_records

    d = tmp_path / "archives"
    d.mkdir()
    a1 = _record("response", _http(b"alpha"), uri="http://a/") + _record(
        "response", _http(b"beta"), uri="http://b/"
    )
    a2 = _gz.compress(_record("response", _http(b"gamma"), uri="http://c/"))
    (d / "one.warc").write_bytes(a1)
    (d / "two.warc.gz").write_bytes(a2)
    q = (
        stream_warc_records(spark, str(d), max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("warc_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from warc_out").collect()
    got = sorted((r.target_uri, bytes(r.body)) for r in rows)
    assert got == [
        ("http://a/", b"alpha"),
        ("http://b/", b"beta"),
        ("http://c/", b"gamma"),
    ]
    # two distinct archive ids, each stable per path
    assert len({r.id for r in rows}) == 2


def test_parse_warc_junk_http_header_falls_back_to_raw_body():
    # ADVICE r10: one colon-free junk HTTP header line must not abort the
    # ENTIRE archive — WARC framing stays authoritative, the bad record
    # degrades to a raw non-HTTP body, neighbors parse normally.
    good = _record("response", _http(b"fine"), uri="http://ok/")
    junk_http = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"this line has no colon\r\n\r\nbody-bytes"
    )
    bad = _record("response", junk_http, uri="http://junk/")
    recs = parse_warc(good + bad + good)
    assert [r["warc_type"] for r in recs] == ["response"] * 3
    assert recs[0]["body"] == b"fine" and recs[2]["body"] == b"fine"
    # the junk record keeps the whole HTTP block as its raw body and
    # reports no parsed status
    assert recs[1]["target_uri"] == "http://junk/"
    assert recs[1]["http_status"] is None
    assert recs[1]["body"] == junk_http


def test_evaluate_robots_semantics():
    """urllib.robotparser behaviors the catalog oracle relies on, pinned:
    per-agent group selection (specific group shadows *), first-match
    prefix rules with Allow, default allow on empty/garbled bodies."""
    from surge_spark.operators.ingest import evaluate_robots

    body = (
        "User-agent: badbot\nDisallow: /\n\n"
        "User-agent: *\nAllow: /d1/ok\nDisallow: /d1/\n"
    )
    assert evaluate_robots(body, "surgebot", "http://x/d1/page") is False
    assert evaluate_robots(body, "surgebot", "http://x/d1/ok") is True
    assert evaluate_robots(body, "surgebot", "http://x/d2/page") is True
    assert evaluate_robots(body, "badbot", "http://x/anything") is False
    # lenient on garbage: junk lines skipped, empty body allows all
    assert evaluate_robots("%%% not robots\n\x00\xff", "a", "http://x/") is True
    assert evaluate_robots("", "a", "http://x/") is True


def test_check_robots_spark(spark):
    from surge_spark.operators.ingest import check_robots

    df = spark.createDataFrame(
        [
            (1, "User-agent: *\nDisallow: /a/", "http://x/a/p"),
            (2, "User-agent: *\nDisallow: /a/", "http://x/b/p"),
        ],
        "id long, robots_txt string, url string",
    )
    got = {r.id: r.allowed for r in check_robots(df).collect()}
    assert got == {1: False, 2: True}
