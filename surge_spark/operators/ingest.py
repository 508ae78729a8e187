"""Web-archive ingestion: WARC record parsing, HTML text extraction and
sitemap URL extraction — the front stages of a CommonCrawl-style
pretraining pipeline, pure stdlib (email-style header parse + gzip
members; html.parser; xml.etree with DTD rejection), running as
Arrow-batched mapInPandas with no shuffle.

WARC (ISO 28500) is the format web crawls actually ship in: a
concatenation of records, each a header block of "Name: value" lines
framed by Content-Length, optionally with every record its own gzip
member (the CommonCrawl layout — stdlib zlib handles member-at-a-time
inflation). ``parse_warc`` yields (warc_type, target_uri, http_status,
content_type, body) per record, splitting the embedded HTTP response
header off response records. ``extract_html_text`` runs a real
html.parser pass: visible text (script/style/head subtrees dropped),
the <title>, and link count — the boilerplate-free-text stage quality
scoring and dedup consume downstream.

Error contract matches the media decoders: malformed inputs raise
ValueError (never IndexError/Unicode surprises escape the operator);
the Spark operators route per-record failures to null fields rather
than killing the Arrow batch. Decompression is bomb-clamped: a member
may inflate to at most ``_MAX_RECORD`` bytes.

Reference anchor: surge has no ingestion surface at all; this extends
the pipeline-extras family (SURVEY §2 extension).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator
from html.parser import HTMLParser

import pandas as pd
from pyspark.sql import DataFrame

from ..session import ensure_shipped

_MAX_RECORD = 64 * 1024 * 1024  # one record may not inflate past 64 MB


def _split_headers(block: bytes) -> dict[str, str]:
    """Parse a CRLF/LF header block of "Name: value" lines (names
    case-folded). Legacy obs-fold continuation lines (leading SP/HT —
    still present in old crawls' HTTP headers) append to the previous
    header's value instead of being parsed as header lines; a colon-free
    line that ISN'T a continuation is malformed."""
    headers: dict[str, str] = {}
    last: str | None = None
    for line in block.split(b"\n"):
        line = line.rstrip(b"\r")
        if not line:
            continue
        if line[:1] in (b" ", b"\t"):  # obs-fold continuation
            if last is not None:
                headers[last] += " " + line.strip().decode("latin-1")
            continue
        name, sep, value = line.partition(b":")
        if not sep or not name.strip():
            raise ValueError(f"malformed WARC header line: {line[:60]!r}")
        last = name.strip().decode("latin-1").lower()
        headers[last] = value.strip().decode("latin-1")
    return headers


_MAX_ARCHIVE = 256 * 1024 * 1024  # whole-archive inflate ceiling


def _gunzip_members(payload: bytes) -> bytes:
    """Inflate a concatenation of gzip members (the per-record-gzipped
    CommonCrawl layout) into one plain byte stream. Bomb clamps apply
    PER MEMBER (_MAX_RECORD — matching the per-record Content-Length
    cap) plus an explicit whole-archive ceiling (_MAX_ARCHIVE); clamping
    the cumulative total at the member limit would reject every valid
    multi-record archive past 64 MB (the r10 review finding)."""
    out = bytearray()
    pos = 0
    while pos < len(payload):
        member_start = len(out)
        d = zlib.decompressobj(wbits=31)  # gzip wrapper
        try:
            out += d.decompress(payload[pos:], _MAX_RECORD + 1)
        except zlib.error as e:
            raise ValueError(f"corrupt gzip member in WARC: {e}") from e
        if len(out) - member_start > _MAX_RECORD:
            raise ValueError("WARC gzip member exceeds inflate clamp")
        if len(out) > _MAX_ARCHIVE:
            raise ValueError("WARC archive exceeds total inflate clamp")
        if not d.eof:
            raise ValueError("truncated gzip member in WARC")
        consumed = len(payload) - pos - len(d.unused_data)
        if consumed <= 0:
            break
        pos += consumed
    return bytes(out)


def parse_warc(payload: bytes) -> list[dict]:
    """Parse a WARC file (plain or per-record-gzipped) into records:
    [{warc_type, target_uri, http_status, content_type, body}]. For
    ``response`` records carrying an HTTP message, the status line and
    HTTP headers are split off: ``http_status`` is the numeric status,
    ``content_type`` the HTTP Content-Type, ``body`` the entity bytes.
    Non-HTTP records report the WARC-level Content-Type and the raw
    block as body."""
    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members(payload)
    records = []
    pos = 0
    n = len(payload)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and payload[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not payload[pos : pos + 5] == b"WARC/":
            raise ValueError("WARC record does not start with WARC/ version")
        # EARLIEST of the two terminators wins: preferring CRLFCRLF found
        # anywhere later would let an LF-framed record whose BODY contains
        # an HTTP header block (CRLFCRLF) swallow the body into the WARC
        # headers (the r10 review finding)
        crlf = payload.find(b"\r\n\r\n", pos)
        lf = payload.find(b"\n\n", pos)
        if crlf == -1 and lf == -1:
            raise ValueError("unterminated WARC header block")
        if lf == -1 or (crlf != -1 and crlf <= lf):
            hdr_end, sep_len = crlf, 4
        else:
            hdr_end, sep_len = lf, 2
        version_end = payload.find(b"\n", pos)
        headers = _split_headers(payload[version_end + 1 : hdr_end])
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("WARC record missing Content-Length") from e
        if not 0 <= length <= _MAX_RECORD:
            raise ValueError(f"WARC Content-Length {length} out of range")
        body_start = hdr_end + sep_len
        if body_start + length > n:
            raise ValueError("truncated WARC record body")
        block = payload[body_start : body_start + length]
        pos = body_start + length
        warc_type = headers.get("warc-type", "")
        http_status = None
        content_type = headers.get("content-type", "")
        body = block
        if block[:5] == b"HTTP/":
            he = block.find(b"\r\n\r\n")
            hs = 4
            if he == -1:
                he = block.find(b"\n\n")
                hs = 2
            if he != -1:
                status_line = block.split(b"\n", 1)[0].decode(
                    "latin-1", "replace"
                )
                parts = status_line.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    http_status = int(parts[1])
                # One colon-free junk HTTP header line (common in real
                # crawls) must not abort the whole archive: WARC-level
                # framing stays authoritative, the record falls back to a
                # raw non-HTTP body.
                try:
                    hh = _split_headers(
                        block[block.find(b"\n") + 1 : he]
                    )
                except ValueError:
                    hh = None
                    http_status = None
                if hh is not None:
                    content_type = hh.get("content-type", content_type)
                    body = block[he + hs :]
        records.append(
            {
                "warc_type": warc_type,
                "target_uri": headers.get("warc-target-uri", ""),
                "http_status": http_status,
                "content_type": content_type,
                "body": body,
            }
        )
    return records


class _TextExtractor(HTMLParser):
    """Visible-text extraction: drop script/style/head subtrees, capture
    <title>, count <a href> links. <head> is tracked as a FLAG closed by
    </head> OR an opening <body>, not as skip depth — tag-soup pages
    routinely leave head unclosed, and a depth counter would then
    swallow the whole body."""

    _SKIP = {"script", "style", "noscript", "template"}

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.title_chunks: list[str] = []
        self.n_links = 0
        self._skip_depth = 0
        self._in_title = False
        self._in_head = False

    def handle_starttag(self, tag, attrs):
        if tag in self._SKIP:
            self._skip_depth += 1
        elif tag == "head":
            self._in_head = True
        elif tag == "body":
            self._in_head = False
        elif tag == "title":
            self._in_title = True
        elif tag == "a" and any(k == "href" for k, _v in attrs):
            self.n_links += 1

    def handle_endtag(self, tag):
        if tag in self._SKIP and self._skip_depth:
            self._skip_depth -= 1
        elif tag == "head":
            self._in_head = False
        elif tag == "title":
            self._in_title = False

    def handle_data(self, data):
        if self._in_title:
            self.title_chunks.append(data)
        elif not self._skip_depth and not self._in_head:
            self.chunks.append(data)


def extract_html_text(html: str) -> tuple[str, str, int]:
    """(visible_text, title, n_links) from an HTML document — whitespace
    in the visible text normalized to single spaces."""
    p = _TextExtractor()
    p.feed(html)
    p.close()
    text = " ".join(" ".join(p.chunks).split())
    title = " ".join(" ".join(p.title_chunks).split())
    return text, title, p.n_links


WARC_RECORD_SCHEMA = (
    "id long, record_index int, warc_type string, target_uri string, "
    "http_status int, content_type string, n_body_bytes long, body binary"
)


def extract_warc_records(df: DataFrame, id_col: str = "id") -> DataFrame:
    """One output row per WARC record across the input archives — the
    1:N ingestion fan-out (an archive explodes into documents). Runs in
    mapInPandas so archive payloads never shuffle; a malformed archive
    yields a single record_index=-1 row with the error class in
    warc_type rather than killing the batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "id", "record_index", "warc_type", "target_uri",
            "http_status", "content_type", "n_body_bytes", "body",
        ]
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                payload = bytes(rec.payload)
                try:
                    parsed = parse_warc(payload)
                except ValueError as e:
                    rows.append(
                        {
                            "id": rec.id,
                            "record_index": -1,
                            "warc_type": f"error:{e}"[:200],
                            "target_uri": "",
                            "http_status": None,
                            "content_type": "",
                            "n_body_bytes": 0,
                            "body": b"",
                        }
                    )
                    continue
                for i, r in enumerate(parsed):
                    rows.append(
                        {
                            "id": rec.id,
                            "record_index": i,
                            "warc_type": r["warc_type"],
                            "target_uri": r["target_uri"],
                            "http_status": r["http_status"],
                            "content_type": r["content_type"],
                            "n_body_bytes": len(r["body"]),
                            "body": r["body"],
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    ensure_shipped(df.sparkSession)
    cols = df.select(df[id_col].alias("id"), "payload")
    return cols.mapInPandas(run, schema=WARC_RECORD_SCHEMA)


HTML_TEXT_SCHEMA = (
    "id long, text string, title string, n_links int, n_chars int"
)


def html_to_text(df: DataFrame, id_col: str = "id", html_col: str = "html") -> DataFrame:
    """Visible-text extraction over mapInPandas: one row per input with
    the boilerplate-free text, <title>, link count and text length —
    what quality scoring / language id / dedup consume. Undecodable
    HTML (parser errors are rare — html.parser is forgiving by design)
    yields empty text rather than killing the batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "text", "title", "n_links", "n_chars"]
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                try:
                    text, title, n_links = extract_html_text(rec.html or "")
                except Exception:  # html.parser is lenient; belt anyway
                    text, title, n_links = "", "", 0
                rows.append(
                    {
                        "id": rec.id,
                        "text": text,
                        "title": title,
                        "n_links": n_links,
                        "n_chars": len(text),
                    }
                )
            yield pd.DataFrame(rows, columns=cols)

    ensure_shipped(df.sparkSession)
    cols = df.select(df[id_col].alias("id"), df[html_col].alias("html"))
    return cols.mapInPandas(run, schema=HTML_TEXT_SCHEMA)


def parse_sitemap(payload: bytes) -> list[dict]:
    """Parse a sitemaps.org urlset (namespace-agnostic) into
    [{loc, lastmod}] — the crawl-frontier feed. gzip payloads inflate
    first (sitemap.xml.gz is the common shipping form). DTDs are
    rejected outright: stdlib expat would happily expand internal
    entities (billion-laughs), and no real sitemap carries a DOCTYPE."""
    import xml.etree.ElementTree as ET

    if payload[:2] == b"\x1f\x8b":
        payload = _gunzip_members(payload)
    if len(payload) > _MAX_RECORD:
        raise ValueError("sitemap payload exceeds size clamp")
    # scan the WHOLE payload (already size-clamped, so the scan is cheap):
    # a DOCTYPE pushed past any fixed window by comment padding would
    # otherwise bypass the guard entirely (the r10 review finding)
    if b"<!DOCTYPE" in payload or b"<!ENTITY" in payload:
        raise ValueError("sitemap with DTD rejected (entity-expansion risk)")
    try:
        root = ET.fromstring(payload)
    except ET.ParseError as e:
        raise ValueError(f"malformed sitemap XML: {e}") from e
    out = []
    for el in root:
        if el.tag.rpartition("}")[2] != "url":
            continue
        loc = None
        lastmod = None
        for child in el:
            name = child.tag.rpartition("}")[2]
            if name == "loc":
                loc = (child.text or "").strip()
            elif name == "lastmod":
                lastmod = (child.text or "").strip()
        if loc:
            out.append({"loc": loc, "lastmod": lastmod})
    return out


SITEMAP_SCHEMA = "id long, url_index int, loc string, lastmod string"


def extract_sitemap_urls(df: DataFrame, id_col: str = "id") -> DataFrame:
    """One row per <url> across the input sitemaps (1:N fan-out, no
    shuffle); malformed sitemaps yield a single url_index=-1 row with
    the error class in loc."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "url_index", "loc", "lastmod"]
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                try:
                    urls = parse_sitemap(bytes(rec.payload))
                except ValueError as e:
                    rows.append(
                        {
                            "id": rec.id,
                            "url_index": -1,
                            "loc": f"error:{e}"[:200],
                            "lastmod": None,
                        }
                    )
                    continue
                for i, u in enumerate(urls):
                    rows.append(
                        {
                            "id": rec.id,
                            "url_index": i,
                            "loc": u["loc"],
                            "lastmod": u["lastmod"],
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    ensure_shipped(df.sparkSession)
    cols = df.select(df[id_col].alias("id"), "payload")
    return cols.mapInPandas(run, schema=SITEMAP_SCHEMA)


def stream_warc_records(spark, archive_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """STREAMING web-archive ingestion: watch a directory for landing
    .warc/.warc.gz files (the binaryFile streaming source — exactly-once
    per file via the source's seen-files log) and fan each archive out
    into records with the same mapInPandas parser the batch operator
    uses. The id column is a 64-bit hash of the file path (stable across
    retries; archives are immutable once landed). At scale: one archive
    = one input partition, records flow to downstream stages without the
    payload ever shuffling; throttle with max_files_per_trigger (W7)."""
    from pyspark.sql import functions as F

    reader = spark.readStream.format("binaryFile")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    files = reader.schema(
        "path string, modificationTime timestamp, length long, content binary"
    ).load(archive_dir)
    payloads = files.select(
        F.xxhash64("path").alias("id"), F.col("content").alias("payload")
    )
    return extract_warc_records(payloads, id_col="id")


ROBOTS_SCHEMA = "id long, url string, agent string, allowed boolean"


def evaluate_robots(payload: str, agent: str, url: str) -> bool:
    """Crawl-politeness check: parse one robots.txt body with the stdlib
    urllib.robotparser (first-matching-rule semantics, per-agent groups,
    default allow) and evaluate ``can_fetch(agent, url)``. robotparser is
    lenient by construction — junk lines are skipped, an empty/garbled
    body allows everything — so there is no ValueError contract here,
    only a deterministic boolean."""
    import urllib.robotparser as _rp

    p = _rp.RobotFileParser()
    p.parse((payload or "").splitlines())
    return bool(p.can_fetch(agent, url))


def check_robots(
    df: DataFrame,
    id_col: str = "id",
    robots_col: str = "robots_txt",
    url_col: str = "url",
    agent: str = "surgebot",
) -> DataFrame:
    """Batch robots evaluation over mapInPandas (same no-shuffle,
    payload-dropping contract as the other ingestion operators): one row
    per input with the fetch-permission verdict — the politeness gate a
    crawl frontier runs between the sitemap feed and the fetcher."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["id", "url", "agent", "allowed"]
        for pdf in batches:
            rows = []
            for rec in pdf.itertuples():
                try:
                    ok = evaluate_robots(rec.robots or "", agent, rec.url or "")
                except Exception:  # robotparser is lenient; belt anyway
                    ok = True
                rows.append(
                    {"id": rec.id, "url": rec.url, "agent": agent, "allowed": ok}
                )
            yield pd.DataFrame(rows, columns=cols)

    ensure_shipped(df.sparkSession)
    cols = df.select(
        df[id_col].alias("id"),
        df[robots_col].alias("robots"),
        df[url_col].alias("url"),
    )
    return cols.mapInPandas(run, schema=ROBOTS_SCHEMA)
