"""WARC (Web ARChive, ISO 28500) records + HTML text extraction.

The crawl half of a training-data pipeline starts from WARC — the
format Common Crawl and every Heritrix-style crawler emit. This
module implements, from the public spec:

- ``parse_warc`` / ``write_warc``: the WARC/1.0 record grammar
  (version line, named-field header block, CRLF discipline,
  Content-Length-delimited block, double-CRLF record separator),
  including HTTP-response payload splitting (status line + headers
  vs entity body).
- ``html_text_col``: HTML → text as a PURE Column expression chain
  (drop script/style/head blocks, strip tags, decode the core
  entities, collapse whitespace). This is the hot path at crawl
  scale, so it runs JVM-side in whole-stage codegen — no Python per
  row — and the regex subset is chosen to evaluate identically under
  Java regex (Spark) and RE2 (DuckDB), keeping it oracle-checkable.

Scale shape: record *parsing* is Arrow-batched mapInPandas over
archive payloads (one crawl archive = one binary value; a production
deployment points the same batch loop at object-store WARC segments),
while everything after extraction — language ID, quality, dedup —
is the existing scan-stage pipeline. Metadata (record type, target
URI, HTTP status) surfaces as typed columns so pruning happens
before extraction.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sqlpp_spark.ops import ensure_parallelism

CRLF = b"\r\n"


class WarcError(ValueError):
    """Malformed WARC payload."""


def parse_warc(data: bytes) -> list:
    """Parse a WARC/1.0 stream into records:
    ``(headers: dict, block: bytes)`` per record. Header names are
    case-preserved keys; lookup helpers lowercase them."""
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record CRLFs
        while data[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            break
        eol = data.find(CRLF, pos)
        if eol < 0 or not data[pos:eol].startswith(b"WARC/"):
            raise WarcError("expected WARC/ version line")
        version = data[pos:eol].decode("ascii", "replace")
        pos = eol + 2
        headers = {"__version__": version}
        while True:
            eol = data.find(CRLF, pos)
            if eol < 0:
                raise WarcError("unterminated WARC header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break  # empty line ends the header block
            if b":" not in line:
                raise WarcError(f"malformed WARC header line: {line[:40]!r}")
            name, _, value = line.partition(b":")
            headers[name.decode("ascii", "replace").strip()] = (
                value.decode("utf-8", "replace").strip()
            )
        # ISO 28500 field names are case-insensitive; validate as
        # ASCII digits (str.isdigit also accepts Unicode digits that
        # int() then rejects with a plain ValueError)
        length = next(
            (v for k, v in headers.items()
             if k.lower() == "content-length"), None,
        )
        if length is None or not (length.isascii() and length.isdigit()):
            raise WarcError("missing/invalid Content-Length")
        length = int(length)
        if pos + length > n:
            raise WarcError("Content-Length overruns the stream")
        block = data[pos : pos + length]
        pos += length
        if data[pos : pos + 4] not in (CRLF + CRLF, b""):
            # tolerate a truncated trailing separator at EOF only
            if pos + 4 <= n:
                raise WarcError("missing record separator")
        pos += 4
        records.append((headers, block))
    return records


def split_http_response(block: bytes):
    """(status_code, http_headers dict, body bytes) of an HTTP
    response payload block; (None, {}, block) if not HTTP."""
    if not block.startswith(b"HTTP/"):
        return None, {}, block
    sep = block.find(CRLF + CRLF)
    if sep < 0:
        return None, {}, block
    head = block[:sep].split(CRLF)
    try:
        status = int(head[0].split()[1])
    except (IndexError, ValueError):
        return None, {}, block
    headers = {}
    for line in head[1:]:
        name, _, value = line.partition(b":")
        headers[name.decode("ascii", "replace").strip().lower()] = (
            value.decode("utf-8", "replace").strip()
        )
    return status, headers, block[sep + 4 :]


def write_warc(records) -> bytes:
    """Emit WARC/1.0: records = [(headers dict, block bytes)].
    Content-Length is computed; WARC-Type etc. come from headers."""
    out = bytearray()
    for headers, block in records:
        out += b"WARC/1.0" + CRLF
        for k, v in headers.items():
            if k.lower() in ("__version__", "content-length"):
                continue
            out += k.encode("ascii") + b": " + str(v).encode("utf-8") + CRLF
        out += b"Content-Length: " + str(len(block)).encode() + CRLF
        out += CRLF + block + CRLF + CRLF
    return bytes(out)


def http_response_block(status: int, content_type: str, body: bytes) -> bytes:
    head = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n"
        f"Content-Length: {len(body)}\r\n\r\n"
    ).encode("ascii")
    return head + body


# ---------------------------------------------------------------------------
# HTML → text (JVM-side, oracle-checkable regex subset)
# ---------------------------------------------------------------------------

# Each stage is a (pattern, replacement) evaluated identically by Java
# regex and RE2. Two engine divergences are avoided EXPLICITLY
# (round-9 second review): Java's \s matches \x0B where RE2's does
# not — so whitespace is the spelled-out ASCII class _WS — and RE2's
# (?i) case-folds Unicode (ſ matches s) where Java's is
# ASCII-only — so tag names use explicit [sS]-style classes instead
# of a case-insensitive flag.
_WS = r"[ \t\n\r\f\x0B]"


def _ci(word: str) -> str:
    return "".join(f"[{c}{c.upper()}]" for c in word)


_HTML_STAGES = [
    (rf"(?s)<{_ci('script')}\b.*?</{_ci('script')}{_WS}*>", " "),
    (rf"(?s)<{_ci('style')}\b.*?</{_ci('style')}{_WS}*>", " "),
    (rf"(?s)<{_ci('head')}\b.*?</{_ci('head')}{_WS}*>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"(?s)<[^>]*>", " "),
]
_HTML_ENTITIES = [
    ("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
    ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&"),  # amp LAST
]


def html_text_col(c: Column) -> Column:
    """Extract readable text from an HTML column — whole-stage-codegen
    regexp chain, no UDF."""
    out = c
    for pat, repl in _HTML_STAGES:
        out = F.regexp_replace(out, pat, repl)
    for ent, ch in _HTML_ENTITIES:
        out = F.replace(out, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(out, _WS + "+", " "))


def html_text_sql(c: str) -> str:
    """The DuckDB twin of ``html_text_col`` — same stages, same
    order, RE2 semantics."""
    out = c
    for pat, repl in _HTML_STAGES:
        out = f"regexp_replace({out}, '{pat}', '{repl}', 'g')"
    for ent, ch in _HTML_ENTITIES:
        ch_sql = ch.replace("'", "''")
        out = f"replace({out}, '{ent}', '{ch_sql}')"
    return f"trim(regexp_replace({out}, '{_WS}+', ' ', 'g'))"


# ---------------------------------------------------------------------------
# Spark operators
# ---------------------------------------------------------------------------

WARC_RECORD_SCHEMA = (
    "archive_id long, rec_type string, target_uri string, "
    "content_length long, http_status int, body string, decoded boolean"
)


def warc_records(df: DataFrame) -> DataFrame:
    """One row per WARC record of each binary archive payload
    (columns: archive_id, payload). HTTP-response bodies decode to
    text; malformed archives yield one decoded=false row."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in (
                "archive_id", "rec_type", "target_uri", "content_length",
                "http_status", "body", "decoded",
            )}

            def emit(aid, rt, uri, cl, status, body, ok):
                out["archive_id"].append(aid)
                out["rec_type"].append(rt)
                out["target_uri"].append(uri)
                out["content_length"].append(cl)
                out["http_status"].append(status)
                out["body"].append(body)
                out["decoded"].append(ok)

            for aid, payload in zip(pdf["archive_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                emitted = 0
                try:
                    for headers, block in parse_warc(b):
                        lower = {k.lower(): v for k, v in headers.items()}
                        rt = lower.get("warc-type", "")
                        status, _hh, body = (
                            split_http_response(block)
                            if rt == "response" else (None, {}, block)
                        )
                        emit(
                            aid, rt, lower.get("warc-target-uri", ""),
                            len(block), status,
                            body.decode("utf-8", "replace"), True,
                        )
                        emitted += 1
                except WarcError:
                    emit(aid, "", "", 0, None, "", False)
                    emitted += 1
                if emitted == 0:
                    # empty/record-less payload: parse_warc returns []
                    # without raising — the contract is still one
                    # decoded=false row per bad archive
                    emit(aid, "", "", 0, None, "", False)
            yield pd.DataFrame(out)

    return ensure_parallelism(df.select("archive_id", "payload")).mapInPandas(
        extract, WARC_RECORD_SCHEMA
    )


def synthesize_warc_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    uri_col: "str | None" = None,
) -> DataFrame:
    """One WARC archive per document with CLOSED-FORM content:
    warcinfo + request + response records, the response carrying an
    HTML page built from the document text by a fixed template — so
    record parsing, HTTP splitting AND the html_text extraction chain
    are all SQL-verifiable end to end."""
    schema = "archive_id long, payload binary"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"archive_id": [], "payload": []}
            uris = pdf[uri_col] if uri_col else [None] * len(pdf)
            for did, text, uri in zip(pdf[id_col], pdf[text_col], uris):
                if did is None or pd.isna(did) or text is None:
                    # a NULL would silently diverge from the oracle's
                    # NULL-propagating SQL concat — fail loudly instead
                    raise WarcError(
                        "synthesize_warc_media requires non-null "
                        f"{id_col}/{text_col}"
                    )
                did = int(did)
                html = (
                    f"<html><head><title>Doc {did}</title>"
                    f"<style>p {{color: red}}</style></head>"
                    f"<body><h1>Doc {did}</h1><!-- c{did} -->"
                    f"<p>{text}</p>"
                    f"<script>var x = {did};</script></body></html>"
                ).encode("utf-8")
                resp = http_response_block(
                    200, "text/html; charset=utf-8", html
                )
                if uri is None:
                    uri = f"http://example.com/doc/{did}"
                records = [
                    ({"WARC-Type": "warcinfo",
                      "WARC-Record-ID": f"<urn:uuid:{did}-info>"},
                     f"software: sqlpp-spark {did}\r\n".encode()),
                    ({"WARC-Type": "request",
                      "WARC-Record-ID": f"<urn:uuid:{did}-req>",
                      "WARC-Target-URI": uri},
                     (f"GET /doc/{did} HTTP/1.1\r\n"
                      f"Host: example.com\r\n\r\n").encode()),
                    ({"WARC-Type": "response",
                      "WARC-Record-ID": f"<urn:uuid:{did}-resp>",
                      "WARC-Target-URI": uri},
                     resp),
                ]
                out["archive_id"].append(did)
                out["payload"].append(write_warc(records))
            yield pd.DataFrame(out)

    cols = [id_col, text_col] + ([uri_col] if uri_col else [])
    return ensure_parallelism(df.select(*cols)).mapInPandas(gen, schema)
