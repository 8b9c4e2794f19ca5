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


GZIP_MAGIC = b"\x1f\x8b"


def iter_gzip_members(data: bytes) -> Iterator:
    """Yield (comp_start, comp_end, decompressed_bytes) per gzip
    member. Common Crawl's `.warc.gz` convention compresses EACH
    record as its own member precisely so the stream can be cut at
    member boundaries — the property segment_warc exploits."""
    import zlib

    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 2] != GZIP_MAGIC:
            raise WarcError("garbage between gzip members")
        d = zlib.decompressobj(wbits=31)
        try:
            out = d.decompress(data[pos:])
        except zlib.error as ex:
            raise WarcError(f"corrupt gzip member: {ex}") from None
        if not d.eof:
            raise WarcError("truncated gzip member")
        end = n - len(d.unused_data)
        yield pos, end, out
        pos = end


def gunzip_warc(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzipped WARC stream."""
    return b"".join(out for _, _, out in iter_gzip_members(data))


def parse_warc(data: bytes) -> list:
    """Parse a WARC/1.0 stream into records:
    ``(headers: dict, block: bytes)`` per record. Header names are
    case-preserved keys; lookup helpers lowercase them. Gzipped
    streams (`.warc.gz`, incl. the member-per-record Common Crawl
    layout) are decompressed transparently."""
    if data[:2] == GZIP_MAGIC:
        data = gunzip_warc(data)
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


def iter_warc_offsets(data: bytes) -> Iterator:
    """Yield (start, end) byte offsets of each record in a WARC stream
    WITHOUT materializing header dicts or blocks — the boundary
    scanner behind ``segment_warc``. The grammar is self-delimiting
    (version line + header block + Content-Length-counted block +
    CRLF CRLF), so a linear walk finds every record edge."""
    pos = 0
    n = len(data)
    while pos < n:
        while data[pos : pos + 2] == CRLF:
            pos += 2
        if pos >= n:
            return
        start = pos
        eol = data.find(CRLF, pos)
        if eol < 0 or not data[pos:eol].startswith(b"WARC/"):
            raise WarcError("expected WARC/ version line")
        pos = eol + 2
        length = None
        while True:
            eol = data.find(CRLF, pos)
            if eol < 0:
                raise WarcError("unterminated WARC header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            if b":" not in line:
                raise WarcError(f"malformed WARC header line: {line[:40]!r}")
            name, _, value = line.partition(b":")
            if name.strip().lower() == b"content-length":
                v = value.strip()
                if not (v.isascii() and v.isdigit()):
                    raise WarcError("missing/invalid Content-Length")
                length = int(v)
        if length is None:
            raise WarcError("missing/invalid Content-Length")
        if pos + length > n:
            raise WarcError("Content-Length overruns the stream")
        pos += length
        if data[pos : pos + 4] not in (CRLF + CRLF, b""):
            if pos + 4 <= n:
                raise WarcError("missing record separator")
        pos = min(pos + 4, n)
        yield start, pos


def segment_warc(data: bytes, max_chunk_bytes: int,
                 strict: bool = False) -> list:
    """Split a WARC stream AT RECORD BOUNDARIES into chunks of at most
    ``max_chunk_bytes`` each — every chunk is itself a valid WARC
    stream, so downstream parsing is unchanged. A single record larger
    than the cap becomes its own chunk (the grammar cannot split finer
    than a record) unless ``strict=True``, which raises instead —
    the loud-error mode for pipelines that must bound worst-case
    per-task bytes. Returns a list of (start, end) chunk offsets."""
    if max_chunk_bytes <= 0:
        raise WarcError("max_chunk_bytes must be positive")
    if data[:2] == GZIP_MAGIC:
        return _segment_warc_gz(data, max_chunk_bytes, strict)
    chunks = []
    cur_start = None
    cur_end = None
    for start, end in iter_warc_offsets(data):
        rec_len = end - start
        if rec_len > max_chunk_bytes and strict:
            raise WarcError(
                f"single WARC record of {rec_len} bytes exceeds the "
                f"{max_chunk_bytes}-byte chunk cap"
            )
        if cur_start is None:
            cur_start, cur_end = start, end
        elif end - cur_start <= max_chunk_bytes:
            cur_end = end
        else:
            chunks.append((cur_start, cur_end))
            cur_start, cur_end = start, end
    if cur_start is not None:
        chunks.append((cur_start, cur_end))
    return chunks


def _segment_warc_gz(data: bytes, max_chunk_bytes: int,
                     strict: bool) -> list:
    """Gzipped variant: cut at gzip MEMBER boundaries (each chunk is a
    stand-alone multi-member gzip stream) with the cap applied to the
    DECOMPRESSED size — the quantity that bounds downstream parse
    memory. One pass of streaming decompression finds the boundaries
    (gzip is not splittable without an index); the expensive record
    parse + extraction then runs per chunk, distributed."""
    chunks = []
    cur_start = None
    cur_end = None
    cur_dec = 0
    for start, end, out in iter_gzip_members(data):
        dec = len(out)
        if dec > max_chunk_bytes and strict:
            raise WarcError(
                f"single gzip member decompresses to {dec} bytes, "
                f"exceeding the {max_chunk_bytes}-byte chunk cap"
            )
        if cur_start is None:
            cur_start, cur_end, cur_dec = start, end, dec
        elif cur_dec + dec <= max_chunk_bytes:
            cur_end = end
            cur_dec += dec
        else:
            chunks.append((cur_start, cur_end))
            cur_start, cur_end, cur_dec = start, end, dec
    if cur_start is not None:
        chunks.append((cur_start, cur_end))
    return chunks


def write_warc_gz(records) -> bytes:
    """Gzipped WARC in the Common Crawl layout: each record its own
    gzip member, so the stream segments at member boundaries."""
    import gzip

    return b"".join(
        gzip.compress(write_warc([rec]), mtime=0) for rec in records
    )


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


_WARC_RECORD_COLS = (
    "archive_id", "rec_type", "target_uri", "content_length",
    "http_status", "body", "decoded",
)


def _append_warc_rows(out: dict, aid, b: bytes) -> None:
    """Append ``warc_records``' rows for ONE payload to a column dict
    — the single definition of the per-payload parse contract, shared
    by the staged and fused readers: one row per record, HTTP-response
    blocks split into status/body, and a malformed OR record-less
    payload yields exactly one decoded=false row."""

    def emit(rt, uri, cl, status, body, ok):
        out["archive_id"].append(aid)
        out["rec_type"].append(rt)
        out["target_uri"].append(uri)
        out["content_length"].append(cl)
        out["http_status"].append(status)
        out["body"].append(body)
        out["decoded"].append(ok)

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
                rt, lower.get("warc-target-uri", ""),
                len(block), status,
                body.decode("utf-8", "replace"), True,
            )
            emitted += 1
    except WarcError:
        emit("", "", 0, None, "", False)
        emitted += 1
    if emitted == 0:
        # empty/record-less payload: parse_warc returns [] without
        # raising — the contract is still one decoded=false row per
        # bad archive
        emit("", "", 0, None, "", False)


def _payload_chunks(b: bytes, max_chunk_bytes: int, strict: bool) -> list:
    """Record-boundary chunk spans for one payload, with the
    ``segment_warc_archives`` fallback contract: malformed payloads
    pass through un-split (or raise under ``strict``); an empty or
    record-less payload is one whole-payload chunk."""
    try:
        chunks = segment_warc(b, max_chunk_bytes, strict)
    except WarcError:
        if strict:
            raise
        chunks = [(0, len(b))] if b else []
    if not chunks:
        chunks = [(0, len(b))]
    return chunks


def warc_records(df: DataFrame) -> DataFrame:
    """One row per WARC record of each binary archive payload
    (columns: archive_id, payload). HTTP-response bodies decode to
    text; malformed archives yield one decoded=false row."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in _WARC_RECORD_COLS}
            for aid, payload in zip(pdf["archive_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                _append_warc_rows(out, aid, b)
            yield pd.DataFrame(out)

    return ensure_parallelism(df.select("archive_id", "payload")).mapInPandas(
        extract, WARC_RECORD_SCHEMA
    )


def segment_warc_archives(
    df: DataFrame, max_chunk_bytes: int = 1 << 20, strict: bool = False,
) -> DataFrame:
    """(archive_id, payload) -> (archive_id, chunk_no, n_chunks,
    payload) with
    each output payload a stand-alone WARC stream of at most
    ``max_chunk_bytes`` (record-boundary splits; an oversized single
    record is its own chunk, or a loud error under ``strict``).

    This bounds the round-9 single-row payload hazard: a ~1 GB
    Common-Crawl segment as ONE Arrow row defeats the
    maxRecordsPerBatch guard (it caps rows, not bytes). Segment first,
    then ``repartition`` spreads chunks across tasks, so the
    record-parse stage sees bounded per-batch bytes AND recovers
    parallelism for big archives. Malformed archives pass through
    un-split (chunk_no 0) so warc_records still yields their
    decoded=false row."""
    schema = (
        "archive_id long, chunk_no long, n_chunks long, payload binary"
    )

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"archive_id": [], "chunk_no": [], "n_chunks": [],
                   "payload": []}
            for aid, payload in zip(pdf["archive_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                chunks = _payload_chunks(b, max_chunk_bytes, strict)
                for i, (s, e) in enumerate(chunks):
                    out["archive_id"].append(aid)
                    out["chunk_no"].append(i)
                    out["n_chunks"].append(len(chunks))
                    out["payload"].append(b[s:e])
            yield pd.DataFrame(out)

    return ensure_parallelism(df.select("archive_id", "payload")).mapInPandas(
        seg, schema
    )


def warc_records_segmented(
    df: DataFrame, max_chunk_bytes: int = 1 << 20, strict: bool = False,
    spread: bool = True,
) -> DataFrame:
    """``warc_records`` over a record-boundary-segmented archive frame:
    identical rows to the direct parse (each chunk is a valid WARC
    stream and archive_id is preserved), with per-batch parse bytes
    bounded by ``max_chunk_bytes`` and chunks repartitioned so one
    huge archive no longer serializes onto one task.

    ``spread`` (r11): the chunk repartition is a full shuffle of the
    payload bytes whose ONLY purpose is intra-archive parallelism —
    letting one GB-scale archive's chunks parse across tasks (the
    rehearsal-measured win for huge archives). The Arrow batch-bytes
    bound itself comes from the segmentation, not the shuffle, so
    callers whose archives are individually small (e.g. the
    per-document crawl capstone, where the blanket shuffle measured
    ~20% of the whole pipeline) pass ``spread=False`` and parse
    chunks in place with zero shuffle. Filter-based routing (split
    archives shuffle, solo archives don't) was evaluated and
    rejected: a DataFrame consumed by two union branches re-executes
    its whole lineage, so the "gate" re-ran the upstream synthesis/
    scan twice and cost more than it saved at both corpus shapes.

    r19 (spread=False only): segment + parse run FUSED inside ONE
    mapInPandas. The staged form made the archive bytes cross the
    JVM↔Python Arrow boundary three times (into the segmenter, out
    as chunk rows, back into the parser); with no shuffle between
    the stages that is pure serialization overhead, so the fused
    form segments and parses in the same Python worker pass — the
    payload crosses once. Rows are identical by construction (the
    per-payload chunking and per-chunk parse contracts are the
    SHARED helpers ``_payload_chunks`` / ``_append_warc_rows``, and
    chunk order is the staged path's partition order). The staged
    path's batch-bytes bound is kept on the OUTPUT side: accumulated
    rows flush whenever their source-chunk bytes pass a frame cap,
    so one yielded frame never aggregates more decoded payload than
    a staged run's input batch would."""
    if spread:
        segs = segment_warc_archives(df, max_chunk_bytes, strict)
        segs = segs.repartition("archive_id", "chunk_no")
        return warc_records(segs)

    return ensure_parallelism(df.select("archive_id", "payload")).mapInPandas(
        _seg_parse_batches(max_chunk_bytes, strict), WARC_RECORD_SCHEMA
    )


def _seg_parse_batches(max_chunk_bytes: int, strict: bool):
    """Batch function of the FUSED segment+parse reader: chunk each
    payload at record boundaries and parse the chunks in the same
    Python pass. Yielded frames are bounded on the OUTPUT side — rows
    flush whenever their source-chunk bytes pass a frame cap (or the
    Arrow row cap), so one frame never aggregates more decoded
    payload than a staged run's input batch would."""
    frame_bytes = max(max_chunk_bytes, 1 << 20) * 16
    frame_rows = 10_000

    def seg_parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        out = {k: [] for k in _WARC_RECORD_COLS}
        n_bytes = 0
        for pdf in batches:
            for aid, payload in zip(pdf["archive_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                for s, e in _payload_chunks(b, max_chunk_bytes, strict):
                    _append_warc_rows(out, aid, b[s:e])
                    n_bytes += e - s
                    if (
                        n_bytes >= frame_bytes
                        or len(out["archive_id"]) >= frame_rows
                    ):
                        yield pd.DataFrame(out)
                        out = {k: [] for k in _WARC_RECORD_COLS}
                        n_bytes = 0
        if out["archive_id"]:
            yield pd.DataFrame(out)

    return seg_parse


def synthesize_warc_media(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    uri_col: "str | None" = None,
) -> DataFrame:
    """One WARC archive per document with CLOSED-FORM content:
    warcinfo + request + response records, the response carrying an
    HTML page built from the document text by a fixed template — so
    record parsing, HTTP splitting AND the html_text extraction chain
    are all SQL-verifiable end to end."""
    cols = [id_col, text_col] + ([uri_col] if uri_col else [])
    return ensure_parallelism(df.select(*cols)).mapInPandas(
        _warc_media_gen(id_col, text_col, uri_col),
        "archive_id long, payload binary",
    )


def _warc_media_gen(id_col: str, text_col: str, uri_col: "str | None"):
    """Batch function of ``synthesize_warc_media`` (factored out so the
    fused reader below can compose it with the parse pass)."""

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

    return gen


def synthesize_warc_records(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    uri_col: "str | None" = None, max_chunk_bytes: int = 1 << 20,
    strict: bool = False,
) -> DataFrame:
    """FUSED synthesize→segment→parse (r19, §4 of the optimization
    guide): row-identical to
    ``warc_records_segmented(synthesize_warc_media(df), spread=False)``
    — it composes the exact same batch functions — but in ONE
    mapInPandas, so the WARC archive bytes never cross the
    JVM↔Python Arrow boundary at all (the staged form shipped them
    out of the synthesizer and back into the parser) and the plan
    carries one Python stage instead of two (one fewer
    ensure_parallelism partition probe at plan-build time, which the
    bench's timed region pays per run)."""
    gen = _warc_media_gen(id_col, text_col, uri_col)
    seg_parse = _seg_parse_batches(max_chunk_bytes, strict)

    def fused(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        yield from seg_parse(gen(batches))

    cols = [id_col, text_col] + ([uri_col] if uri_col else [])
    return ensure_parallelism(df.select(*cols)).mapInPandas(
        fused, WARC_RECORD_SCHEMA
    )
