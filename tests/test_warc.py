"""WARC container + HTML extraction (ops/warc.py): record grammar,
HTTP splitting, regex-chain parity, malformed contract."""

from __future__ import annotations

import pytest

from sqlpp_spark.ops import warc as W
from sqlpp_spark.ops.warc import (
    WarcError,
    html_text_sql,
    http_response_block,
    parse_warc,
    split_http_response,
    write_warc,
)


def test_warc_roundtrip_multi_record():
    body = http_response_block(404, "text/html", "<p>café</p>".encode())
    data = write_warc([
        ({"WARC-Type": "warcinfo", "WARC-Record-ID": "<urn:1>"},
         b"software: x\r\n"),
        ({"WARC-Type": "request", "WARC-Target-URI": "http://e.com/a"},
         b"GET /a HTTP/1.1\r\n\r\n"),
        ({"WARC-Type": "response", "WARC-Target-URI": "http://e.com/a"},
         body),
    ])
    recs = parse_warc(data)
    assert [h["WARC-Type"] for h, _ in recs] == [
        "warcinfo", "request", "response"
    ]
    assert all(h["__version__"] == "WARC/1.0" for h, _ in recs)
    st, hh, b = split_http_response(recs[2][1])
    assert st == 404 and hh["content-type"] == "text/html"
    assert b.decode() == "<p>café</p>"
    # binary-safe: a body containing CRLFCRLF must NOT split records
    tricky = write_warc([
        ({"WARC-Type": "resource"}, b"a\r\n\r\nb\r\n\r\nc"),
    ])
    (h, blk), = parse_warc(tricky)
    assert blk == b"a\r\n\r\nb\r\n\r\nc"


def test_warc_segmentation_record_boundaries():
    """segment_warc (round-9 verdict ask #5): chunks split exactly at
    record edges, each chunk is a valid stand-alone WARC stream, all
    chunks stay under the cap (except a lone oversized record), and
    re-parsing the chunks yields the identical record sequence."""
    from sqlpp_spark.ops.warc import iter_warc_offsets, segment_warc

    recs = [
        ({"WARC-Type": "resource", "WARC-Record-ID": f"<urn:{i}>"},
         bytes([65 + i % 26]) * (50 + 37 * i % 400))
        for i in range(40)
    ]
    data = write_warc(recs)
    offs = list(iter_warc_offsets(data))
    assert len(offs) == 40
    assert offs[0][0] == 0 and offs[-1][1] == len(data)
    assert all(a[1] == b[0] for a, b in zip(offs, offs[1:]))
    cap = 1200
    chunks = segment_warc(data, cap)
    assert len(chunks) > 1
    reparsed = []
    for s, e in chunks:
        assert e - s <= cap
        reparsed.extend(parse_warc(data[s:e]))
    assert chunks[0][0] == 0 and chunks[-1][1] == len(data)
    assert [h["WARC-Record-ID"] for h, _ in reparsed] == [
        h["WARC-Record-ID"] for h, _ in recs
    ]
    assert [b for _h, b in reparsed] == [b for _h, b in recs]
    # an oversized single record: its own chunk by default, loud
    # error under strict
    big = write_warc([({"WARC-Type": "resource"}, b"z" * 5000),
                      ({"WARC-Type": "resource"}, b"q" * 10)])
    got = segment_warc(big, 1000)
    assert len(got) == 2 and got[0][1] - got[0][0] > 1000
    with pytest.raises(WarcError, match="chunk cap"):
        segment_warc(big, 1000, strict=True)


def test_warc_segmented_spark_parse_bounded(spark):
    """A multi-MB synthetic archive (one binary row — the shape that
    defeats the rows-not-bytes maxRecordsPerBatch guard) parses
    through the segmented reader into the same records as the direct
    path, with every chunk bounded; a junk archive still yields its
    one decoded=false row."""
    from sqlpp_spark.ops.warc import (
        segment_warc_archives, warc_records, warc_records_segmented,
    )

    n_rec = 300
    recs = [
        ({"WARC-Type": "response", "WARC-Target-URI": f"http://e/{i}"},
         http_response_block(200, "text/html",
                             (f"<p>doc {i} " + "x" * 9000 + "</p>").encode()))
        for i in range(n_rec)
    ]
    data = write_warc(recs)  # ~2.7 MB as ONE row
    assert len(data) > 2_000_000
    df = spark.createDataFrame(
        [(1, bytearray(data)), (2, bytearray(b"junk"))],
        "archive_id long, payload binary",
    )
    cap = 256 * 1024
    segs = segment_warc_archives(df, cap).collect()
    seg_rows = [r for r in segs if r.archive_id == 1]
    assert len(seg_rows) > 8  # genuinely spread across many chunks
    assert all(len(r.payload) <= cap for r in seg_rows)
    assert sum(len(r.payload) for r in seg_rows) == len(data)
    direct = warc_records(df).collect()
    segmented = warc_records_segmented(df, cap).collect()
    key = lambda r: (r.archive_id, r.target_uri, r.content_length,  # noqa: E731
                     r.http_status, r.body, r.decoded)
    assert sorted(map(key, segmented)) == sorted(map(key, direct))
    assert sum(1 for r in segmented if not r.decoded) == 1  # the junk row


def test_warc_fused_spread_false_identical(spark):
    """spread=False fuses segment+parse into ONE mapInPandas (r19):
    rows must be identical to the staged reader and the direct parse
    — multi-chunk archive, junk payload, and a record count past the
    fused reader's 10k-row flush boundary all included — and the
    fused plan must carry exactly one MapInPandas node above the
    scan (the staged form has two)."""
    import contextlib
    import io

    from sqlpp_spark.ops.warc import warc_records, warc_records_segmented

    recs = [
        ({"WARC-Type": "response", "WARC-Target-URI": f"http://e/{i}"},
         http_response_block(200, "text/html", f"<p>d{i}</p>".encode()))
        for i in range(11_000)  # > the fused reader's frame_rows cap
    ]
    data = write_warc(recs)
    df = spark.createDataFrame(
        [(1, bytearray(data)), (2, bytearray(b"junk"))],
        "archive_id long, payload binary",
    )
    cap = 64 * 1024
    fused_df = warc_records_segmented(df, cap, spread=False)
    fused = fused_df.collect()
    staged = warc_records_segmented(df, cap, spread=True).collect()
    direct = warc_records(df).collect()
    key = lambda r: (r.archive_id, r.rec_type, r.target_uri,  # noqa: E731
                     r.content_length, r.http_status, r.body, r.decoded)
    assert sorted(map(key, fused)) == sorted(map(key, staged))
    assert sorted(map(key, fused)) == sorted(map(key, direct))
    assert sum(1 for r in fused if not r.decoded) == 1  # the junk row
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fused_df.explain("formatted")
    # formatted explain prints each node twice (tree + details): one
    # MapInPandas node = 2 occurrences; the staged form would show 4
    assert buf.getvalue().count("MapInPandas") == 2


def test_warc_synth_records_fused_identical(spark):
    """synthesize_warc_records (r19) composes the synthesize and
    segment+parse batch functions in ONE mapInPandas; rows must be
    identical to the staged synthesize→segmented-parse composition,
    uri column included, and the plan must carry exactly one
    MapInPandas node."""
    import contextlib
    import io

    from sqlpp_spark.ops.warc import (
        synthesize_warc_media, synthesize_warc_records,
        warc_records_segmented,
    )

    df = spark.createDataFrame(
        [(i, f"text body {i} " * (i + 1), f"http://x{i}.example.com/p")
         for i in range(40)],
        "doc_id long, text string, url string",
    )
    fused_df = synthesize_warc_records(df, uri_col="url")
    fused = fused_df.collect()
    staged = warc_records_segmented(
        synthesize_warc_media(df, uri_col="url"), spread=False
    ).collect()
    key = lambda r: (r.archive_id, r.rec_type, r.target_uri,  # noqa: E731
                     r.content_length, r.http_status, r.body, r.decoded)
    assert sorted(map(key, fused)) == sorted(map(key, staged))
    assert len(fused) == 3 * 40  # warcinfo + request + response per doc
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fused_df.explain("formatted")
    assert buf.getvalue().count("MapInPandas") == 2  # one node, printed twice


def test_warc_malformed_payloads_raise():
    good = write_warc([({"WARC-Type": "resource"}, b"xyz")])
    for bad in (
        b"NOT A WARC\r\n",
        good[:20],  # truncated header block
        good.replace(b"Content-Length: 3", b"Content-Length: 999"),
        good.replace(b"Content-Length: 3", b"Content-Length: nan"),
        b"WARC/1.0\r\nNoColonHere\r\n\r\n",
    ):
        with pytest.raises(WarcError):
            parse_warc(bad)


def test_html_text_chain_spark_duckdb_parity(spark):
    """The extraction chain must produce IDENTICAL text under Java
    regex (Spark) and RE2 (DuckDB) — nested tags, mixed case, lazy
    block ends, entities (incl. the double-escape &amp;lt; case),
    multi-line scripts."""
    import duckdb

    from sqlpp_spark.ops.warc import html_text_col

    cases = [
        "<html><head><title>T</title></head><body><p>hi</p></body></html>",
        "<SCRIPT>\nvar a = '<p>not text</p>';\n</SCRIPT>ok",
        "<style media=x>p { color: red }</style>Real <b>bold</b> text",
        "a &amp; b &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;end",
        "double &amp;lt; escape",  # must yield literal '&lt;'
        "<!-- a <p>comment</p> -->visible",
        "line\n\n\t breaks   collapse",
        "<p class='x' data-y=\"z\">attrs</p>",
        "unclosed <scriptish>tag-like</scriptish> names",
    ]
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(c,) for c in cases], "html string")
    got = [r.t for r in df.select(html_text_col(F.col("html")).alias("t"))
           .collect()]
    con = duckdb.connect()
    want = [
        con.execute(
            f"SELECT {html_text_sql('?')}", [c]
        ).fetchone()[0]
        for c in cases
    ]
    con.close()
    assert got == want, list(zip(cases, got, want))
    assert got[4] == "double &lt; escape"


def test_warc_records_spark_malformed_contract(spark):
    from sqlpp_spark.ops.warc import warc_records

    good = write_warc([
        ({"WARC-Type": "response", "WARC-Target-URI": "http://e.com/1"},
         http_response_block(200, "text/plain", b"hello")),
    ])
    rows = warc_records(
        spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(b"junk"))],
            "archive_id long, payload binary",
        )
    ).collect()
    by_id = {r.archive_id: r for r in rows}
    assert by_id[1].decoded and by_id[1].http_status == 200
    assert by_id[1].body == "hello"
    assert not by_id[2].decoded


try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    _SOUP = st.text(
        alphabet="<>&/;#abc pqs\"'!-=\n\t0123456789", min_size=0, max_size=80,
    )

    @st.composite
    def _html_soup(draw):
        """Tag soup: random fragments interleaved with real-ish tags,
        entities and blocks — anything Java regex and RE2 could
        plausibly disagree on."""
        parts = []
        for _ in range(draw(st.integers(1, 6))):
            kind = draw(st.integers(0, 5))
            if kind == 0:
                parts.append(draw(_SOUP))
            elif kind == 1:
                parts.append(f"<{draw(st.sampled_from(['p', 'b', 'div', 'scriptish', 'P']))}>")
            elif kind == 2:
                t = draw(st.sampled_from(["script", "style", "head", "SCRIPT"]))
                parts.append(f"<{t}>{draw(_SOUP)}</{t}>")
            elif kind == 3:
                parts.append(draw(st.sampled_from(
                    ["&amp;", "&lt;", "&gt;", "&quot;", "&#39;", "&nbsp;",
                     "&amp;lt;", "&bogus;"]
                )))
            elif kind == 4:
                parts.append(f"<!--{draw(_SOUP)}-->")
            else:
                parts.append(f"</{draw(st.sampled_from(['p', 'head']))}>")
        return "".join(parts)

    @settings(max_examples=150, deadline=None, derandomize=True,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.lists(_html_soup(), min_size=1, max_size=8))
    def test_html_text_chain_fuzz_parity(spark, soups):
        """Random tag soup must extract to IDENTICAL text under the
        Spark (Java regex) and DuckDB (RE2) renderings of the chain."""
        import duckdb
        import pyspark.sql.functions as F

        from sqlpp_spark.ops.warc import html_text_col

        df = spark.createDataFrame(
            [(i, c) for i, c in enumerate(soups)], "i long, html string"
        )
        got = {
            r.i: r.t
            for r in df.select("i", html_text_col(F.col("html")).alias("t"))
            .collect()
        }
        con = duckdb.connect()
        for i, c in enumerate(soups):
            want = con.execute(
                f"SELECT {html_text_sql('?')}", [c]
            ).fetchone()[0]
            assert got[i] == want, (c, got[i], want)
        con.close()

except ImportError:  # pragma: no cover
    pass


def test_warc_second_review_regressions(spark):
    """Round-9 second review pins: case-insensitive Content-Length,
    Unicode-digit rejection, empty/record-less payloads still yield a
    decoded=false row, and the extraction chain's engine-divergence
    characters (\\x0B whitespace, Unicode case-foldable tag chars)."""
    import duckdb
    import pyspark.sql.functions as F

    from sqlpp_spark.ops.warc import html_text_col, warc_records

    # lowercase content-length is spec-valid (ISO 28500 names are
    # case-insensitive)
    lc = (b"WARC/1.0\r\nwarc-type: resource\r\ncontent-length: 3\r\n"
          b"\r\nxyz\r\n\r\n")
    (h, blk), = parse_warc(lc)
    assert blk == b"xyz"
    # a Unicode superscript digit passes str.isdigit but must reject
    uni = ("WARC/1.0\r\nContent-Length: ³\r\n\r\n").encode("utf-8")
    with pytest.raises(WarcError):
        parse_warc(uni)
    # empty payload -> exactly one decoded=false row (not zero rows)
    rows = warc_records(
        spark.createDataFrame(
            [(1, bytearray(b"")), (2, None)],
            "archive_id long, payload binary",
        )
    ).collect()
    assert sorted((r.archive_id, r.decoded) for r in rows) == [
        (1, False), (2, False)
    ]
    # engine-divergence characters extract IDENTICALLY
    cases = ["a\x0bb", "<ſcript>hidden</ſcript>ok",
             "<SCRIPT>h</SCRIPT> v\x0b w"]
    df = spark.createDataFrame([(i, c) for i, c in enumerate(cases)],
                               "i long, html string")
    got = {r.i: r.t for r in
           df.select("i", html_text_col(F.col("html")).alias("t")).collect()}
    con = duckdb.connect()
    for i, c in enumerate(cases):
        want = con.execute(f"SELECT {html_text_sql('?')}", [c]).fetchone()[0]
        assert got[i] == want, (c, got[i], want)
    con.close()


def test_update_from_subquery_where_supported(spark, tmp_path):
    """r10 (round-9 verdict ask #4): UPDATE ... FROM with IN/EXISTS in
    WHERE executes — target-only subquery conjuncts narrow the target
    before the join; the printer renders the same form (reference
    printer.ml:312-329 prints any analyzable predicate). r11: a
    subquery conjunct referencing the FROM relation (the r10 residual
    error) now also executes, applied after the join via the select
    compiler's semi/anti-join lowering."""
    from sqlpp_spark.compiler.sqlgen import statement_sql

    import test_fuzz_dml as FZ

    eng = FZ._fresh_spark_engine(spark, str(tmp_path))
    src = ("update items set grp = s.grp from src as s "
           "where s.id = items.id and items.id in (select id from src) "
           "returning id, grp")
    ret = sorted((r.id, r.grp) for r in eng.exec(src).collect())
    # src ids 1-3 join items 1-3; grp comes from src (5, 6, 7)
    assert ret == [(1, 5), (2, 6), (3, 7)]
    sql = statement_sql(eng.env, src)
    assert "IN" in sql.upper() and "FROM" in sql.upper()
    # FROM-referencing subquery conjunct: src grp 6 is the only one in
    # (select grp from src where val is null) -> only item 2 updates
    ret2 = sorted(
        (r.id, r.grp)
        for r in eng.exec(
            "update items set grp = 0 from src as s "
            "where s.id = items.id and s.grp in "
            "(select grp from src where val is null) returning id, grp"
        ).collect()
    )
    assert ret2 == [(2, 0)]


# ---------------------------------------------------------------------------
# Gzipped WARC (`.warc.gz`, Common Crawl member-per-record layout) — r11.
# ---------------------------------------------------------------------------


def test_warc_gz_parse_matches_plain():
    recs = [
        ({"WARC-Type": "warcinfo"}, b"software: x\r\n"),
        ({"WARC-Type": "response", "WARC-Target-URI": "http://e/1"},
         http_response_block(200, "text/html", b"<p>hello</p>" * 50)),
        ({"WARC-Type": "resource"}, b"q" * 700),
    ]
    plain = parse_warc(write_warc(recs))
    gz = parse_warc(W.write_warc_gz(recs))
    assert len(plain) == len(gz) == 3
    for (ha, ba), (hb, bb) in zip(plain, gz):
        assert ba == bb
        assert {k.lower(): v for k, v in ha.items()} \
            == {k.lower(): v for k, v in hb.items()}


def test_warc_gz_segments_at_member_boundaries():
    recs = [
        ({"WARC-Type": "resource"}, bytes([i]) * (200 + 37 * i))
        for i in range(9)
    ]
    data = W.write_warc_gz(recs)
    chunks = W.segment_warc(data, 900)
    assert len(chunks) > 1
    reassembled = []
    for s, e in chunks:
        piece = data[s:e]
        assert piece[:2] == W.GZIP_MAGIC  # stand-alone gzip stream
        # decompressed size respects the cap (single-member overflow
        # chunks excepted — none here)
        assert len(W.gunzip_warc(piece)) <= 900
        reassembled.extend(parse_warc(piece))
    assert [b for _, b in reassembled] == [b for _, b in recs]


def test_warc_gz_strict_oversized_member():
    recs = [({"WARC-Type": "resource"}, b"z" * 5000)]
    data = W.write_warc_gz(recs)
    with pytest.raises(WarcError):
        W.segment_warc(data, 1000, strict=True)
    # non-strict: oversized member becomes its own chunk
    assert W.segment_warc(data, 1000) == [(0, len(data))]


def test_warc_gz_corruption_contract():
    recs = [({"WARC-Type": "resource"}, b"ab" * 300)]
    data = bytearray(W.write_warc_gz(recs))
    for pos in range(0, len(data), 5):
        mutated = bytearray(data)
        mutated[pos] ^= 0xFF
        try:
            parse_warc(bytes(mutated))
        except WarcError:
            pass
