"""Archive/crawl container queries (operators/containers.py): WARC,
ZIP and ustar TAR round trips over the documents fixture. Each query
synthesizes REAL wire-format containers per document in one
Arrow-batched mapInPandas, re-parses them with the pure struct parser
in a second mapInPandas (payloads cross the Arrow boundary as binary
columns — the same plumbing contract as the media codecs), and emits
integer-exact structural statistics plus the rolling-polynomial
fingerprint of the EXTRACTED document text, which the DuckDB oracle
recomputes from the original text column. The ZIP/TAR parsers are
additionally cross-validated against stdlib zipfile/tarfile in
tests/test_containers.py (both directions), so the wire layout is
pinned by an independent implementation, not just our own twin."""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from funding_monitoring_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    _spread_ids,
    register_module_by_value,
)
from funding_monitoring_spark.operators.textstats import (
    POLY_INIT,
    POLY_MOD,
    POLY_MULT,
)
from funding_monitoring_spark.registry import query
from funding_monitoring_spark.sources.tables import load_table

import pyspark.sql.types as T


def _poly_fp(data: bytes) -> int:
    fp = POLY_INIT
    for b in data:
        fp = (fp * POLY_MULT + b) % POLY_MOD
    return fp


def _register_by_value():
    register_module_by_value(__name__)


_FP_SQL = f"""list_reduce(
               list_prepend(CAST({POLY_INIT} AS BIGINT),
                   list_transform(string_split(text, ''),
                                  ch -> CAST(ascii(ch) AS BIGINT))),
               (acc, x) -> (acc * {POLY_MULT} + x) % {POLY_MOD}
           )"""


def _doc_media(docs: DataFrame, build) -> DataFrame:
    """Shared writer half: build(media_id, text, lang, source) ->
    payload bytes, emitted through MEDIA_SCHEMA."""
    _register_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for mid, text, lang, source in zip(
                pdf["media_id"], pdf["text"], pdf["lang"], pdf["source"]
            ):
                payloads.append(
                    build(int(mid), str(text), str(lang), str(source))
                )
                metas.append(
                    {
                        "modality": "archive",
                        "mime": "application/octet-stream",
                        "width": None,
                        "height": None,
                        "duration_ms": None,
                    }
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "meta": metas,
                }
            )

    ids = _spread_ids(
        docs.select(
            F.col("doc_id").alias("media_id"), "text", "lang", "source"
        )
    )
    return ids.mapInPandas(run, schema=MEDIA_SCHEMA)


def _features(media: DataFrame, extract, schema) -> DataFrame:
    """Shared reader half: extract(media_id, payload) -> row dict."""
    _register_by_value()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                extract(int(mid), bytes(payload))
                for mid, payload in zip(pdf["media_id"], pdf["payload"])
            ]
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, schema=schema)


def _meta_line(mid: int, lang: str, source: str) -> str:
    return f"{mid}\t{lang}\t{source}\n"


_META_LEN_SQL = (
    "length(CAST(doc_id AS VARCHAR)) + length(lang) "
    "+ length(source) + 3"
)


# -- WARC ---------------------------------------------------------------------

_WARC_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_records", T.IntegerType()),
        T.StructField("n_response", T.IntegerType()),
        T.StructField("gzipped", T.IntegerType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("body_chars", T.IntegerType()),
        T.StructField("body_fingerprint", T.LongType()),
    ]
)

_HTTP_HEAD = "HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n"


@query(
    "warc_record_scan",
    f"""
    SELECT doc_id AS media_id,
           2 AS n_records,
           1 AS n_response,
           CAST(doc_id % 2 AS INT) AS gzipped,
           200 AS http_status,
           'http://corpus.example/doc/' || CAST(doc_id AS VARCHAR)
               AS target_uri,
           CAST(length(text) AS INT) AS body_chars,
           {_FP_SQL} AS body_fingerprint
    FROM documents
    """,
)
def q_warc_record_scan(spark, sf_dir):
    """WARC 1.0 crawl-record scan (ISO 28500) — the FIRST structural
    pass any 100 TB web corpus runs: each document becomes a real
    two-record WARC (warcinfo + response with an HTTP payload), odd
    ids in the standard per-record-gzip .warc.gz layout (concatenated
    members split via zlib unused_data). The parser re-walks the
    version line / header block / Content-Length framing, splits the
    HTTP head from the body and fingerprints the body with the
    doc_fingerprint polynomial — framing, gzip-member or header bugs
    break the hash. Per-payload work is embarrassingly parallel
    mapInPandas; no shuffle."""
    from funding_monitoring_spark.operators.containers import (
        encode_warc,
        parse_warc,
    )

    def build(mid, text, lang, source):
        uri = f"http://corpus.example/doc/{mid}"
        http = _HTTP_HEAD.encode("latin-1") + text.encode("latin-1")
        return encode_warc(
            [
                ("warcinfo",
                 {"Content-Type": "application/warc-fields"},
                 f"software: corpus-writer\nsource: {source}\n"
                 .encode("latin-1")),
                ("response",
                 {"WARC-Target-URI": uri,
                  "Content-Type":
                      "application/http;msgtype=response"},
                 http),
            ],
            per_record_gzip=(mid % 2 == 1),
        )

    def extract(mid, payload):
        gz = payload[:2] == b"\x1f\x8b"
        records = parse_warc(payload)
        responses = [
            (h, p) for t, h, p in records if t == "response"
        ]
        (headers, http), = responses
        head, body = http.split(b"\r\n\r\n", 1)
        status = int(head.split(b" ", 2)[1])
        return {
            "media_id": mid,
            "n_records": len(records),
            "n_response": len(responses),
            "gzipped": int(gz),
            "http_status": status,
            "target_uri": headers.get("WARC-Target-URI", ""),
            "body_chars": len(body),
            "body_fingerprint": _poly_fp(body),
        }

    docs = load_table(spark, sf_dir, "documents")
    return _features(_doc_media(docs, build), extract, _WARC_SCHEMA)


# -- ZIP ------------------------------------------------------------------------

_ZIP_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_members", T.IntegerType()),
        T.StructField("n_deflated", T.IntegerType()),
        T.StructField("all_crc_ok", T.IntegerType()),
        T.StructField("doc_bytes", T.IntegerType()),
        T.StructField("meta_bytes", T.IntegerType()),
        T.StructField("doc_fingerprint", T.LongType()),
    ]
)


@query(
    "zip_manifest_scan",
    f"""
    SELECT doc_id AS media_id,
           2 AS n_members,
           1 AS n_deflated,
           1 AS all_crc_ok,
           CAST(length(text) AS INT) AS doc_bytes,
           CAST({_META_LEN_SQL} AS INT) AS meta_bytes,
           {_FP_SQL} AS doc_fingerprint
    FROM documents
    """,
)
def q_zip_manifest_scan(spark, sf_dir):
    """ZIP central-directory scan + member extraction (the docx/epub/
    jar container family): each document becomes a real two-member
    ZIP (doc.txt deflated, meta.tsv stored) written with raw local
    headers / central directory / EOCD — no stdlib zipfile — and
    re-parsed by the pure struct walker with per-member CRC-32
    verification. The all_crc_ok flag plus the extracted-text
    fingerprint pin both the directory arithmetic and the raw-deflate
    path; stdlib zipfile cross-validates the wire layout in both
    directions in tests. Odd ids write the zip64 layout (EOCD64
    record + locator, 0x0001 extras — the >4 GiB crawl-dump shape,
    exercised structurally without 4 GiB of bytes); encrypted and
    multi-disk archives refuse loudly."""
    from funding_monitoring_spark.operators.containers import (
        encode_zip,
        parse_zip,
    )

    def build(mid, text, lang, source):
        return encode_zip(
            [
                ("doc.txt", text.encode("latin-1"), True),
                ("meta.tsv",
                 _meta_line(mid, lang, source).encode("latin-1"),
                 False),
            ],
            force_zip64=bool(mid % 2),
        )

    def extract(mid, payload):
        members = {m["name"]: m for m in parse_zip(payload)}
        doc = members["doc.txt"]
        meta = members["meta.tsv"]
        return {
            "media_id": mid,
            "n_members": len(members),
            "n_deflated": sum(
                1 for m in members.values() if m["method"] == 8
            ),
            "all_crc_ok": int(
                all(m["crc_ok"] for m in members.values())
            ),
            "doc_bytes": doc["size"],
            "meta_bytes": meta["size"],
            "doc_fingerprint": _poly_fp(doc["data"]),
        }

    docs = load_table(spark, sf_dir, "documents")
    return _features(_doc_media(docs, build), extract, _ZIP_SCHEMA)


# -- TAR ------------------------------------------------------------------------

_TAR_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_members", T.IntegerType()),
        T.StructField("total_bytes", T.IntegerType()),
        T.StructField("gzipped", T.IntegerType()),
        T.StructField("doc_fingerprint", T.LongType()),
    ]
)


@query(
    "tar_manifest_scan",
    f"""
    SELECT doc_id AS media_id,
           2 AS n_members,
           CAST(length(text) + {_META_LEN_SQL} AS INT) AS total_bytes,
           CAST(doc_id % 2 AS INT) AS gzipped,
           {_FP_SQL} AS doc_fingerprint
    FROM documents
    """,
)
def q_tar_manifest_scan(spark, sf_dir):
    """POSIX tar walk (the dataset-dump format): each document
    becomes a real two-member tar (doc.txt + meta.tsv), odd ids
    gzip-wrapped (.tar.gz), and ids with mid % 3 == 0 carry the doc
    under a 120-byte directory path — which travels as a pax 'x'
    extended header exactly as POSIX.1-2001 writes it, so the pax
    path machinery runs on the distributed path, not only in tests.
    The parser validates every 512-byte header's space-normalized
    checksum, honors block padding, applies pax/GNU-longname/prefix
    names, skips directory entries and refuses link types. Sizes and
    the extracted-text fingerprint are oracle-recomputed; stdlib
    tarfile cross-validates the layout in both directions in
    tests."""
    from funding_monitoring_spark.operators.containers import (
        encode_tar,
        parse_tar,
    )

    _LONG_DIR = "corpus/" * 16  # 112 bytes: forces the pax path record

    def build(mid, text, lang, source):
        doc_name = (
            f"{_LONG_DIR}doc.txt" if mid % 3 == 0 else "doc.txt"
        )
        return encode_tar(
            [
                (doc_name, text.encode("latin-1")),
                ("meta.tsv",
                 _meta_line(mid, lang, source).encode("latin-1")),
            ],
            gzip_whole=(mid % 2 == 1),
        )

    def extract(mid, payload):
        gz = payload[:2] == b"\x1f\x8b"
        members = {
            m["name"].rsplit("/", 1)[-1]: m for m in parse_tar(payload)
        }
        return {
            "media_id": mid,
            "n_members": len(members),
            "total_bytes": sum(m["size"] for m in members.values()),
            "gzipped": int(gz),
            "doc_fingerprint": _poly_fp(members["doc.txt"]["data"]),
        }

    docs = load_table(spark, sf_dir, "documents")
    return _features(_doc_media(docs, build), extract, _TAR_SCHEMA)


# -- robots exclusion ------------------------------------------------------------

_ROBOTS_TXT = (
    "User-agent: *\n"
    "Disallow: /private\n"
    "Allow: /private/pub\n"
    "Disallow: /tmp\n"
)


@query(
    "robots_txt_filter",
    """
    SELECT doc_id,
           source AS host,
           CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN '/private/pub/x' || CAST(doc_id AS VARCHAR)
               WHEN 1 THEN '/private/x' || CAST(doc_id AS VARCHAR)
               WHEN 2 THEN '/tmp/x' || CAST(doc_id AS VARCHAR)
               ELSE '/pages/x' || CAST(doc_id AS VARCHAR)
           END AS path,
           CASE WHEN doc_id % 4 IN (0, 3) THEN 1 ELSE 0 END AS allowed,
           CASE CAST(doc_id % 4 AS INT)
               WHEN 0 THEN '/private/pub'
               WHEN 1 THEN '/private'
               WHEN 2 THEN '/tmp'
               ELSE ''
           END AS matched_rule
    FROM documents
    """,
)
def q_robots_txt_filter(spark, sf_dir):
    """Robots-exclusion re-evaluation at corpus scale (RFC 9309) —
    retroactive disallow sweeps run over petabytes long after the
    fetch. Per-host robots.txt files parse to (verb, prefix) rules
    (operators/robots.py; only the '*' group and literal prefixes —
    wildcard patterns refuse loudly via row-level raise_error), fold
    to ONE array row per host, BROADCAST onto the URLs, and each URL
    resolves its verdict with a higher-order fold over matching
    prefixes (longest wins, Allow beats Disallow on ties) — zero
    shuffle of the corpus side. The fixture exercises all four
    verdict shapes: allow-by-more-specific-Allow, disallowed,
    disallowed-second-rule, and no-match-allowed."""
    from funding_monitoring_spark.operators.robots import (
        evaluate_robots,
        parse_robots_rules,
    )

    docs = load_table(spark, sf_dir, "documents")
    robots = docs.select(F.col("source").alias("host")).distinct() \
        .withColumn("robots_txt", F.lit(_ROBOTS_TXT))
    rules = parse_robots_rules(robots)
    did = F.col("doc_id").cast("string")
    urls = docs.select(
        "doc_id",
        F.col("source").alias("host"),
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("/private/pub/x"), did))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit("/private/x"), did))
        .when(F.col("doc_id") % 4 == 2, F.concat(F.lit("/tmp/x"), did))
        .otherwise(F.concat(F.lit("/pages/x"), did))
        .alias("path"),
    )
    return evaluate_robots(urls, rules)


# -- DOCX (OOXML: ZIP + XML, both machineries composed) ---------------------

_DOCX_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_members", T.IntegerType()),
        T.StructField("n_paragraphs", T.IntegerType()),
        T.StructField("n_text_chars", T.IntegerType()),
        T.StructField("doc_fingerprint", T.LongType()),
    ]
)

_DOCX_CONTENT_TYPES = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
    'content-types">'
    '<Default Extension="rels" ContentType="application/vnd.'
    'openxmlformats-package.relationships+xml"/>'
    '<Default Extension="xml" ContentType="application/xml"/>'
    '<Override PartName="/word/document.xml" ContentType="application/'
    'vnd.openxmlformats-officedocument.wordprocessingml.document.main'
    '+xml"/></Types>'
)

_DOCX_RELS = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    '<Relationships xmlns="http://schemas.openxmlformats.org/package/'
    '2006/relationships">'
    '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
    'officeDocument/2006/relationships/officeDocument" '
    'Target="word/document.xml"/></Relationships>'
)

_W_NS = (
    "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
)


def build_docx(text: str) -> bytes:
    """Minimal real OOXML word document: [Content_Types].xml +
    package rels + word/document.xml, one <w:p><w:r><w:t> per text
    line (the canonical paragraph mapping), zipped with the repo's
    own ZIP writer. Reads in Word-compatible tooling; here it is the
    fixture for the ZIP x XML composition."""
    from xml.sax.saxutils import escape

    from funding_monitoring_spark.operators.containers import encode_zip

    paras = "".join(
        f'<w:p><w:r><w:t xml:space="preserve">{escape(line)}</w:t>'
        "</w:r></w:p>"
        for line in text.split("\n")
    )
    document = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{_W_NS}"><w:body>{paras}</w:body>'
        "</w:document>"
    )
    return encode_zip(
        [
            ("[Content_Types].xml", _DOCX_CONTENT_TYPES.encode(), False),
            ("_rels/.rels", _DOCX_RELS.encode(), False),
            ("word/document.xml", document.encode("utf-8"), True),
        ]
    )


def extract_docx_text(payload: bytes) -> tuple[int, list[str]]:
    """(n_zip_members, paragraph texts): unzip with the repo ZIP
    walker, parse word/document.xml with a REAL XML parser (stdlib
    ElementTree — entity unescape, namespace handling), and read each
    paragraph's <w:t> runs in document order. Missing document part
    or malformed XML refuse loudly."""
    import xml.etree.ElementTree as ET

    from funding_monitoring_spark.operators.containers import parse_zip

    members = {m["name"]: m for m in parse_zip(payload)}
    if "word/document.xml" not in members:
        raise ValueError("DOCX has no word/document.xml part")
    root = ET.fromstring(
        members["word/document.xml"]["data"].decode("utf-8")
    )
    ns = {"w": _W_NS}
    paras = []
    for p in root.iter(f"{{{_W_NS}}}p"):
        paras.append(
            "".join(t.text or "" for t in p.findall(".//w:t", ns))
        )
    return len(members), paras


@query(
    "docx_text_extract",
    f"""
    SELECT doc_id AS media_id,
           3 AS n_members,
           CAST(1 + length(text)
                - length(replace(text, chr(10), '')) AS INT)
               AS n_paragraphs,
           CAST(length(text) AS INT) AS n_text_chars,
           {_FP_SQL} AS doc_fingerprint
    FROM documents
    """,
)
def q_docx_text_extract(spark, sf_dir):
    """Office-document text recovery — the DOCX mass of a crawl,
    handled by COMPOSING two machineries this engine already carries:
    each document becomes a minimal REAL OOXML package (three-part
    ZIP: content types, package rels, word/document.xml with one
    <w:p><w:r><w:t> per text line) written by the repo's own ZIP
    writer, then re-opened by the ZIP walker and parsed with a real
    XML parser — entity unescape and namespaces included — to recover
    the paragraph runs in document order. The recovered text
    (paragraphs re-joined with newlines) is fingerprinted with the
    rolling polynomial the oracle recomputes from the original
    column, so zip framing, deflate, XML escaping and paragraph-walk
    bugs all break the hash. At 100 TB this is one scan-stage
    mapInPandas pair per payload — embarrassingly parallel, no
    shuffle."""
    _register_by_value()

    def build(mid, text, lang, source):
        return build_docx(text)

    def extract(mid, payload):
        n_members, paras = extract_docx_text(payload)
        recovered = "\n".join(paras)
        return {
            "media_id": mid,
            "n_members": n_members,
            "n_paragraphs": len(paras),
            "n_text_chars": len(recovered),
            "doc_fingerprint": _poly_fp(recovered.encode("latin-1")),
        }

    docs = load_table(spark, sf_dir, "documents")
    return _features(_doc_media(docs, build), extract, _DOCX_SCHEMA)
