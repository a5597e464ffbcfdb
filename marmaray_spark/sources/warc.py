"""WARC crawl-archive source: the container Common Crawl ships, read
distributed — the missing first mile of the crawl pipeline (WARC ->
extract_text_from_html -> URL curation -> gates -> dedup -> mix ->
shards, every later stage already first-class).

WARC (ISO 28500) is line-oriented: each record is a ``WARC/1.x`` version
line, ``Name: value`` headers (notably WARC-Type, WARC-Target-URI,
Content-Length), an empty line, ``Content-Length`` payload bytes, then
``\\r\\n\\r\\n``. ``.warc.gz`` files hold ONE GZIP MEMBER PER RECORD
(the spec's recommendation precisely so readers can split work without
decompressing everything) — the reader walks members with repeated
``zlib.decompressobj`` calls over each member's tail (``unused_data``),
so a truncated or corrupt member forks THAT record, not the file.

``response`` records carry an HTTP message as payload; the reader
splits status line + headers from the body and exposes both. Parsing
is per-file inside one Arrow kernel over a ``binaryFile`` scan:
parallelism = WARC file count (Common Crawl segments are ~1 GiB —
sized for exactly this), archive bytes never leave their executor.
"""

from __future__ import annotations

import zlib

from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = ("warc_file string, record_type string, target_uri string, "
               "warc_date string, content_type string, "
               "http_status int, http_content_type string, "
               "payload binary, ok boolean, err string")


def split_warc_members(blob: bytes):
    """Yield (record_bytes, None) per gzip member of a .warc.gz — or
    (None, reason) for a member that fails to inflate — and treat a
    plain uncompressed WARC (no gzip magic) as one pseudo-member."""
    if blob[:2] != b"\x1f\x8b":
        yield blob, None
        return
    pos = 0
    while pos < len(blob):
        d = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            out = d.decompress(blob[pos:])
            while not d.eof and d.unconsumed_tail:
                out += d.decompress(d.unconsumed_tail)
            if not d.eof:
                yield None, "truncated gzip member"
                return
        except zlib.error as e:
            yield None, f"zlib: {e}"
            return
        yield out, None
        consumed = len(blob) - pos - len(d.unused_data)
        if consumed <= 0:
            yield None, "gzip member consumed no bytes"
            return
        pos += consumed


def parse_warc_records(buf: bytes):
    """Yield per record: (headers dict lower-cased, payload bytes) or
    raise ValueError — callers fork per record. A buffer may hold many
    records (an uncompressed WARC, or a multi-record gzip member)."""
    pos = 0
    n = len(buf)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and buf[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        head_end = buf.find(b"\r\n\r\n", pos)
        if head_end < 0:
            raise ValueError("record header never terminates")
        head = buf[pos:head_end].decode("utf-8", "replace")
        lines = head.split("\r\n")
        if not lines[0].startswith("WARC/"):
            raise ValueError(f"bad version line {lines[0][:40]!r}")
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            k, _, v = ln.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("missing/bad Content-Length") from None
        body_start = head_end + 4
        if body_start + clen > n:
            raise ValueError("payload overruns buffer")
        yield headers, bytes(buf[body_start:body_start + clen])
        pos = body_start + clen


def split_http_payload(payload: bytes):
    """(status int|None, content_type str|None, body) for a response
    record's HTTP message; non-HTTP payloads come back unsplit."""
    if not payload[:5] == b"HTTP/":
        return None, None, payload
    head_end = payload.find(b"\r\n\r\n")
    if head_end < 0:
        return None, None, payload
    lines = payload[:head_end].decode("latin-1").split("\r\n")
    parts = lines[0].split(None, 2)
    status = int(parts[1]) if len(parts) > 1 and parts[1].isdigit() else None
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
            break
    return status, ctype, payload[head_end + 4:]


def read_warc(spark: SparkSession, path_glob: str,
              record_types: tuple[str, ...] = ("response",)) -> DataFrame:
    """One row per WARC record of the requested types across every
    matched archive. Corrupt gzip members and malformed records fork
    per-row (ok=False, err says why, payload NULL) — an archive with one
    bad record still yields its other million."""
    import pandas as pd

    wanted = tuple(t.lower() for t in record_types)

    def kernel(batches):
        for pdf in batches:
            rows = []
            for fpath, blob in zip(pdf["path"], pdf["content"]):
                fname = fpath.rsplit("/", 1)[-1]
                for member, memb_err in split_warc_members(bytes(blob)):
                    if memb_err is not None:
                        rows.append((fname, None, None, None, None, None,
                                     None, None, False, memb_err))
                        continue
                    try:
                        for headers, payload in parse_warc_records(member):
                            rtype = headers.get("warc-type", "").lower()
                            if rtype not in wanted:
                                continue
                            status, hct, body = split_http_payload(payload)
                            rows.append((
                                fname, rtype,
                                headers.get("warc-target-uri"),
                                headers.get("warc-date"),
                                headers.get("content-type"),
                                status, hct, body, True, None))
                    except ValueError as e:
                        rows.append((fname, None, None, None, None, None,
                                     None, None, False, str(e)))
            yield pd.DataFrame(rows, columns=[
                "warc_file", "record_type", "target_uri", "warc_date",
                "content_type", "http_status", "http_content_type",
                "payload", "ok", "err"]) if rows else pd.DataFrame(
                    {c: [] for c in [
                        "warc_file", "record_type", "target_uri",
                        "warc_date", "content_type", "http_status",
                        "http_content_type", "payload", "ok", "err"]})

    scan = (spark.read.format("binaryFile").load(path_glob)
            .select("path", "content"))
    return scan.mapInPandas(kernel, WARC_SCHEMA)


def write_warc_gz(records: list[tuple[dict, bytes]]) -> bytes:
    """Synthesize a spec-shaped .warc.gz (one gzip member per record) —
    the test/fixture twin of read_warc, and a seam for re-archiving."""
    import gzip

    out = bytearray()
    for headers, payload in records:
        head = "WARC/1.0\r\n" + "".join(
            f"{k}: {v}\r\n" for k, v in headers.items()) \
            + f"Content-Length: {len(payload)}\r\n\r\n"
        rec = head.encode("utf-8") + payload + b"\r\n\r\n"
        out += gzip.compress(rec)
    return bytes(out)
