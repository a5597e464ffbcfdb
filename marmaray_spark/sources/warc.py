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


def _warc_kernel(record_types: tuple[str, ...]):
    """The per-file WARC parse as an Arrow kernel over (path, content)
    batches — shared by the batch scan and the streaming leg, so the two
    can never disagree on record semantics."""
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

    return kernel


def read_warc(spark: SparkSession, path_glob: str,
              record_types: tuple[str, ...] = ("response",)) -> DataFrame:
    """One row per WARC record of the requested types across every
    matched archive. Corrupt gzip members and malformed records fork
    per-row (ok=False, err says why, payload NULL) — an archive with one
    bad record still yields its other million."""
    scan = (spark.read.format("binaryFile").load(path_glob)
            .select("path", "content"))
    return scan.mapInPandas(_warc_kernel(record_types), WARC_SCHEMA)


def read_warc_stream(spark: SparkSession, path: str,
                     record_types: tuple[str, ...] = ("response",)
                     ) -> DataFrame:
    """Structured-Streaming WARC ingest: archives arriving under ``path``
    are parsed exactly once (the file source's checkpointed file log —
    pair with ``trigger(availableNow=True)`` for the bounded-catch-up
    tick shape, streaming/incremental.py). Same Arrow kernel as
    :func:`read_warc`, so batch and streaming cannot disagree; same
    decode-or-error row contract. The batch-side alternative with a
    LOUD late-arrival guard is WarcWorkUnitCalculator — this leg is for
    pipelines already running their ingest as streams (the OCF stream's
    twin, sources/avro_file.py read_ocf_stream)."""
    files = (spark.readStream.format("binaryFile")
             .schema("path string, modificationTime timestamp, "
                     "length long, content binary")
             .option("pathGlobFilter", "*.warc.gz")
             .load(path)
             .select("path", "content"))
    return files.mapInPandas(_warc_kernel(record_types), WARC_SCHEMA)


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


# -- incremental pickup -------------------------------------------------------

class WarcLateArrivalError(RuntimeError):
    """An archive appeared at or below the committed watermark — the
    monotonic-name contract was violated and silently skipping it would
    lose data (the WARC twin of kafka.DataLossError)."""


class WarcWorkUnit:
    """One run's archives: full paths to read + the watermark to commit."""

    def __init__(self, paths: list[str], watermark: str,
                 n_below: int) -> None:
        self.paths = paths
        self.watermark = watermark
        self.n_below = n_below


class WarcWorkUnitCalculator:
    """Incremental checkpointed pickup over a crawl-archive directory —
    the reference's work-unit contract (IWorkUnitCalculator.java:36-90,
    FileWorkUnitCalculator.java:40-118) applied to WARC archives, so the
    crawl first mile ticks instead of re-reading the world.

    Planning: list ``<dir>/*.warc.gz`` sorted; everything ABOVE the
    committed watermark (the last processed archive name) is this run's
    work, capped at ``max_archives`` per run (the Kafka 1M-message cap
    transposed — a backlog drains across ticks at bounded run size).
    Exactly-once rides the standard contract: ``save_next_run_state``
    stages the new watermark in the metadata manager and the caller
    persists via ``metadata.save_changes()`` only AFTER the sink commit
    — a crash between read and commit replays the same archives, and
    an idempotent sink (dedup-insert / upsert) absorbs the replay.

    Crawl archives are named monotonically in practice (Common Crawl
    segments embed their timestamp), which is what a watermark needs;
    because listings are cheap, the contract is additionally ENFORCED:
    the committed state carries the count of archives at-or-below the
    watermark, and a later listing with a different count means a late
    arrival landed below the watermark — compute_work_units then raises
    :class:`WarcLateArrivalError` (data loss made loud, never silent
    skip; the remedy is a named re-ingest or a watermark reset). O(1)
    state either way — two keys per source, never a processed-file set
    that grows with the crawl."""

    def __init__(self, directory, metadata, source_name: str = "warc",
                 max_archives: int | None = None,
                 suffix: str = ".warc.gz") -> None:
        from pathlib import Path
        self.directory = Path(directory)
        self.metadata = metadata
        self.max_archives = max_archives
        self.suffix = suffix
        self._wm_key = f"warc.{source_name}.watermark"
        self._n_key = f"warc.{source_name}.n_below"
        self._next: tuple[str, int] | None = None

    def compute_work_units(self) -> list[WarcWorkUnit]:
        names = sorted(p.name for p in self.directory.glob(f"*{self.suffix}")
                       if p.is_file())
        wm = self.metadata.get(self._wm_key) or ""
        below = [n for n in names if n <= wm]
        committed_below = int(self.metadata.get(self._n_key) or 0)
        if len(below) != committed_below:
            raise WarcLateArrivalError(
                f"DATA_LOSS:LATE_WARC_ARCHIVE:dir:{self.directory}:"
                f"watermark:{wm}:listed_below:{len(below)}:"
                f"committed_below:{committed_below}")
        new = [n for n in names if n > wm]
        if self.max_archives is not None:
            new = new[:self.max_archives]
        if not new:
            self._next = (wm, committed_below)
            return []
        self._next = (new[-1], committed_below + len(new))
        return [WarcWorkUnit([str(self.directory / n) for n in new],
                             new[-1], committed_below + len(new))]

    def save_next_run_state(self, work_units=None) -> None:
        if self._next is None:
            raise RuntimeError("compute_work_units() has not run")
        wm, n = self._next
        self.metadata.set(self._wm_key, wm)
        self.metadata.set(self._n_key, str(n))


class WarcSource:
    """Reads a work unit's archives via :func:`read_warc` and forks the
    decode-or-error column pair into the standard (valid, error-records)
    conversion result — corrupt members and malformed records land in
    the error table with the archive name preserved, the same quarantine
    contract as the JSON/CSV/columnar file sources."""

    def __init__(self, spark: SparkSession,
                 record_types: tuple[str, ...] = ("response",)) -> None:
        self.spark = spark
        self.record_types = record_types

    def get_data(self, work_unit: WarcWorkUnit):
        from pyspark.sql import functions as F

        from marmaray_spark.converters import ConversionResult
        from marmaray_spark.operators.errors import to_error_records
        from marmaray_spark.operators.fork import (ERROR_KEY, VALID_KEY,
                                                   valid_error_fork)

        df = read_warc(self.spark, work_unit.paths,
                       record_types=self.record_types)
        fork = valid_error_fork(df, F.col("ok"))
        valid = fork.get_fork_data(VALID_KEY).drop("ok", "err")
        errors = to_error_records(
            fork.get_fork_data(ERROR_KEY).select(
                "warc_file", F.col("err").alias("raw_line")),
            F.lit("corrupt WARC member/record"),
        )
        return ConversionResult(valid, errors,
                                fork.get_count(VALID_KEY),
                                fork.get_count(ERROR_KEY))
