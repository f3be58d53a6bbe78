"""WARC (Web ARChive, public ISO 28500 / WARC 1.1 spec) source/sink,
from scratch on the stdlib: the container format of Common Crawl and
every web-archive-derived training corpus. An LLM-data pipeline's raw
landing zone IS .warc.gz — this module lets the engine both ingest real
crawl archives and emit them, next to the Avro/ORC/Delta interchange
tier (reference scope anchor: the copier's source/sink families,
``src/scala/simpleanonymizer/DbCopier.scala:1-60`` — WARC is the web
analog of its table sources).

Format essentials implemented directly: a record is a ``WARC/1.x``
version line, CRLF-delimited named header fields (``WARC-Type``,
``WARC-Record-ID``, ``WARC-Date``, ``Content-Length`` mandatory), one
blank line, ``Content-Length`` payload bytes, and a CRLF CRLF trailer.
Files concatenate records; the standard web-archive layout compresses
EACH record as its own gzip member (that is what makes a 100 GB crawl
file splittable at member boundaries), which ``gzip``/``zlib`` handle
natively. Writes are deterministic (house rule): gzip mtime pinned to
0, record ids derived from content (UUIDv5-style from the md5 of
uri+payload), header order fixed.

Scope (documented subset, ValueError otherwise): ``resource`` records
carry raw payloads (what the sink writes); ``response``/``request``/
``metadata``/``warcinfo``/``conversion``/``revisit`` records are read
and surfaced as-is with payload untouched — HTTP framing inside
``response`` payloads belongs to ``operators/textprep.py``'s extraction
stage, not the container.

Distribution (100 TB): same shape as ``sources/avro.py`` — the sink
writes ONE ``.warc.gz`` per Spark partition executor-side inside a
single ``mapInPandas`` stage; the source schedules one decode task per
archive file (real crawls ship as many ~1 GB files, so file-granular
parallelism is the native layout; per-member splits within one jumbo
file are possible with a gzip-member index, not needed here).
"""

from __future__ import annotations

import gzip
import hashlib
import os
import uuid
import zlib
from typing import Iterator, Sequence

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

GZIP_MAGIC = b"\x1f\x8b"

_MANDATORY = ("WARC-Type", "WARC-Record-ID", "WARC-Date", "Content-Length")

#: reader output schema (fixed): every header rides the map, the
#: spec-mandated fields are promoted to typed columns.
READ_SCHEMA = (
    "record_id string, warc_type string, target_uri string, "
    "warc_date string, content_type string, content_length long, "
    "payload binary, headers map<string,string>"
)


# -- record codec ------------------------------------------------------------


def format_record(headers: Sequence[tuple[str, str]], payload: bytes) -> bytes:
    """Serialize one WARC record (version line + headers + payload +
    CRLF CRLF trailer). ``Content-Length`` is computed here — callers
    must not pass it."""
    out = [b"WARC/1.1\r\n"]
    seen = set()
    for name, value in headers:
        if name.lower() == "content-length":
            raise ValueError("Content-Length is derived, not caller-set")
        if "\r" in value or "\n" in value:
            raise ValueError(f"header {name!r} value contains CR/LF")
        seen.add(name.lower())
        out.append(f"{name}: {value}\r\n".encode("utf-8"))
    for req in ("WARC-Type", "WARC-Record-ID", "WARC-Date"):
        if req.lower() not in seen:
            raise ValueError(f"missing mandatory header {req}")
    out.append(f"Content-Length: {len(payload)}\r\n".encode())
    out.append(b"\r\n")
    out.append(payload)
    out.append(b"\r\n\r\n")
    return b"".join(out)


def _parse_one(data: bytes, pos: int) -> tuple[dict[str, str], bytes, int]:
    """Parse one record at ``pos`` -> (headers lowercased, payload,
    next_pos). ValueError on anything malformed — the untrusted-bytes
    contract shared with the media codecs."""
    end = data.find(b"\r\n\r\n", pos)
    if end < 0:
        raise ValueError("truncated WARC header block")
    head = data[pos:end]
    lines = head.split(b"\r\n")
    if not lines[0].startswith(b"WARC/"):
        raise ValueError("missing WARC version line")
    headers: dict[str, str] = {}
    for line in lines[1:]:
        # spec allows LWS continuation lines; fold them into the prior
        # value to stay lossless on real crawl data
        if line[:1] in (b" ", b"\t") and headers:
            headers[last] += " " + line.strip().decode("utf-8", "replace")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise ValueError(f"malformed header line {line!r}")
        last = name.strip().decode("utf-8", "replace").lower()
        headers[last] = value.strip().decode("utf-8", "replace")
    for req in _MANDATORY:
        if req.lower() not in headers:
            raise ValueError(f"missing mandatory header {req}")
    try:
        length = int(headers["content-length"])
    except ValueError as exc:
        raise ValueError("non-integer Content-Length") from exc
    if length < 0:
        raise ValueError("negative Content-Length")
    body_start = end + 4
    if body_start + length > len(data):
        raise ValueError("truncated WARC payload")
    payload = data[body_start:body_start + length]
    trailer = data[body_start + length:body_start + length + 4]
    if trailer != b"\r\n\r\n":
        raise ValueError("missing record trailer CRLF CRLF")
    return headers, payload, body_start + length + 4


def parse_records(data: bytes) -> list[tuple[dict[str, str], bytes]]:
    """Decode one archive (gzipped — possibly many members — or plain)
    into ``[(headers, payload)]``. Header names are lowercased; values
    verbatim."""
    if data[:2] == GZIP_MAGIC:
        try:
            data = gzip.decompress(data)  # handles concatenated members
        except (OSError, EOFError, zlib.error) as exc:
            raise ValueError("bad gzip stream") from exc
    out = []
    pos = 0
    while pos < len(data):
        headers, payload, pos = _parse_one(data, pos)
        out.append((headers, payload))
    return out


def _record_id(uri: str, payload: bytes) -> str:
    """Deterministic spec-shaped id: ``<urn:uuid:...>`` derived from the
    content (md5 of uri + payload), so identical writes are
    byte-identical — the determinism house rule."""
    digest = hashlib.md5(uri.encode("utf-8") + b"\x00" + payload).digest()
    return f"<urn:uuid:{uuid.UUID(bytes=digest)}>"


# -- Spark integration -------------------------------------------------------


def write_warc(
    df: DataFrame,
    out_dir: str,
    uri_col: str = "target_uri",
    payload_col: str = "payload",
    date_col: str | None = None,
    meta_cols: Sequence[str] = (),
    content_type: str = "text/plain; charset=utf-8",
    compress: bool = True,
) -> int:
    """Distributed WARC sink: ``resource`` records, one ``.warc.gz``
    (or ``.warc``) per partition, written executor-side inside one
    ``mapInPandas`` stage; returns the total record count from the
    bounded per-file manifest (one row per partition).

    ``meta_cols`` ride as ``WARC-X-Meta-<col>`` extension fields
    (str()-serialized; the spec allows extension fields), which is what
    makes the sink round-trippable for arbitrary narrow tables.
    ``date_col`` must be ISO-8601 strings when given; otherwise the
    epoch is pinned (a date is mandatory per spec, and a wall-clock
    default would break write determinism).
    """
    from pyspark.sql import functions as F

    os.makedirs(out_dir, exist_ok=True)
    cols = [uri_col, payload_col, *([date_col] if date_col else []),
            *meta_cols]
    src = df.select(*cols)
    ext = "warc.gz" if compress else "warc"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        chunks: list[bytes] = []
        n = 0
        for pdf in batches:
            for row in pdf[cols].itertuples(index=False, name=None):
                uri = str(row[0])
                raw = row[1]
                payload = (raw.encode("utf-8") if isinstance(raw, str)
                           else bytes(raw))
                date = (str(row[2]) if date_col
                        else "1970-01-01T00:00:00Z")
                meta = row[3:] if date_col else row[2:]
                headers = [
                    ("WARC-Type", "resource"),
                    ("WARC-Record-ID", _record_id(uri, payload)),
                    ("WARC-Date", date),
                    ("WARC-Target-URI", uri),
                    ("Content-Type", content_type),
                ]
                for name, v in zip(meta_cols, meta):
                    headers.append(
                        (f"WARC-X-Meta-{name}", "" if v is None else str(v))
                    )
                rec = format_record(headers, payload)
                chunks.append(gzip.compress(rec, 6, mtime=0)
                              if compress else rec)
                n += 1
        if n == 0:
            yield pd.DataFrame({"path": pd.array([], dtype="object"),
                                "n_rows": pd.array([], dtype="Int64")})
            return
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex}.{ext}")
        with open(path, "wb") as fh:
            fh.write(b"".join(chunks))
        yield pd.DataFrame({"path": [path], "n_rows": [n]})

    manifest = src.mapInPandas(run, "path string, n_rows long")
    return int(manifest.agg(F.sum("n_rows")).collect()[0][0] or 0)


def read_warc(spark: SparkSession, in_dir: str) -> DataFrame:
    """Distributed WARC source: one decode task per archive file,
    surfacing every record as a typed row (see ``READ_SCHEMA``) with the
    full header set in a map column — the raw-crawl ingest front of the
    text pipeline (``textprep.extract_html_text`` downstream)."""
    files = sorted(
        os.path.join(in_dir, f) for f in os.listdir(in_dir)
        if f.endswith((".warc", ".warc.gz"))
    )
    if not files:
        raise ValueError(f"no .warc/.warc.gz files under {in_dir}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path in pdf["path"]:
                with open(path, "rb") as fh:
                    records = parse_records(fh.read())
                yield pd.DataFrame({
                    "record_id": [h["warc-record-id"] for h, _ in records],
                    "warc_type": [h["warc-type"] for h, _ in records],
                    "target_uri": [h.get("warc-target-uri")
                                   for h, _ in records],
                    "warc_date": [h["warc-date"] for h, _ in records],
                    "content_type": [h.get("content-type")
                                     for h, _ in records],
                    "content_length": pd.array(
                        [int(h["content-length"]) for h, _ in records],
                        dtype="Int64"),
                    "payload": pd.Series([p for _, p in records],
                                         dtype="object"),
                    "headers": pd.Series([h for h, _ in records],
                                         dtype="object"),
                })

    paths = spark.createDataFrame([(p,) for p in files], "path string") \
        .repartition(len(files), "path")
    return paths.mapInPandas(run, READ_SCHEMA)


# -- Spark Python Data Source: format("pywarc") ------------------------------
#
# The idiomatic front door — spark.read.format("pywarc").load(dir) /
# df.write.format("pywarc").mode(...).save(dir) — on Spark 4's Python
# Data Source API (the pyavro pattern): fixed READ_SCHEMA, one input
# partition per archive file, one written archive per task. Write
# options: uri_col/payload_col/date_col/content_type/compress plus
# meta_cols (comma-separated column names to ride as WARC-X-Meta-*).

try:  # pragma: no cover - import surface depends on pyspark build
    from pyspark.sql.datasource import (
        DataSource, DataSourceReader, DataSourceWriter, InputPartition,
        WriterCommitMessage,
    )

    class _WarcFilePartition(InputPartition):
        def __init__(self, path: str):
            self.path = path

    class WarcDataSource(DataSource):
        """``format("pywarc")`` — see module docstring."""

        @classmethod
        def name(cls) -> str:
            return "pywarc"

        def _dir(self) -> str:
            path = self.options.get("path")
            if not path:
                raise ValueError("pywarc requires a path (use .load(dir))")
            return path

        def schema(self):
            from pyspark.sql import types as T

            return T.StructType([
                T.StructField("record_id", T.StringType()),
                T.StructField("warc_type", T.StringType()),
                T.StructField("target_uri", T.StringType()),
                T.StructField("warc_date", T.StringType()),
                T.StructField("content_type", T.StringType()),
                T.StructField("content_length", T.LongType()),
                T.StructField("payload", T.BinaryType()),
                T.StructField("headers",
                              T.MapType(T.StringType(), T.StringType())),
            ])

        def reader(self, schema) -> "WarcFileReader":
            return WarcFileReader(self._dir())

        def writer(self, schema, overwrite: bool) -> "WarcFileWriter":
            out = self._dir()
            if overwrite and os.path.isdir(out):
                for f in os.listdir(out):
                    if f.endswith((".warc", ".warc.gz")):
                        os.unlink(os.path.join(out, f))
            os.makedirs(out, exist_ok=True)
            names = [f.name for f in schema.fields]
            o = self.options
            meta_cols = [c for c in o.get("meta_cols", "").split(",") if c]
            return WarcFileWriter(
                out, names,
                uri_col=o.get("uri_col", "target_uri"),
                payload_col=o.get("payload_col", "payload"),
                date_col=o.get("date_col") or None,
                meta_cols=meta_cols,
                content_type=o.get("content_type",
                                   "text/plain; charset=utf-8"),
                compress=o.get("compress", "true").lower() != "false",
            )

    class WarcFileReader(DataSourceReader):
        def __init__(self, in_dir: str):
            self.in_dir = in_dir

        def partitions(self):
            return [
                _WarcFilePartition(os.path.join(self.in_dir, f))
                for f in sorted(os.listdir(self.in_dir))
                if f.endswith((".warc", ".warc.gz"))
            ]

        def read(self, partition: "_WarcFilePartition") -> Iterator[tuple]:
            with open(partition.path, "rb") as fh:
                records = parse_records(fh.read())
            for h, payload in records:
                yield (h["warc-record-id"], h["warc-type"],
                       h.get("warc-target-uri"), h["warc-date"],
                       h.get("content-type"), int(h["content-length"]),
                       payload, h)

    class _WarcWriteResult(WriterCommitMessage):
        def __init__(self, n_rows: int):
            self.n_rows = n_rows

    class WarcFileWriter(DataSourceWriter):
        def __init__(self, out_dir: str, names: list[str], *, uri_col: str,
                     payload_col: str, date_col: str | None,
                     meta_cols: list[str], content_type: str,
                     compress: bool):
            self.out_dir = out_dir
            self.idx = {n: i for i, n in enumerate(names)}
            for c in (uri_col, payload_col, *(([date_col] if date_col
                                               else [])), *meta_cols):
                if c not in self.idx:
                    raise ValueError(f"column {c!r} not in written schema")
            self.uri_col, self.payload_col = uri_col, payload_col
            self.date_col, self.meta_cols = date_col, meta_cols
            self.content_type, self.compress = content_type, compress

        def write(self, iterator: Iterator) -> "_WarcWriteResult":
            chunks: list[bytes] = []
            n = 0
            for row in iterator:
                uri = str(row[self.idx[self.uri_col]])
                raw = row[self.idx[self.payload_col]]
                payload = (raw.encode("utf-8") if isinstance(raw, str)
                           else bytes(raw))
                date = (str(row[self.idx[self.date_col]]) if self.date_col
                        else "1970-01-01T00:00:00Z")
                headers = [
                    ("WARC-Type", "resource"),
                    ("WARC-Record-ID", _record_id(uri, payload)),
                    ("WARC-Date", date),
                    ("WARC-Target-URI", uri),
                    ("Content-Type", self.content_type),
                ]
                for name in self.meta_cols:
                    v = row[self.idx[name]]
                    headers.append((f"WARC-X-Meta-{name}",
                                    "" if v is None else str(v)))
                rec = format_record(headers, payload)
                chunks.append(gzip.compress(rec, 6, mtime=0)
                              if self.compress else rec)
                n += 1
            if n:
                ext = "warc.gz" if self.compress else "warc"
                path = os.path.join(self.out_dir,
                                    f"part-{uuid.uuid4().hex}.{ext}")
                with open(path, "wb") as fh:
                    fh.write(b"".join(chunks))
            return _WarcWriteResult(n)

        def commit(self, messages) -> None:
            pass  # files are in place; partition-atomic like the DB sink

        def abort(self, messages) -> None:
            pass

except ImportError:  # pragma: no cover
    WarcDataSource = None  # type: ignore[assignment]
