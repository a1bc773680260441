"""WARC (Web ARChive, ISO 28500) source: parse crawl archives into a
Ray Dataset of response records — the container format every web-crawl
corpus (Common Crawl and kin) lands in, and the natural upstream of this
engine's webtext CDC tables.

Gobblin analog: a FileBasedSource + custom extractor pair
(gobblin-core/.../filebased/FileBasedSource.java — file listing as work
units; gobblin-core/.../filebased/FileBasedExtractor.java — per-file
record iteration). Ray-native the file list IS the work-unit set:
``read_binary_files`` hands whole files to parallel tasks and one
``flat_map``-shaped ``map_batches`` parses each file's records.

Format notes (the subset universally present): records framed as
``WARC/1.0\\r\\n`` + header lines + ``\\r\\n`` + Content-Length payload
bytes + ``\\r\\n\\r\\n``. The parser walks records by Content-Length —
never by scanning for the magic, which can legally appear inside a
payload. Malformed trailing bytes raise (a truncated archive should
fail the work unit, not silently drop records — the reference's
extractor contract).

Scale shape: parallelism is per FILE (the WARC record chain is
inherently sequential within a file — each record's offset depends on
the previous Content-Length), so throughput scales with shard count
exactly like the reference's file-based work units; keep archives
sharded (Common Crawl ships ~1 GB segments). The per-record Python
loop is the format walker only — header parse is one regex per record
and payload stays bytes (zero decode) until `payload_as` asks for text.
"""

from __future__ import annotations

import re

import pyarrow as pa

_HDR = re.compile(  # [ \t\r]* because re.M's $ sits BEFORE the \n of \r\n
    rb"^([A-Za-z0-9_.-]+):[ \t]*(.*?)[ \t\r]*$", re.M
)
_MAGIC = b"WARC/1.0\r\n"


def parse_warc_bytes(data: bytes, path: str = "") -> dict[str, list]:
    """Parse one WARC file's bytes into columnar lists (shared by the
    Dataset reader and tests)."""
    urls: list[str | None] = []
    dates: list[str | None] = []
    rtypes: list[str | None] = []
    payloads: list[bytes] = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + len(_MAGIC)] != _MAGIC:
            raise ValueError(
                f"WARC parse error in {path!r} at offset {pos}: "
                f"expected record magic, got {data[pos:pos + 12]!r}"
            )
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError(
                f"WARC parse error in {path!r} at offset {pos}: "
                "unterminated header block"
            )
        headers = {
            m.group(1).lower(): m.group(2)
            for m in _HDR.finditer(data[pos + len(_MAGIC):hdr_end])
        }
        try:
            clen = int(headers[b"content-length"])
        except (KeyError, ValueError):
            raise ValueError(
                f"WARC parse error in {path!r} at offset {pos}: "
                "missing/invalid Content-Length"
            ) from None
        body_start = hdr_end + 4
        body_end = body_start + clen
        if data[body_end:body_end + 4] != b"\r\n\r\n":
            raise ValueError(
                f"WARC parse error in {path!r} at offset {pos}: "
                "record not terminated by CRLFCRLF after Content-Length"
            )
        uri = headers.get(b"warc-target-uri")
        date = headers.get(b"warc-date")
        rtype = headers.get(b"warc-type")
        urls.append(uri.decode("utf-8", "replace") if uri is not None else None)
        dates.append(date.decode("ascii", "replace") if date is not None else None)
        rtypes.append(rtype.decode("ascii", "replace") if rtype is not None else None)
        payloads.append(data[body_start:body_end])
        pos = body_end + 4
    return {"url": urls, "warc_date": dates, "warc_type": rtypes,
            "payload": payloads}


def read_warc(paths, record_type: str | None = "response",
              payload_as: str = "binary", **read_kw):
    """Read WARC file(s) into a Dataset of records: columns
    ``(url string, warc_date string, warc_type string, payload
    binary|string)``. ``record_type`` filters to that WARC-Type
    (``None`` keeps all — warcinfo/request/metadata records included);
    ``payload_as="text"`` casts payloads to utf-8 strings for the
    text-pipeline path (the cast VALIDATES utf-8 and raises on invalid
    bytes — keep ``binary`` and decode downstream for dirty crawls).

    One task per file via ``read_binary_files`` — file count is the
    parallelism, matching the reference's file-based work units.
    """
    import ray.data as rd

    if payload_as not in ("binary", "text"):
        raise ValueError(f"payload_as must be binary|text, got {payload_as!r}")

    def parse(batch: pa.Table) -> pa.Table:
        out = {"url": [], "warc_date": [], "warc_type": [], "payload": []}
        pcol = (batch.column("path").to_pylist()
                if "path" in batch.column_names else [""] * batch.num_rows)
        for data, path in zip(batch.column("bytes").to_pylist(), pcol):
            cols = parse_warc_bytes(data, path)
            for k in out:
                out[k].extend(cols[k])
        t = pa.table({
            "url": pa.array(out["url"], pa.string()),
            "warc_date": pa.array(out["warc_date"], pa.string()),
            "warc_type": pa.array(out["warc_type"], pa.string()),
            "payload": pa.array(out["payload"], pa.binary()),
        })
        if record_type is not None:
            import pyarrow.compute as pc

            t = t.filter(pc.equal(t.column("warc_type"), record_type))
        if payload_as == "text":
            t = t.set_column(
                t.schema.get_field_index("payload"), "payload",
                t.column("payload").cast(pa.string()),
            )
        return t

    parse.__name__ = "parse_warc"
    return rd.read_binary_files(paths, include_paths=True, **read_kw) \
        .map_batches(parse, batch_format="pyarrow", batch_size=None)


def warc_to_pages(warc_dir: str, out_path: str) -> str:
    """Shape a WARC archive into the engine's pages-snapshot schema
    ``(url, warc_ts timestamp[us], html binary, text string, lang
    string)`` and write it as the bootstrap parquet — the crawl→lake
    on-ramp (Gobblin's source→converter→writer job shape: FileBasedSource
    listing + format extractor + ParquetHdfsDataWriter). ``html`` keeps
    the raw payload bytes; ``text`` is the tag-stripped utf-8 view
    (functions/text.strip_html); ``lang`` is left null for the langid
    stage downstream. Duplicate urls inside the archive are fine — the
    engine's bootstrap LWW-reduces the snapshot.
    """
    import pyarrow.compute as pc

    from ..functions.text import strip_html

    ds = read_warc(warc_dir, record_type="response", payload_as="binary")

    extract = strip_html("_raw", out="text")

    def shape(t: pa.Table) -> pa.Table:
        ts = pc.strptime(
            pc.replace_substring_regex(
                t.column("warc_date"), pattern=r"Z$", replacement=""),
            format="%Y-%m-%dT%H:%M:%S", unit="us",
        )
        out = pa.table({
            "url": t.column("url"),
            "warc_ts": ts,
            "html": t.column("payload"),
            "_raw": t.column("payload").cast(pa.string()),
            "lang": pa.nulls(t.num_rows, pa.string()),
        })
        return extract(out).drop_columns(["_raw"])

    ds.map_batches(shape, batch_format="pyarrow", batch_size=None) \
        .write_parquet(out_path)
    return out_path


def write_warc(ds, out_dir: str, url_col: str = "url",
               date_col: str = "warc_date", payload_col: str = "payload",
               warc_type: str = "response"):
    """WARC export sink — the corpus-interchange complement of
    ``read_warc`` (ship a cleaned/deduped text corpus back out in the
    crawl world's container format). One ``.warc`` file per block,
    streamed by the workers (no driver materialization), with
    content-fingerprint file names so a retried task overwrites its own
    output idempotently (the same naming rule as the parquet sink).
    Returns a lineage Dataset ``(path, records, bytes)`` — consume it to
    drive the write. Null payloads write as empty records; ``date_col``
    values must already be WARC-style ISO8601 strings.

    Content-addressed caveat (same contract as the parquet sink): two
    BYTE-IDENTICAL blocks collapse into one file — the lineage then
    over-counts records vs a read-back. Distinct records always survive;
    if the dataset may contain whole blocks of duplicated rows, dedupe
    upstream (the engine's exact-dedup stage) before exporting.
    """
    import hashlib
    import os

    def write_block(t: pa.Table) -> pa.Table:
        urls = t.column(url_col).to_pylist()
        dates = t.column(date_col).to_pylist()
        pay = t.column(payload_col).to_pylist()
        frames = []
        for u, d, p in zip(urls, dates, pay):
            if p is None:
                p = b""
            elif isinstance(p, str):
                p = p.encode()
            h = [b"WARC/1.0", b"WARC-Type: " + warc_type.encode()]
            if u is not None:
                h.append(b"WARC-Target-URI: " + u.encode())
            if d is not None:
                h.append(b"WARC-Date: " + d.encode())
            h.append(b"Content-Length: " + str(len(p)).encode())
            frames.append(b"\r\n".join(h) + b"\r\n\r\n" + p + b"\r\n\r\n")
        data = b"".join(frames)
        name = f"part-{hashlib.sha256(data).hexdigest()[:16]}.warc"
        path = os.path.join(out_dir, name)
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, path)
        return pa.table({
            "path": pa.array([path], pa.string()),
            "records": pa.array([t.num_rows], pa.int64()),
            "bytes": pa.array([len(data)], pa.int64()),
        })

    write_block.__name__ = "write_warc_block"
    os.makedirs(out_dir, exist_ok=True)
    return ds.map_batches(write_block, batch_format="pyarrow",
                          batch_size=None)
